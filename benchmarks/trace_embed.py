"""Capture a jax.profiler device trace of the full embed jit and dump the
per-op time table (needs tensorboard_plugin_profile).  Writes to
/tmp/embed_trace.  Run: python benchmarks/trace_embed.py
"""

import glob
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def main():
    try:
        from ugaitnet_tpu.core.runtime import setup_compilation_cache
        setup_compilation_cache()
    except Exception:
        pass
    from ugaitnet_tpu.core.config import BranchConfig, DataConfig, ModelConfig
    from ugaitnet_tpu.data.pipeline import preprocess_batch
    from ugaitnet_tpu.models.network import UGaitNet, init_params

    cfg = ModelConfig(
        branches=(BranchConfig(kind="gaitset", modality="of"),
                  BranchConfig(kind="gaitset", modality="gray")),
        merge="sign_max", nclasses=0, compute_dtype="bfloat16")
    model = UGaitNet(cfg)
    params = init_params(model, jax.random.PRNGKey(0), batch=2)

    B = 128
    rng = np.random.RandomState(0)
    raw = {
        "raw_of": jnp.asarray(
            rng.randint(-3000, 3000, (B, 50, 60, 60)).astype(np.int16)),
        "raw_gray": jnp.asarray(
            rng.randint(0, 255, (B, 25, 60, 60)).astype(np.uint8)),
    }
    dcfg = DataConfig()

    @jax.jit
    def embed(params, raw):
        vols, flags, _ = preprocess_batch(
            {**raw, "present_of": jnp.ones((B,), jnp.float32),
             "present_gray": jnp.ones((B,), jnp.float32),
             "labels": jnp.zeros((B,), jnp.int32)},
            jax.random.PRNGKey(0), ("of", "gray"), (2, 1),
            (100.0, 1.0), 2, 1, False, dcfg)
        out = model.apply(params, vols, flags, train=False)
        return jnp.sum(out["signature"])

    # warm up
    float(embed(params, raw))
    float(embed(params, raw))

    logdir = "/tmp/embed_trace"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        for _ in range(3):
            v = embed(params, raw)
        float(v)
    time.sleep(2)

    files = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    print("xplane files:", files)
    if not files:
        return
    # parse with the tensorboard plugin's convert API
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd
    for tool in ("framework_op_stats", "hlo_op_stats", "op_profile"):
        try:
            data, _ = rtd.xspace_to_tool_data(files, tool + "^", {})
            out = f"/tmp/embed_trace/{tool}.out"
            mode = "wb" if isinstance(data, bytes) else "w"
            with open(out, mode) as f:
                f.write(data)
            print("wrote", out, len(data))
        except Exception as e:
            print(tool, "failed:", repr(e)[:200])


if __name__ == "__main__":
    main()
