"""Diagnose bench.py's run-to-run gap: is the python-loop bench
dispatch-bound through the remote tunnel?

Measures (on the real TPU):
  a) trivial-jit dispatch rate (pure tunnel RPC cost per call)
  b) embed via python loop of 10 calls (what bench.py does today)
  c) embed via ONE call wrapping a lax.fori_loop of 10 iterations
     (device-bound by construction: dispatch cost amortizes 10x)

If (c) is meaningfully faster than (b), the recorded BENCH numbers have
been measuring tunnel dispatch, not the chip, and bench.py should move
the iteration loop on-device.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from ugaitnet_tpu.core.runtime import setup_compilation_cache
    setup_compilation_cache()
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
        "present_of": jnp.ones((B,), jnp.float32),
        "present_gray": jnp.ones((B,), jnp.float32),
        "labels": jnp.zeros((B,), jnp.int32),
    }
    dcfg = DataConfig()

    def embed_sum(params, raw):
        vols, flags, _ = preprocess_batch(
            raw, jax.random.PRNGKey(0), ("of", "gray"), (2, 1),
            (100.0, 1.0), 2, 1, False, dcfg)
        out = model.apply(params, vols, flags, train=False)
        return jnp.sum(out["signature"])

    embed = jax.jit(embed_sum)

    @jax.jit
    def embed_loop(params, raw, n):
        def body(i, acc):
            # xor the OF volume with the iteration index: a real data
            # dependency, so XLA cannot hoist the loop-invariant body
            r = dict(raw)
            r["raw_of"] = raw["raw_of"] ^ i.astype(jnp.int16)
            return acc + embed_sum(params, r)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    @jax.jit
    def trivial(x):
        return x + 1.0

    # ---- a) trivial dispatch rate ----
    x = jnp.zeros(())
    float(trivial(x))
    t0 = time.perf_counter()
    for _ in range(50):
        x = trivial(x)
    float(x)
    dt_trivial = (time.perf_counter() - t0) / 50
    print(f"a) trivial dispatch: {dt_trivial*1e3:.2f} ms/call")

    # ---- b) python loop (bench.py today) ----
    float(embed(params, raw))
    for trial in range(3):
        t0 = time.perf_counter()
        last = None
        for _ in range(10):
            last = embed(params, raw)
        float(last)
        dt = time.perf_counter() - t0
        print(f"b) python-loop x10 trial {trial}: {dt*1e3:.1f} ms "
              f"({B*10/dt:.0f} clips/s)")

    # ---- c) fori_loop on device ----
    n = jnp.int32(10)
    float(embed_loop(params, raw, n))  # compile
    for trial in range(3):
        t0 = time.perf_counter()
        v = embed_loop(params, raw, n)
        float(v)
        dt = time.perf_counter() - t0
        print(f"c) fori_loop x10   trial {trial}: {dt*1e3:.1f} ms "
              f"({B*10/dt:.0f} clips/s)")


if __name__ == "__main__":
    main()
