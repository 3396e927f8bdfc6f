"""Time the flagship train step under different XLA compiler options.

Round-3 finding (trace at /tmp/train_trace): ~66 ms of the 108 ms step is
copy-done WAITS on memory-space-assignment traffic (param prefetches into
alternate memory + sliced prefetch of big activations), not compute
(real compute sums to ~46 ms).  Through the axon tunnel each async DMA op
carries ~0.1-0.5 ms latency, so MSA's normally-free staging dominates the
step.  This script measures candidate option sets that tame MSA.

Usage: python benchmarks/step_opts.py '{"xla_tpu_...": 0.05}' [tag]
"""

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp


def main():
    opts = json.loads(sys.argv[1]) if len(sys.argv) > 1 else None
    tag = sys.argv[2] if len(sys.argv) > 2 else "exp"
    if not opts:
        # the persistent cache keys on HLO only (the axon remote-compile
        # path ignores compiler_options in the key), so experiments with
        # options MUST bypass it or they silently time the cached default
        from ugaitnet_tpu.core.runtime import setup_compilation_cache
        setup_compilation_cache()
    from ugaitnet_tpu.core.config import BranchConfig, ModelConfig, TrainConfig
    from ugaitnet_tpu.models.network import UGaitNet, init_params
    from ugaitnet_tpu.train.train_step import (Batch, TrainState,
                                               make_optimizer,
                                               make_train_step,
                                               make_train_step_fn)

    cfg = ModelConfig(
        branches=(BranchConfig(kind="gaitset", modality="of"),
                  BranchConfig(kind="gaitset", modality="gray")),
        merge="sign_max", nclasses=74, compute_dtype="bfloat16")
    tcfg = TrainConfig()
    model = UGaitNet(cfg)
    params = init_params(model, jax.random.PRNGKey(0), batch=2)
    tx = make_optimizer(tcfg)
    state = TrainState(step=jnp.int32(0), params=params,
                       opt_state=tx.init(params))
    B = 120
    rng = np.random.RandomState(0)
    batch = Batch(
        volumes=(jnp.asarray(rng.randn(B, 25, 60, 60, 2).astype(np.float32)),
                 jnp.asarray(rng.randn(B, 25, 60, 60, 1).astype(np.float32))),
        use_flags=(jnp.ones((B,), jnp.float32),
                   jnp.ones((B,), jnp.float32)),
        labels=jnp.asarray(np.repeat(np.arange(12), 10).astype(np.int32)))
    key = jax.random.PRNGKey(1)

    raw = make_train_step_fn(model, tx, cfg, tcfg)
    step = jax.jit(raw, donate_argnums=(0,))
    print(f"[{tag}] compiling with options: {opts}", flush=True)
    t0 = time.perf_counter()
    compiled = step.lower(state, batch, key).compile(compiler_options=opts)
    print(f"[{tag}] compiled in {time.perf_counter()-t0:.1f}s", flush=True)

    state, m = compiled(state, batch, key)
    float(m["loss"])
    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = compiled(state, batch, key)
    float(m["loss"])
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({"tag": tag, "opts": opts, "ms_per_step":
                      round(dt * 1e3, 2),
                      "samples_per_sec": round(B / dt, 1)}), flush=True)


if __name__ == "__main__":
    main()
