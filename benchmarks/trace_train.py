"""Capture a device trace of the flagship train step (fwd+bwd+adam).

Run: python benchmarks/trace_train.py
then: PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
      python benchmarks/parse_xplane.py /tmp/train_trace/plugins/profile/*/*.xplane.pb
"""

import glob
import os
import sys

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def main():
    from ugaitnet_tpu.core.runtime import setup_compilation_cache
    setup_compilation_cache()
    from ugaitnet_tpu.core.config import BranchConfig, ModelConfig, TrainConfig
    from ugaitnet_tpu.models.network import UGaitNet, init_params
    from ugaitnet_tpu.train.train_step import (Batch, TrainState,
                                               make_optimizer,
                                               make_train_step)

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
    step = make_train_step(model, tx, cfg, tcfg)
    B = 120
    rng = np.random.RandomState(0)
    batch = Batch(
        volumes=(jnp.asarray(rng.randn(B, 25, 60, 60, 2).astype(np.float32)),
                 jnp.asarray(rng.randn(B, 25, 60, 60, 1).astype(np.float32))),
        use_flags=(jnp.ones((B,), jnp.float32),
                   jnp.ones((B,), jnp.float32)),
        labels=jnp.asarray(np.repeat(np.arange(12), 10).astype(np.int32)))
    key = jax.random.PRNGKey(1)
    state, m = step(state, batch, key)
    state, m = step(state, batch, key)
    float(m["loss"])

    logdir = "/tmp/train_trace"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        for _ in range(3):
            state, m = step(state, batch, key)
        float(m["loss"])
    print("trace at", glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True))


if __name__ == "__main__":
    main()
