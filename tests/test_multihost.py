"""Multi-host input path: 2 local CPU processes via jax.distributed.

Exercises the one SURVEY §2.5 branch that single-process tests cannot
reach: `shard_batch_multihost`'s `process_count > 1` path
(parallel/sharding.py), where every process passes only its LOCAL shard
and jax assembles the global array over the (simulated) DCN.  Two
subprocesses with 4 virtual CPU devices each form a global 8-device data
mesh, run ONE GSPMD train step on a deterministic batch, and the test
asserts the loss equals the same step computed single-process on this
side — i.e. multi-host input assembly is numerically invisible.

Skips cleanly when the coordinator port cannot be bound or
jax.distributed is unavailable in subprocesses.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import json, os, sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
pid = int(sys.argv[1]); port = sys.argv[2]
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=2, process_id=pid)
import numpy as np
import jax.numpy as jnp
sys.path.insert(0, os.getcwd())
from ugaitnet_tpu.core.config import BranchConfig, ModelConfig, TrainConfig
from ugaitnet_tpu.models.network import UGaitNet, init_params
from ugaitnet_tpu.train.train_step import Batch, TrainState, make_optimizer
from ugaitnet_tpu.parallel.sharding import (make_mesh,
                                            make_sharded_train_step,
                                            replicate,
                                            shard_batch_multihost)

assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 8 and jax.local_device_count() == 4

mcfg = ModelConfig(
    branches=(BranchConfig(kind="gaitset", modality="of",
                           gaitset_channels=(4, 4, 8), part_dim=8),),
    merge="max", nclasses=4)
tcfg = TrainConfig()
model = UGaitNet(mcfg)
tx = make_optimizer(tcfg)
params = init_params(model, jax.random.PRNGKey(0))
state = TrainState(step=jnp.int32(0), params=params,
                   opt_state=tx.init(params))
mesh = make_mesh()          # all 8 global devices on the data axis
state = replicate(state, mesh)
step = make_sharded_train_step(model, tx, mcfg, tcfg, mesh)

B = 16                       # global batch; this process owns rows pid*8:+8
rng = np.random.RandomState(0)
vol = rng.randn(B, 5, 60, 60, 2).astype(np.float32)
labels = np.repeat(np.arange(4), 4).astype(np.int32)
lo, hi = pid * (B // 2), (pid + 1) * (B // 2)
local = Batch(volumes=(vol[lo:hi],), use_flags=(np.ones(B // 2, np.float32),),
              labels=labels[lo:hi])
gbatch = shard_batch_multihost(local, mesh)
state, metrics = step(state, gbatch, jax.random.PRNGKey(7))
loss = float(metrics["loss"])
if pid == 0:
    print(json.dumps({"loss": loss}), flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_multihost_input(tmp_path):
    port = _free_port()
    wpath = tmp_path / "worker.py"
    wpath.write_text(_WORKER)
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)     # subprocess sets its own device count
    env["JAX_PLATFORMS"] = "cpu"
    procs = [subprocess.Popen(
        [sys.executable, str(wpath), str(i), str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=540)
            outs.append((p.returncode, out.decode(), err.decode()))
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.skip("jax.distributed 2-process run timed out on this host")
    for rc, out, err in outs:
        if rc != 0 and ("distributed" in err or "coordinator" in err.lower()
                        or "UNAVAILABLE" in err):
            pytest.skip(f"jax.distributed unavailable: {err[-300:]}")
        assert rc == 0, f"worker failed:\n{err[-2000:]}"
    rec = json.loads([o for _, o, _ in outs if o.strip()][0].strip()
                     .splitlines()[-1])
    multi_loss = rec["loss"]

    # same step, single process, same global batch -> identical loss
    import jax
    import jax.numpy as jnp
    from ugaitnet_tpu.core.config import BranchConfig, ModelConfig, TrainConfig
    from ugaitnet_tpu.models.network import UGaitNet, init_params
    from ugaitnet_tpu.train.train_step import Batch, TrainState, make_optimizer
    from ugaitnet_tpu.parallel.sharding import (make_mesh,
                                                make_sharded_train_step,
                                                replicate, shard_batch)

    mcfg = ModelConfig(
        branches=(BranchConfig(kind="gaitset", modality="of",
                               gaitset_channels=(4, 4, 8), part_dim=8),),
        merge="max", nclasses=4)
    tcfg = TrainConfig()
    model = UGaitNet(mcfg)
    tx = make_optimizer(tcfg)
    params = init_params(model, jax.random.PRNGKey(0))
    state = TrainState(step=jnp.int32(0), params=params,
                       opt_state=tx.init(params))
    mesh = make_mesh(8)
    state = replicate(state, mesh)
    step = make_sharded_train_step(model, tx, mcfg, tcfg, mesh)
    B = 16
    rng = np.random.RandomState(0)
    vol = rng.randn(B, 5, 60, 60, 2).astype(np.float32)
    labels = np.repeat(np.arange(4), 4).astype(np.int32)
    batch = Batch(volumes=(vol,), use_flags=(np.ones(B, np.float32),),
                  labels=labels)
    _, metrics = step(state, shard_batch(batch, mesh), jax.random.PRNGKey(7))
    single_loss = float(metrics["loss"])
    assert np.isclose(multi_loss, single_loss, rtol=1e-4), (
        multi_loss, single_loss)
