"""MoE part projection (ops/moe.py, BranchConfig.moe_experts) and expert
parallelism (parallel/expert.py): routing math vs a naive per-token loop,
capacity dropping, aux-loss collection through the train step, and
(data x expert) mesh parity with the single-device step."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ugaitnet_tpu.core.config import BranchConfig, ModelConfig, TrainConfig
from ugaitnet_tpu.models.network import UGaitNet, init_params
from ugaitnet_tpu.ops.moe import moe_capacity, moe_project
from ugaitnet_tpu.train.train_step import (
    Batch, compute_losses, init_state, make_optimizer, make_train_step)


def _moe_cfg(experts=4, nclasses=6):
    b = BranchConfig(kind="gaitset", modality="of",
                     gaitset_channels=(8, 8, 16), part_dim=16,
                     moe_experts=experts)
    b2 = dataclasses.replace(b, modality="gray")
    return ModelConfig(branches=(b, b2), merge="sign_max", nclasses=nclasses)


def _batch(b=8, t=25, nclasses=6, seed=0):
    rng = np.random.RandomState(seed)
    return Batch(
        volumes=(jnp.asarray(rng.randn(b, t, 60, 60, 2), jnp.float32),
                 jnp.asarray(rng.randn(b, t, 60, 60, 1), jnp.float32)),
        use_flags=(jnp.ones((b,), jnp.float32),
                   jnp.ones((b,), jnp.float32)),
        labels=jnp.asarray(rng.randint(0, nclasses, size=b), jnp.int32))


def test_moe_project_matches_naive_loop():
    rng = np.random.RandomState(0)
    n, c, d, e = 24, 8, 5, 4
    x = rng.randn(n, c).astype(np.float32)
    rw = rng.randn(c, e).astype(np.float32)
    ew = rng.randn(e, c, d).astype(np.float32)
    cap = n  # nothing can drop
    out, aux, kept = moe_project(jnp.asarray(x), jnp.asarray(rw),
                                 jnp.asarray(ew), cap)
    probs = jax.nn.softmax(x @ rw, axis=-1)
    want = np.stack([probs[i].max() * (x[i] @ ew[probs[i].argmax()])
                     for i in range(n)])
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-5, atol=1e-5)
    assert np.asarray(kept).sum() == n
    # perfect-balance lower bound: aux >= 1 always, == 1 iff balanced
    assert float(aux) >= 1.0 - 1e-6


def test_moe_capacity_drops_overflow_tokens():
    n, c, d, e = 12, 4, 3, 2
    x = np.ones((n, c), np.float32)
    # router forces every token to expert 1
    rw = np.zeros((c, e), np.float32)
    rw[:, 1] = 10.0
    ew = np.ones((e, c, d), np.float32)
    cap = 5
    out, aux, kept = moe_project(jnp.asarray(x), jnp.asarray(rw),
                                 jnp.asarray(ew), cap)
    kept = np.asarray(kept)
    assert kept.sum() == cap           # only `cap` tokens served
    assert kept[:cap].all()            # first-come-first-served order
    np.testing.assert_array_equal(np.asarray(out)[cap:], 0.0)
    assert np.abs(np.asarray(out)[:cap]).sum() > 0
    assert float(aux) == pytest.approx(e * 1.0, abs=1e-3)  # max imbalance


def test_moe_capacity_helper():
    assert moe_capacity(100, 4, 1.25) == 32  # ceil(31.25)
    assert moe_capacity(4, 8, 1.0) == 1      # floor of 1


def test_moe_branch_params_and_eval_forward():
    mcfg = _moe_cfg()
    model = UGaitNet(mcfg)
    params = init_params(model, jax.random.PRNGKey(0), batch=2)
    assert set(params.keys()) == {"params"}  # no "moe" collection at init
    bp = params["params"]["branch_of"]
    assert "router" in bp and "expert_proj" in bp and "part_proj" not in bp
    assert bp["expert_proj"].shape == (4, 16, 16)
    # eval path: plain apply (no mutable) — sow is a silent no-op
    batch = _batch(b=4, t=5)
    out = model.apply(params, list(batch.volumes), list(batch.use_flags),
                      train=False)
    assert out["signature"].shape == (4, 62, 16)
    assert np.isfinite(np.asarray(out["signature"])).all()


def test_moe_aux_loss_in_train_step_and_grads_reach_router():
    mcfg = _moe_cfg()
    tcfg = TrainConfig(lr=1e-3, loss_weights=(1.0, 0.1), moe_aux_weight=0.01)
    model = UGaitNet(mcfg)
    params = init_params(model, jax.random.PRNGKey(0), batch=2)
    batch = _batch(b=8, t=5)

    def loss_fn(p):
        loss, metrics = compute_losses(model, p, batch,
                                       jax.random.PRNGKey(1), mcfg, tcfg)
        return loss, metrics

    (loss, metrics), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(params)
    assert "moe_aux" in metrics and np.isfinite(float(metrics["moe_aux"]))
    assert float(metrics["moe_aux"]) >= 1.5  # two branches, each ~1
    # the aux loss (and the projection itself) backprops into the MoE params
    g = grads["params"]["branch_of"]
    assert float(jnp.abs(g["router"]).sum()) > 0
    assert float(jnp.abs(g["expert_proj"]).sum()) > 0

    # full jitted optimizer step trains
    tx = make_optimizer(tcfg)
    step = make_train_step(model, tx, mcfg, tcfg)
    state = init_state(model, tx, jax.random.PRNGKey(0))
    state, m = step(state, _batch(b=8, t=25), jax.random.PRNGKey(2))
    assert np.isfinite(float(m["loss"]))


def test_ep_step_matches_single_device():
    """GSPMD partitions one traced program: the (2 x 2) expert-parallel
    step computes the single-device loss, and expert_proj is genuinely
    sharded over the expert axis (optimizer moments too)."""
    from ugaitnet_tpu.parallel.expert import (
        EXPERT_AXIS, make_ep_train_step, make_mesh_dpep, place_ep_state)
    from ugaitnet_tpu.parallel.sharding import shard_batch

    mcfg = _moe_cfg()
    tcfg = TrainConfig(lr=3e-4, loss_weights=(1.0, 0.1), optimizer="sgd")
    model = UGaitNet(mcfg)
    tx = make_optimizer(tcfg)
    batch = _batch(b=8, t=25)

    single = make_train_step(model, tx, mcfg, tcfg)
    s1, m1 = single(init_state(model, tx, jax.random.PRNGKey(0)), batch,
                    jax.random.PRNGKey(7))

    mesh = make_mesh_dpep(2, 2)
    assert mesh.shape == {"data": 2, "expert": 2}
    state = place_ep_state(init_state(model, tx, jax.random.PRNGKey(0)),
                           mesh)
    ew = state.params["params"]["branch_of"]["expert_proj"]
    assert ew.sharding.shard_shape(ew.shape)[0] == ew.shape[0] // 2
    rw = state.params["params"]["branch_of"]["router"]
    assert rw.sharding.shard_shape(rw.shape) == rw.shape  # replicated
    # sgd trace moments mirror the placement
    tr = state.opt_state.inner_state[0].trace["params"]["branch_of"][
        "expert_proj"]
    assert tr.sharding.shard_shape(tr.shape)[0] == tr.shape[0] // 2

    ep = make_ep_train_step(model, tx, mcfg, tcfg, mesh)
    s2, m2 = ep(state, shard_batch(batch, mesh), jax.random.PRNGKey(7))
    s2, m2b = ep(s2, shard_batch(batch, mesh), jax.random.PRNGKey(8))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-4)
    np.testing.assert_allclose(float(m1["moe_aux"]), float(m2["moe_aux"]),
                               rtol=1e-4)
    assert np.isfinite(float(m2b["loss"]))
    # updated state keeps the EP layout (donation-compatible)
    ew2 = s2.params["params"]["branch_of"]["expert_proj"]
    assert ew2.sharding.shard_shape(ew2.shape)[0] == ew2.shape[0] // 2


def test_ep_requires_moe_model():
    from ugaitnet_tpu.parallel.expert import (
        make_ep_train_step, make_mesh_dpep)
    mcfg = _moe_cfg(experts=0)
    tcfg = TrainConfig()
    with pytest.raises(ValueError, match="moe_experts"):
        make_ep_train_step(UGaitNet(mcfg), make_optimizer(tcfg), mcfg,
                           tcfg, make_mesh_dpep(2, 2))


def test_pipeline_rejects_moe():
    from ugaitnet_tpu.parallel.pipeline import make_pipeline_train_step
    mcfg = _moe_cfg()
    tcfg = TrainConfig()
    with pytest.raises(ValueError, match="aux loss"):
        make_pipeline_train_step(UGaitNet(mcfg), make_optimizer(tcfg),
                                 mcfg, tcfg, devices=jax.devices()[:2])


@pytest.mark.slow
def test_train_cli_moe_ep_end_to_end(tmp_path):
    """--moe 4 --ndevices 2 --ep 2 through the real CLI: the Trainer
    detects the (data, expert) mesh, places EP-sharded state, and the run
    checkpoints + logs metrics (incl. the sown moe_aux)."""
    import json
    import os

    from ugaitnet_tpu.cli.build_data import main as build_main
    from ugaitnet_tpu.cli.train import main as train_main

    data = str(tmp_path / "packed")
    exper = str(tmp_path / "exp")
    build_main(["--synthetic", "--outdir", data])
    train_main(["--datadir", data, "--nclasses", "5",
                "--mod0", "of", "--mod1", "gray", "--mergefun", "sign_max",
                "--bs", "8", "--epochs", "1", "--savemodelfreq", "1",
                "--gschannels", "4,4,8", "--gspartdim", "8",
                "--moe", "4", "--ndevices", "2", "--ep", "2",
                "--experdir", exper, "--experfix", "ep"])
    runs = os.listdir(exper)
    assert len(runs) == 1
    experdir = os.path.join(exper, runs[0])
    cfg = json.load(open(os.path.join(experdir, "config.json")))
    assert cfg["train"]["ep_devices"] == 2
    assert cfg["model"]["branches"][0]["moe_experts"] == 4
    from ugaitnet_tpu.core import checkpoint as ckpt
    assert ckpt.latest_checkpoint_step(experdir) is not None
    lines = open(os.path.join(experdir, "metrics.jsonl")).read().splitlines()
    assert lines and "moe_aux" in lines[-1]


def test_moe_with_remat_trains():
    """nn.remat lifts the sown "moe" collection correctly (flax lifted
    transforms carry variable collections through jax.checkpoint)."""
    mcfg = dataclasses.replace(_moe_cfg(), remat=True)
    tcfg = TrainConfig(lr=1e-3, loss_weights=(1.0, 0.1))
    model = UGaitNet(mcfg)
    tx = make_optimizer(tcfg)
    step = make_train_step(model, tx, mcfg, tcfg)
    state = init_state(model, tx, jax.random.PRNGKey(0))
    state, m = step(state, _batch(b=4, t=5), jax.random.PRNGKey(2))
    assert np.isfinite(float(m["loss"])) and "moe_aux" in m


def test_moe_aux_collected_in_shardmap_and_sp_steps():
    """Round-3 advisor finding: make_local_loss (shared by the shard_map
    DP step and the sequence-parallel step) silently dropped the sown
    Switch aux term because model.apply lacked mutable=["moe"] — the
    router trained without load balancing.  Pin that both steps now carry
    moe_aux, matching the single-device value when the mesh keeps one
    local batch (dp=1: routing sees the same tokens)."""
    from ugaitnet_tpu.parallel.sequence import (
        make_mesh_dpsp, make_sp_train_step, shard_batch_sp)
    from ugaitnet_tpu.parallel.sharding import (
        make_mesh, make_shardmap_train_step, replicate, shard_batch)

    mcfg = _moe_cfg()
    tcfg = TrainConfig(lr=3e-4, loss_weights=(1.0, 0.1), optimizer="sgd",
                       moe_aux_weight=0.01)
    model = UGaitNet(mcfg)
    tx = make_optimizer(tcfg)
    batch = _batch(b=8, t=25)

    single = make_train_step(model, tx, mcfg, tcfg)
    _, m1 = single(init_state(model, tx, jax.random.PRNGKey(0)), batch,
                   jax.random.PRNGKey(7))
    assert "moe_aux" in m1

    # shard_map DP, dp=1: local batch == global batch -> exact aux parity
    dmesh = make_mesh(1)
    dpstep = make_shardmap_train_step(model, tx, mcfg, tcfg, dmesh)
    _, m2 = dpstep(replicate(init_state(model, tx, jax.random.PRNGKey(0)),
                             dmesh),
                   shard_batch(batch, dmesh), jax.random.PRNGKey(7))
    assert "moe_aux" in m2
    np.testing.assert_allclose(float(m1["moe_aux"]), float(m2["moe_aux"]),
                               rtol=1e-4)

    # SP (1, 2): routing runs post-pool on replicated compute -> parity too
    smesh = make_mesh_dpsp(1, 2)
    spstep = make_sp_train_step(model, tx, mcfg, tcfg, smesh)
    _, m3 = spstep(replicate(init_state(model, tx, jax.random.PRNGKey(0)),
                             smesh),
                   shard_batch_sp(batch, smesh), jax.random.PRNGKey(7))
    assert "moe_aux" in m3
    np.testing.assert_allclose(float(m1["moe_aux"]), float(m3["moe_aux"]),
                               rtol=1e-3)

    # multi-shard DP: routing is per-shard (different token subsets), so
    # only presence/finiteness is pinned — but the total must include the
    # weighted aux (loss ~= sum of parts)
    dmesh4 = make_mesh(4)
    dpstep4 = make_shardmap_train_step(model, tx, mcfg, tcfg, dmesh4)
    _, m4 = dpstep4(replicate(init_state(model, tx, jax.random.PRNGKey(0)),
                              dmesh4),
                    shard_batch(batch, dmesh4), jax.random.PRNGKey(7))
    assert np.isfinite(float(m4["moe_aux"])) and float(m4["moe_aux"]) > 0
