"""Sequence-parallel training (parallel/sequence.py): the gait set (time)
axis sharded over a ("data", "seq") mesh; frame convs run on T/sp frames
per device, set pools close with all_gathers, numerics match the
single-device / shard_map-DP steps."""

import dataclasses

import numpy as np
import jax
import pytest

from ugaitnet_tpu.core.config import (BranchConfig, DataConfig, ModelConfig,
                                      TrainConfig)
from ugaitnet_tpu.data.pipeline import GaitPipeline
from ugaitnet_tpu.data.synthetic import make_synthetic_dataset
from ugaitnet_tpu.models.network import UGaitNet
from ugaitnet_tpu.parallel.sequence import (
    SEQ_AXIS, make_mesh_dpsp, make_sp_train_step, pad_frames,
    shard_batch_sp)
from ugaitnet_tpu.parallel.sharding import (
    make_mesh, make_shardmap_train_step, replicate, shard_batch)
from ugaitnet_tpu.train.train_step import (
    Batch, init_state, make_optimizer, make_train_step)


def _cfg():
    b = BranchConfig(kind="gaitset", modality="gray",
                     gaitset_channels=(8, 8, 16), part_dim=16)
    b2 = BranchConfig(kind="gaitset", modality="of",
                      gaitset_channels=(8, 8, 16), part_dim=16)
    return ModelConfig(branches=(b2, b), merge="sign_max", nclasses=6)


@pytest.fixture(scope="module")
def setup():
    ds = make_synthetic_dataset(num_subjects=6, videos_per_subject=2,
                                subseqs_per_video=2, seed=3)
    mcfg = _cfg()
    # sgd: linear in the gradient, so reduction-order noise stays tiny
    # (same rationale as the TP parity test)
    tcfg = TrainConfig(lr=3e-4, loss_weights=(1.0, 0.1), margin=0.2,
                       optimizer="sgd")
    model = UGaitNet(mcfg)
    tx = make_optimizer(tcfg)
    dcfg = DataConfig(batch_size=8, expand_level=2, augment=False)
    pipe = GaitPipeline(ds, dcfg, ("of", "gray"), labmap=ds.label_map(),
                        augment=False)
    vols, flags, labels = pipe.load(np.arange(8), jax.random.PRNGKey(0))
    batch = Batch(volumes=tuple(vols), use_flags=tuple(flags), labels=labels)
    return model, tx, mcfg, tcfg, batch


def test_mesh_dpsp_shapes():
    mesh = make_mesh_dpsp(4, 2)
    assert mesh.shape == {"data": 4, "seq": 2}
    with pytest.raises(ValueError, match="need 16 devices"):
        make_mesh_dpsp(4, 4)


def test_pad_frames_repeats_last():
    v = np.arange(2 * 5 * 1 * 1 * 1, dtype=np.float32).reshape(2, 5, 1, 1, 1)
    p = pad_frames(v, 4)          # 5 -> 8
    assert p.shape[1] == 8
    np.testing.assert_array_equal(p[:, :5], v)
    for k in range(5, 8):
        np.testing.assert_array_equal(p[:, k], v[:, 4])
    assert pad_frames(v, 5) is v  # divisible: untouched


def test_sp_volumes_actually_sharded(setup):
    model, tx, mcfg, tcfg, batch = setup
    mesh = make_mesh_dpsp(2, 4)
    sb = shard_batch_sp(batch, mesh)
    v = sb.volumes[0]
    assert v.shape[1] == 28                       # 25 padded to /4
    assert v.sharding.shard_shape(v.shape)[0] == v.shape[0] // 2
    assert v.sharding.shard_shape(v.shape)[1] == 7
    f = sb.use_flags[0]
    assert f.sharding.shard_shape(f.shape)[0] == f.shape[0] // 2


def test_sp_pure_seq_matches_single_device(setup):
    """(1, 8) mesh: no data sharding, 8-way frame sharding (25 frames pad
    to 32 — also exercises the duplicate-frame exactness).  One local
    batch => identical semantics to the single-device step even under
    l2_mode='reference'."""
    model, tx, mcfg, tcfg, batch = setup
    single = make_train_step(model, tx, mcfg, tcfg)
    s1, m1 = single(init_state(model, tx, jax.random.PRNGKey(0)), batch,
                    jax.random.PRNGKey(7))

    mesh = make_mesh_dpsp(1, 8)
    sp = make_sp_train_step(model, tx, mcfg, tcfg, mesh)
    st = replicate(init_state(model, tx, jax.random.PRNGKey(0)), mesh)
    sb = shard_batch_sp(batch, mesh)
    s2, m2 = sp(st, sb, jax.random.PRNGKey(7))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-4)
    # atol, not rtol: the all_gather+max reassociation perturbs borderline
    # hinge activations exactly like the TP contraction reorder does
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


@pytest.mark.parametrize("dp,sp_", [(4, 2), (2, 4)])
def test_sp_matches_shardmap_dp(setup, dp, sp_):
    """(dp, sp) mesh vs the pure shard_map DP step at the same dp: the seq
    axis must only re-distribute the frame loop — losses and updated
    params agree to reduction noise (same local-batch l2/dropout-key
    semantics by construction)."""
    model, tx, mcfg, tcfg, batch = setup
    dmesh = make_mesh(dp)
    dpstep = make_shardmap_train_step(model, tx, mcfg, tcfg, dmesh)
    s1, m1 = dpstep(replicate(init_state(model, tx, jax.random.PRNGKey(0)),
                              dmesh),
                    shard_batch(batch, dmesh), jax.random.PRNGKey(7))

    mesh = make_mesh_dpsp(dp, sp_)
    spstep = make_sp_train_step(model, tx, mcfg, tcfg, mesh)
    s2, m2 = spstep(replicate(init_state(model, tx, jax.random.PRNGKey(0)),
                              mesh),
                    shard_batch_sp(batch, mesh), jax.random.PRNGKey(7))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-4)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_sp_steps_decrease(setup):
    model, _, mcfg, tcfg_sgd, batch = setup
    tcfg = dataclasses.replace(tcfg_sgd, optimizer="adam", lr=3e-4)
    tx = make_optimizer(tcfg)
    mesh = make_mesh_dpsp(2, 4)
    step = make_sp_train_step(model, tx, mcfg, tcfg, mesh)
    state = replicate(init_state(model, tx, jax.random.PRNGKey(0)), mesh)
    sb = shard_batch_sp(batch, mesh)
    losses = []
    for i in range(4):
        state, m = step(state, sb, jax.random.PRNGKey(7 + i))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


@pytest.mark.slow
def test_train_cli_sp_end_to_end(tmp_path):
    """--ndevices 2 --sp 2 through the real CLI: the Trainer detects the
    (data, seq) mesh, pads/shards batches over it, checkpoints, and the
    config records the sharding."""
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
                "--ndevices", "2", "--sp", "2",
                "--experdir", exper, "--experfix", "sp"])
    runs = os.listdir(exper)
    assert len(runs) == 1
    experdir = os.path.join(exper, runs[0])
    cfg = json.load(open(os.path.join(experdir, "config.json")))
    assert cfg["train"]["sp_devices"] == 2
    from ugaitnet_tpu.core import checkpoint as ckpt
    assert ckpt.latest_checkpoint_step(experdir) is not None
    lines = open(os.path.join(experdir, "metrics.jsonl")).read().splitlines()
    assert lines and "loss" in lines[-1]


def test_sp_rejects_non_gaitset():
    mcfg = ModelConfig(
        branches=(BranchConfig(kind="conv3d", modality="gray"),),
        nclasses=4)
    tcfg = TrainConfig()
    model = UGaitNet(mcfg)
    tx = make_optimizer(tcfg)
    with pytest.raises(ValueError, match="gaitset"):
        make_sp_train_step(model, tx, mcfg, tcfg, make_mesh_dpsp(2, 4))
