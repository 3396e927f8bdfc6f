"""Pipeline (branch-placement) parallelism (parallel/pipeline.py): per-
modality branch trunks on separate devices, head stage on device 0,
numerics identical to the single-device step — including the head dropout
stream (UGaitHead's rng paths equal UGaitNet's)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ugaitnet_tpu.core.config import (BranchConfig, DataConfig, ModelConfig,
                                      TrainConfig)
from ugaitnet_tpu.data.pipeline import GaitPipeline
from ugaitnet_tpu.data.synthetic import make_synthetic_dataset
from ugaitnet_tpu.models.network import (UGaitHead, UGaitNet, branch_input,
                                         make_branch)
from ugaitnet_tpu.parallel.pipeline import (make_pipeline_train_step,
                                            split_params)
from ugaitnet_tpu.train.train_step import (Batch, init_state, make_optimizer,
                                           make_train_step)


def _cfg(**kw):
    b = BranchConfig(kind="gaitset", modality="gray",
                     gaitset_channels=(8, 8, 16), part_dim=16)
    b2 = BranchConfig(kind="gaitset", modality="of",
                      gaitset_channels=(8, 8, 16), part_dim=16)
    # extra_dense turns on the dropcode Dropout — the head-rng parity is
    # part of what these tests pin.
    return ModelConfig(branches=(b2, b), merge="sign_max", nclasses=6,
                       extra_dense=(32,), **kw)


@pytest.fixture(scope="module")
def setup():
    ds = make_synthetic_dataset(num_subjects=6, videos_per_subject=2,
                                subseqs_per_video=2, seed=3)
    mcfg = _cfg()
    tcfg = TrainConfig(lr=3e-4, loss_weights=(1.0, 0.1), margin=0.2)
    model = UGaitNet(mcfg)
    tx = make_optimizer(tcfg)
    dcfg = DataConfig(batch_size=8, expand_level=2, augment=False)
    pipe = GaitPipeline(ds, dcfg, ("of", "gray"), labmap=ds.label_map(),
                        augment=False)
    vols, flags, labels = pipe.load(np.arange(8), jax.random.PRNGKey(0))
    batch = Batch(volumes=tuple(vols), use_flags=tuple(flags), labels=labels)
    return model, tx, mcfg, tcfg, batch


def test_head_module_matches_network_head(setup):
    """UGaitHead applied to raw branch embeddings with the network's head
    param subtree reproduces UGaitNet's outputs exactly (same param paths,
    same ops) — the invariant that lets one checkpoint serve both modes."""
    model, tx, mcfg, _, batch = setup
    params = init_state(model, tx, jax.random.PRNGKey(0)).params
    full = model.apply(params, list(batch.volumes), list(batch.use_flags),
                       train=False)

    bsub, hsub = split_params(params, mcfg)
    dtype = jnp.bfloat16 if mcfg.compute_dtype == "bfloat16" else jnp.float32
    embs = []
    for i, bcfg in enumerate(mcfg.branches):
        mod = make_branch(bcfg, dtype, name=f"branch_{bcfg.modality}")
        embs.append(mod.apply({"params": bsub[i]},
                              branch_input(bcfg, batch.volumes[i]), False))
    head = UGaitHead(mcfg)
    out = head.apply({"params": hsub}, embs, list(batch.use_flags),
                     train=False)
    for k in ("signature", "code", "classprob"):
        np.testing.assert_array_equal(np.asarray(full[k]),
                                      np.asarray(out[k]), err_msg=k)


def test_split_params_disjoint_and_complete(setup):
    model, tx, mcfg, _, batch = setup
    params = init_state(model, tx, jax.random.PRNGKey(0)).params
    bsub, hsub = split_params(params, mcfg)
    n_full = len(jax.tree.leaves(params["params"]))
    n_split = len(jax.tree.leaves(hsub)) + sum(
        len(jax.tree.leaves(b)) for b in bsub)
    assert n_split == n_full
    assert "classprob" in hsub and "extra_dense" in hsub
    for b in bsub:
        assert "part_proj" in b


def test_pipeline_step_matches_single_device(setup):
    """Same linear-optimizer parity scheme as the TP test: with sgd the
    param diff is lr * grad diff, so the comparison measures the
    execution-mode split, not optimizer amplification of reorder noise."""
    model, _, mcfg, tcfg_adam, batch = setup
    tcfg = dataclasses.replace(tcfg_adam, optimizer="sgd")
    tx = make_optimizer(tcfg)

    single = make_train_step(model, tx, mcfg, tcfg)
    s1, m1 = single(init_state(model, tx, jax.random.PRNGKey(0)), batch,
                    jax.random.PRNGKey(7))

    pp = make_pipeline_train_step(model, tx, mcfg, tcfg,
                                  devices=jax.devices()[:2])
    s2, m2 = pp(init_state(model, tx, jax.random.PRNGKey(0)), batch,
                jax.random.PRNGKey(7))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-4)
    # head dropout (dropcode) must draw the SAME stream in both modes —
    # a path mismatch would blow far past this tolerance.
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_pipeline_branch_params_on_distinct_devices(setup):
    """The trunks' compute genuinely lands on different devices: the
    embeddings produced by stage 1 live on devices[i]."""
    model, tx, mcfg, tcfg, batch = setup
    devs = jax.devices()[:2]
    pp = make_pipeline_train_step(model, tx, mcfg, tcfg, devices=devs)
    state = init_state(model, tx, jax.random.PRNGKey(0))
    state2, m = pp(state, batch, jax.random.PRNGKey(7))
    assert np.isfinite(float(m["loss"]))
    # updated state lives on the head device (optimizer runs there)
    leaf = jax.tree.leaves(state2.params)[0]
    assert list(leaf.devices()) == [devs[0]]


def test_pipeline_adam_steps_finite_and_decreasing(setup):
    model, tx, mcfg, tcfg, batch = setup
    pp = make_pipeline_train_step(model, tx, mcfg, tcfg,
                                  devices=jax.devices()[:3])
    state = init_state(model, tx, jax.random.PRNGKey(0))
    losses = []
    for i in range(4):
        state, m = pp(state, batch, jax.random.PRNGKey(7 + i))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


@pytest.mark.slow
def test_train_cli_pp_end_to_end(tmp_path):
    """--pp 2 through the real CLI: the Trainer builds the pipeline step,
    trains, checkpoints, and the config records the mode."""
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
                "--pp", "2",
                "--experdir", exper, "--experfix", "pp"])
    runs = os.listdir(exper)
    assert len(runs) == 1
    experdir = os.path.join(exper, runs[0])
    cfg = json.load(open(os.path.join(experdir, "config.json")))
    assert cfg["train"]["pp_devices"] == 2
    from ugaitnet_tpu.core import checkpoint as ckpt
    assert ckpt.latest_checkpoint_step(experdir) is not None
    lines = open(os.path.join(experdir, "metrics.jsonl")).read().splitlines()
    assert lines and "loss" in lines[-1]


def test_pp_exclusive_with_mesh_flags(tmp_path):
    import pytest as _pt

    from ugaitnet_tpu.cli.train import main as train_main
    with _pt.raises(SystemExit, match="exclusive"):
        train_main(["--synthetic", "--pp", "2", "--tp", "2",
                    "--experdir", str(tmp_path)])


def test_pipeline_rejects_bad_configs(setup):
    model, tx, mcfg, tcfg, batch = setup
    with pytest.raises(ValueError, match=">= 2 devices"):
        make_pipeline_train_step(model, tx, mcfg, tcfg,
                                 devices=jax.devices()[:1])
    b2d = BranchConfig(kind="conv2d", modality="gray", dropout=0.4)
    mcfg2 = dataclasses.replace(mcfg, branches=(mcfg.branches[0], b2d))
    with pytest.raises(ValueError, match="dropout"):
        make_pipeline_train_step(UGaitNet(mcfg2), tx, mcfg2, tcfg,
                                 devices=jax.devices()[:2])
