"""Joint-dataset (BothDatasets) regime + pair verification training."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ugaitnet_tpu.core.config import (BranchConfig, DataConfig, ModelConfig,
                                      TrainConfig)
from ugaitnet_tpu.data.convert import combine_datasets
from ugaitnet_tpu.data.pipeline import (
    GaitPipeline, compute_normalization_stats)
from ugaitnet_tpu.data.sampler import BalancedGaitSampler
from ugaitnet_tpu.data.synthetic import make_synthetic_dataset
from ugaitnet_tpu.models.network import UGaitNet
from ugaitnet_tpu.train.train_step import (
    Batch, PairBatch, init_state, make_optimizer, make_pair_train_step,
    make_train_step)


def _joint():
    a = make_synthetic_dataset(num_subjects=3, seed=0, name="tum")
    b = make_synthetic_dataset(num_subjects=2, seed=1, name="casia")
    return a, b, combine_datasets(a, b)


def test_norm_stats_standardize():
    a, b, j = _joint()
    stats_of = [compute_normalization_stats(j, "of", j.dataset_source == s)
                for s in (0, 1)]
    means = np.stack([s[0] for s in stats_of])
    stds = np.stack([s[1] for s in stats_of])
    assert means.shape == (2, 50)

    pipe = GaitPipeline(j, DataConfig(batch_size=6, expand_level=1,
                                      augment=False),
                        ("of", "gray"), augment=False,
                        norm_stats={"of": (means, stds),
                                    "gray": (np.zeros((2, 25)),
                                             np.ones((2, 25)))})
    vols, _, _ = pipe.load(np.arange(len(j)), jax.random.PRNGKey(0))
    of = np.asarray(vols[0])
    # standardized over the whole joint set -> near zero mean, unit-ish std
    assert abs(of.mean()) < 0.1
    assert 0.5 < of.std() < 2.0


@pytest.mark.slow
def test_joint_training_semi_hard_focal():
    _, _, j = _joint()
    mcfg = ModelConfig(
        branches=(BranchConfig(kind="gaitset", modality="of",
                               gaitset_channels=(4, 4, 8), part_dim=8),
                  BranchConfig(kind="gaitset", modality="gray",
                               gaitset_channels=(4, 4, 8), part_dim=8)),
        merge="max", nclasses=5)
    tcfg = TrainConfig(triplet_kind="semi_hard", use_focal=True,
                       loss_weights=(1.0, 0.1))
    model = UGaitNet(mcfg)
    tx = make_optimizer(tcfg)
    state = init_state(model, tx, jax.random.PRNGKey(0))
    step = make_train_step(model, tx, mcfg, tcfg)

    pipe = GaitPipeline(j, DataConfig(batch_size=8, expand_level=2,
                                      augment=False),
                        ("of", "gray"), labmap=j.label_map(), augment=False)
    sampler = BalancedGaitSampler(j.labels, j.gaits, batch_size=8,
                                  repetition=2, seed=0)
    # joint sampler must interleave both datasets' gait codes (0-2 and 3-5)
    idx = sampler.next_batch()
    gaits = j.gaits[idx]
    assert gaits.min() < 3 or gaits.max() >= 3
    vols, flags, labels = pipe.load(idx, jax.random.PRNGKey(0))
    state, m = step(state, Batch(tuple(vols), tuple(flags), labels),
                    jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))


def test_grouped_sampler_buildgaits_joint_structure():
    """buildGaits=[0,1,2,0,4,5] on the real joint structure (each subject
    has records only for its own dataset's gait codes): the merged group's
    two members (TUM 'n' / CASIA 'nm' after the +3 offset) must stay within
    one record of each other in every batch — the reference loop balances
    group members against each other
    (mj_dataGeneratorMMUWYHBothDatasets.py:80-83,133-170; used as
    [0,1,2,0,4,5] in mains/..._BothDatasets.py:875)."""
    _, _, j = _joint()
    ugait = np.unique(j.gaits)
    assert len(ugait) == 6
    s = BalancedGaitSampler(j.labels, j.gaits, batch_size=40, repetition=2,
                            seed=0, gait_groups=(0, 1, 2, 0, 4, 5))
    for _ in range(4):
        idx = s.next_batch()
        assert len(idx) == 40
        gaits = j.gaits[idx]
        c_g0 = int((gaits == ugait[0]).sum())
        c_g3 = int((gaits == ugait[3]).sum())
        assert abs(c_g0 - c_g3) <= 1, (c_g0, c_g3)
        # every gait still represented
        assert len(np.unique(gaits)) == 6


def test_grouped_sampler_dense_structure_merges_slots():
    """When every subject has records for all gait codes, the group check
    (sum of member counts vs the round counter) bites: merged gaits share
    ONE slot per round, so groups — not raw gaits — come out balanced."""
    labels = np.repeat(np.arange(4), 30)
    gaits = np.tile(np.repeat(np.arange(6), 5), 4)
    groups = (0, 1, 2, 0, 4, 5)
    s = BalancedGaitSampler(labels, gaits, batch_size=40, repetition=2,
                            seed=0, gait_groups=groups)
    idx = s.next_batch()
    g = gaits[idx]
    gcounts = {grp: 0 for grp in set(groups)}
    for x in g:
        gcounts[groups[int(x)]] += 1
    for grp, c in gcounts.items():
        assert abs(c - 8) <= 1, gcounts
    c0, c3 = int((g == 0).sum()), int((g == 3).sum())
    assert c0 + c3 == gcounts[0] and abs(c0 - c3) <= 1


def test_grouped_sampler_rejects_bad_length():
    _, _, j = _joint()
    try:
        BalancedGaitSampler(j.labels, j.gaits, batch_size=8,
                            gait_groups=(0, 1, 2))
        assert False, "expected ValueError"
    except ValueError:
        pass


@pytest.mark.slow
def test_pair_verification_training():
    ds = make_synthetic_dataset(num_subjects=4, seed=0)
    mcfg = ModelConfig(
        branches=(BranchConfig(kind="conv2d", modality="of",
                               filters_numbers=(4, 4, 8, 8),
                               ndense_units=16),
                  BranchConfig(kind="conv2d", modality="gray",
                               filters_numbers=(4, 4, 8, 8),
                               ndense_units=16)),
        merge="max", nclasses=0)
    tcfg = TrainConfig(margin=0.5, lr=1e-3)
    model = UGaitNet(mcfg)
    tx = make_optimizer(tcfg)
    state = init_state(model, tx, jax.random.PRNGKey(0))
    step = make_pair_train_step(model, tx, mcfg, tcfg)

    pipe = GaitPipeline(ds, DataConfig(batch_size=8, expand_level=1,
                                       augment=False),
                        ("of", "gray"), augment=False)
    v1, f1, l1 = pipe.load(np.arange(8), jax.random.PRNGKey(0))
    v2, f2, l2 = pipe.load(np.arange(8, 16), jax.random.PRNGKey(1))
    pair_labels = (np.asarray(l1) == np.asarray(l2)).astype(np.int32)
    pb = PairBatch(Batch(tuple(v1), tuple(f1), l1),
                   Batch(tuple(v2), tuple(f2), l2),
                   jnp.asarray(pair_labels))
    losses = []
    for i in range(3):
        state, m = step(state, pb, jax.random.PRNGKey(i))
        losses.append(float(m["pair_loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


@pytest.mark.slow
def test_norm_stats_persist_and_eval_roundtrip(tmp_path):
    """--normstats training persists norm_stats.npz with the experiment;
    cli.evaluate auto-loads it, and the standardized codes actually differ
    from un-standardized ones (the round-3 review finding: validation/eval
    encoded on the wrong input scale and hid it)."""
    import os
    from ugaitnet_tpu.cli.train import main as train_main
    from ugaitnet_tpu.cli.evaluate import main as eval_main
    from ugaitnet_tpu.eval.encode import encode_dataset
    from ugaitnet_tpu.core.config import load_json
    from ugaitnet_tpu.core import checkpoint as ckpt
    from ugaitnet_tpu.data.schema import GaitDataset
    from ugaitnet_tpu.train.train_step import init_state, make_optimizer

    _, _, j = _joint()
    data = str(tmp_path / "joint")
    j.save(data)
    exper = str(tmp_path / "exp")
    train_main(["--datadir", data, "--nclasses", "5", "--normstats",
                "--mod0", "of", "--mod1", "gray", "--bs", "6",
                "--epochs", "1", "--savemodelfreq", "1",
                "--gschannels", "4,4,8", "--gspartdim", "8",
                "--expandlevel", "1",
                "--experdir", exper, "--experfix", "ns"])
    experdir = os.path.join(exper, os.listdir(exper)[0])
    ns_path = os.path.join(experdir, "norm_stats.npz")
    assert os.path.exists(ns_path)

    # evaluate through the CLI: must announce the persisted stats
    import io, contextlib
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        eval_main(["--experdir", experdir, "--gallery", data,
                   "--probes", data, "--protocol", "openset",
                   "--knn", "1", "--bs", "6"])
    assert "norm_stats.npz" in buf.getvalue()

    # and the stats change the codes (i.e. they were really applied)
    cfgs = load_json(os.path.join(experdir, "config.json"))
    model = UGaitNet(cfgs["model"])
    tx = make_optimizer(cfgs["train"])
    state = ckpt.restore_checkpoint(
        experdir, ckpt.latest_checkpoint_step(experdir),
        init_state(model, tx, jax.random.PRNGKey(0)))
    z = np.load(ns_path)
    ns = {m: (z[f"mean_{m}"], z[f"std_{m}"]) for m in ("of", "gray")}
    ds = GaitDataset.load(data)
    with_ns, _, _, _ = encode_dataset(model, state.params, ds,
                                      ("of", "gray"), batch_size=6,
                                      norm_stats=ns)
    without, _, _, _ = encode_dataset(model, state.params, ds,
                                      ("of", "gray"), batch_size=6)
    assert not np.allclose(with_ns, without)
