"""Checkpoint: save/restore exactness, latest-step scan, surgery restore."""

import numpy as np
import jax
import jax.numpy as jnp

from ugaitnet_tpu.core import checkpoint as ckpt
from ugaitnet_tpu.core.config import BranchConfig, ModelConfig, TrainConfig
from ugaitnet_tpu.models.network import UGaitNet, init_params
from ugaitnet_tpu.train.train_step import init_state, make_optimizer


def _mcfg(nclasses):
    return ModelConfig(
        branches=(BranchConfig(kind="gaitset", modality="gray",
                               gaitset_channels=(4, 4, 8), part_dim=8),),
        nclasses=nclasses)


def test_save_restore_exact(tmp_path):
    model = UGaitNet(_mcfg(4))
    tx = make_optimizer(TrainConfig())
    state = init_state(model, tx, jax.random.PRNGKey(0))
    ckpt.save_checkpoint(str(tmp_path), 3, state)
    assert ckpt.latest_checkpoint_step(str(tmp_path)) == 3
    assert ckpt.latest_checkpoint_step(str(tmp_path), epoch_max=2) is None
    blank = init_state(model, tx, jax.random.PRNGKey(99))
    restored = ckpt.restore_checkpoint(str(tmp_path), 3, blank)
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_surgery_restore_different_head(tmp_path):
    """Parity with load_weights(by_name=True, skip_mismatch=True): change
    nclasses, keep every compatible weight (nets/mj_uwyhNets_ba.py:610-630)."""
    model4 = UGaitNet(_mcfg(4))
    params4 = init_params(model4, jax.random.PRNGKey(0))
    ckpt.save_checkpoint(str(tmp_path), 1, params4)

    model9 = UGaitNet(_mcfg(9))
    params9 = init_params(model9, jax.random.PRNGKey(1))
    merged = ckpt.restore_params_surgery(str(tmp_path), 1, params9)

    # branch weights come from the checkpoint
    a = merged["params"]["branch_gray"]["a_conv1"]["kernel"]
    b = params4["params"]["branch_gray"]["a_conv1"]["kernel"]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # classifier head keeps the new shape/values
    assert merged["params"]["classprob"]["kernel"].shape[1] == 9
    np.testing.assert_array_equal(
        np.asarray(merged["params"]["classprob"]["kernel"]),
        np.asarray(params9["params"]["classprob"]["kernel"]))


def test_merge_matching_namedtuple_opt_state():
    """An orbax-restored opt_state comes back as plain lists/dicts; merging
    it into a live TrainState must rebuild NamedTuple nodes (optax
    ScaleByAdamState takes N field args, not one list) and keep EmptyState
    as-is rather than collapsing it to a (0,) ndarray."""
    import optax
    params = {"w": np.arange(4, dtype=np.float32).reshape(2, 2),
              "b": np.zeros(2, np.float32)}
    tx = optax.adam(1e-3)
    st = tx.init(params)

    def to_plain(t):   # what a json/orbax round-trip produces
        if isinstance(t, tuple):
            return [to_plain(x) for x in t]
        if isinstance(t, dict):
            return {k: to_plain(v) for k, v in t.items()}
        return np.asarray(t)

    source = to_plain(jax.tree.map(lambda x: np.asarray(x) + 1.0, st))
    merged = ckpt.merge_matching(st, source)
    # structure preserved: same pytree (NamedTuples intact)
    assert jax.tree_util.tree_structure(merged) == \
        jax.tree_util.tree_structure(st)
    assert type(merged[0]).__name__ == type(st[0]).__name__
    for a, b in zip(jax.tree.leaves(merged), jax.tree.leaves(st)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b) + 1.0)


def test_async_writer_roundtrip_and_overlap(tmp_path):
    """AsyncCheckpointWriter: values captured at save() time are what lands
    on disk (the caller may mutate/donate device buffers immediately), and
    back-to-back saves to different steps both become durable."""
    model = UGaitNet(_mcfg(4))
    tx = make_optimizer(TrainConfig())
    state = init_state(model, tx, jax.random.PRNGKey(0))
    state2 = init_state(model, tx, jax.random.PRNGKey(5))
    with ckpt.AsyncCheckpointWriter() as w:
        w.save(str(tmp_path), 1, state)
        w.save(str(tmp_path), 2, state2)   # overlapping save
        w.save(str(tmp_path), "best", state2)
        w.wait()
        assert ckpt.latest_checkpoint_step(str(tmp_path)) == 2
        assert ckpt.has_best_checkpoint(str(tmp_path))
        blank = init_state(model, tx, jax.random.PRNGKey(99))
        r1 = ckpt.restore_checkpoint(str(tmp_path), 1, blank)
        r2 = ckpt.restore_checkpoint(str(tmp_path), 2, blank)
        for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(r1)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(state2), jax.tree.leaves(r2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_trainer_async_checkpoint_and_resume(tmp_path):
    """Trainer(async_checkpoint=True): checkpoints are durable when fit()
    returns, and a fresh Trainer resumes from them."""
    import dataclasses

    from ugaitnet_tpu.core.config import DataConfig
    from ugaitnet_tpu.data.synthetic import make_synthetic_dataset
    from ugaitnet_tpu.train.trainer import Trainer

    ds = make_synthetic_dataset(num_subjects=4, videos_per_subject=2,
                                subseqs_per_video=2, seed=0)
    mcfg = ModelConfig(
        branches=(BranchConfig(kind="gaitset", modality="gray",
                               gaitset_channels=(4, 4, 8), part_dim=8),),
        nclasses=4)
    dcfg = DataConfig(batch_size=8, expand_level=1, augment=False,
                      repetitions=1)
    tcfg = TrainConfig(lr=3e-4, epochs=1, save_every_epochs=1,
                       loss_weights=(1.0, 0.1), async_checkpoint=True)
    tr = Trainer(mcfg, dcfg, tcfg, str(tmp_path / "exp"))
    tr.fit(ds, val_perc=0.0, seed=0)
    assert ckpt.latest_checkpoint_step(str(tmp_path / "exp")) == 1
    # resume: a second trainer picks the checkpoint up and continues
    tcfg2 = dataclasses.replace(tcfg, epochs=2)
    tr2 = Trainer(mcfg, dcfg, tcfg2, str(tmp_path / "exp"))
    _, start = tr2.init_or_resume(seed=0)
    assert start == 1
    tr2.fit(ds, val_perc=0.0, seed=0)
    assert ckpt.latest_checkpoint_step(str(tmp_path / "exp")) == 2
