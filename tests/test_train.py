"""Train step: loss decreases on synthetic data; sharded == single-device."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ugaitnet_tpu.core.config import (BranchConfig, DataConfig, ModelConfig,
                                      TrainConfig)
from ugaitnet_tpu.data.pipeline import GaitPipeline
from ugaitnet_tpu.data.sampler import BalancedGaitSampler
from ugaitnet_tpu.data.synthetic import make_synthetic_dataset
from ugaitnet_tpu.models.network import UGaitNet
from ugaitnet_tpu.parallel.sharding import (
    make_mesh, make_sharded_train_step, replicate, shard_batch)
from ugaitnet_tpu.train.train_step import (
    Batch, compute_losses, init_state, make_optimizer, make_train_step)


def small_cfg(nclasses=6):
    b = BranchConfig(kind="gaitset", modality="gray",
                     gaitset_channels=(8, 8, 16), part_dim=16)
    b2 = BranchConfig(kind="gaitset", modality="of",
                      gaitset_channels=(8, 8, 16), part_dim=16)
    return ModelConfig(branches=(b2, b), merge="sign_max", nclasses=nclasses)


@pytest.fixture(scope="module")
def setup():
    ds = make_synthetic_dataset(num_subjects=6, videos_per_subject=3,
                                subseqs_per_video=2, seed=0)
    mcfg = small_cfg()
    tcfg = TrainConfig(lr=3e-4, loss_weights=(1.0, 0.1), margin=0.2)
    model = UGaitNet(mcfg)
    tx = make_optimizer(tcfg)
    state = init_state(model, tx, jax.random.PRNGKey(0))
    dcfg = DataConfig(batch_size=8, expand_level=2, augment=False)
    pipe = GaitPipeline(ds, dcfg, ("of", "gray"), labmap=ds.label_map(),
                        augment=False)
    return ds, model, tx, state, pipe, mcfg, tcfg


def test_loss_decreases(setup):
    ds, model, tx, state, pipe, mcfg, tcfg = setup
    step = make_train_step(model, tx, mcfg, tcfg)
    sampler = BalancedGaitSampler(ds.labels, ds.gaits, batch_size=8,
                                  repetition=2, seed=0)
    losses = []
    for i in range(8):
        idx = sampler.next_batch()
        vols, flags, labels = pipe.load(idx, jax.random.PRNGKey(i))
        batch = Batch(volumes=tuple(vols), use_flags=tuple(flags),
                      labels=labels)
        state, metrics = step(state, batch, jax.random.PRNGKey(100 + i))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_sharded_step_matches_single_device(setup):
    ds, model, tx, _, pipe, mcfg, tcfg = setup
    state = init_state(model, tx, jax.random.PRNGKey(0))
    vols, flags, labels = pipe.load(np.arange(8), jax.random.PRNGKey(0))
    batch = Batch(volumes=tuple(vols), use_flags=tuple(flags), labels=labels)

    single = make_train_step(model, tx, mcfg, tcfg)
    s1, m1 = single(init_state(model, tx, jax.random.PRNGKey(0)), batch,
                    jax.random.PRNGKey(7))

    mesh = make_mesh(8)
    sharded = make_sharded_train_step(model, tx, mcfg, tcfg, mesh)
    st = replicate(init_state(model, tx, jax.random.PRNGKey(0)), mesh)
    sb = shard_batch(batch, mesh)
    s2, m2 = sharded(st, sb, jax.random.PRNGKey(7))

    # global-batch semantics: sharded == single device (same triplet mining)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-4)
    l1 = jax.tree.leaves(s1.params)
    l2 = jax.tree.leaves(s2.params)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def _run_steps(ds, pipe, mcfg, tcfg, step_fn, state, nsteps, to_batch=None):
    sampler = BalancedGaitSampler(ds.labels, ds.gaits, batch_size=8,
                                  repetition=2, seed=0)
    losses = []
    for i in range(nsteps):
        vols, flags, labels = pipe.load(sampler.next_batch(),
                                        jax.random.PRNGKey(i))
        batch = Batch(volumes=tuple(vols), use_flags=tuple(flags),
                      labels=labels)
        if to_batch is not None:
            batch = to_batch(batch)
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(100 + i))
        losses.append(float(metrics["loss"]))
    return losses


@pytest.mark.slow
def test_loss_converges_single_device(setup):
    """30 steps must HALVE the loss, not merely tick down (VERDICT r3 #9):
    a sampler/augment/optimizer bug that plateaus training at chance
    passes `losses[-1] < losses[0]` but fails this."""
    ds, model, tx, _, pipe, mcfg, _ = setup
    tcfg = TrainConfig(lr=3e-3, loss_weights=(1.0, 0.1), margin=0.2)
    tx = make_optimizer(tcfg)
    state = init_state(model, tx, jax.random.PRNGKey(0))
    step = make_train_step(model, tx, mcfg, tcfg)
    losses = _run_steps(ds, pipe, mcfg, tcfg, step, state, 30)
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.5 * losses[0], losses


@pytest.mark.slow
def test_loss_converges_dp_mesh(setup):
    """Same halving bar for the GSPMD data-parallel step."""
    ds, model, tx, _, pipe, mcfg, _ = setup
    tcfg = TrainConfig(lr=3e-3, loss_weights=(1.0, 0.1), margin=0.2)
    tx = make_optimizer(tcfg)
    mesh = make_mesh(8)
    step = make_sharded_train_step(model, tx, mcfg, tcfg, mesh)
    state = replicate(init_state(model, tx, jax.random.PRNGKey(0)), mesh)
    losses = _run_steps(ds, pipe, mcfg, tcfg, step, state, 30,
                        to_batch=lambda b: shard_batch(b, mesh))
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.5 * losses[0], losses


def test_optimizers_construct():
    for name in ("adam", "adam_keras", "sgd", "amsgrad", "adamw"):
        make_optimizer(TrainConfig(optimizer=name))


def test_keras_adam_matches_keras_update_rule():
    """keras_adam must track the EXACT Keras Adam recurrence (numpy oracle:
    alpha_t = lr*sqrt(1-b2^t)/(1-b1^t); p -= alpha_t*m/(sqrt(v)+eps)) for
    multiple steps, and must NOT coincide with optax.adam (whose epsilon
    lands on the bias-corrected denominator) — the difference is the whole
    point of the optimizer (train_step.py:keras_adam)."""
    import optax
    from ugaitnet_tpu.train.train_step import keras_adam

    lr, b1, b2, eps = 1e-3, 0.9, 0.999, 1e-7
    rng = np.random.RandomState(3)
    p0 = rng.randn(5, 3).astype(np.float32)
    # tiny gradients: sqrt(v) ~ eps is exactly where the two epsilon
    # placements diverge (large grads make both forms agree to fp noise)
    grads = [rng.randn(5, 3).astype(np.float32) * 1e-6 for _ in range(4)]

    # numpy oracle
    p, m, v = p0.copy(), np.zeros_like(p0), np.zeros_like(p0)
    for t, g in enumerate(grads, start=1):
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        alpha = lr * np.sqrt(1 - b2 ** t) / (1 - b1 ** t)
        p = p - alpha * m / (np.sqrt(v) + eps)

    def run(tx):
        params = jnp.asarray(p0)
        st = tx.init(params)
        for g in grads:
            upd, st = tx.update(jnp.asarray(g), st, params)
            params = optax.apply_updates(params, upd)
        return np.asarray(params)

    ours = run(keras_adam(lr, b1, b2, eps))
    np.testing.assert_allclose(ours, p, rtol=1e-6, atol=1e-7)

    theirs = run(optax.adam(lr, b1=b1, b2=b2, eps=eps))
    assert np.max(np.abs(theirs - p)) > 1e-5  # optax form really differs


def test_aux_and_focal_losses_run():
    mcfg = ModelConfig(
        branches=(BranchConfig(kind="conv2d", modality="of",
                               filters_numbers=(8, 8, 16, 16),
                               ndense_units=32),
                  BranchConfig(kind="conv2d", modality="gray",
                               filters_numbers=(8, 8, 16, 16),
                               ndense_units=32)),
        nclasses=6, aux_losses=True)
    tcfg = TrainConfig(use_focal=True, loss_weights=(1.0, 0.1, 0.05))
    model = UGaitNet(mcfg)
    tx = make_optimizer(tcfg)
    state = init_state(model, tx, jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    batch = Batch(
        volumes=(jnp.asarray(rng.randn(8, 25, 60, 60, 2), jnp.float32),
                 jnp.asarray(rng.randn(8, 25, 60, 60, 1), jnp.float32)),
        use_flags=(jnp.ones((8,)), jnp.ones((8,))),
        labels=jnp.asarray(np.repeat(np.arange(4), 2)))
    step = make_train_step(model, tx, mcfg, tcfg)
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert "aux_ce_0" in metrics and "aux_ce_1" in metrics
    assert float(metrics["reg"]) > 0  # conv2d branches carry L2 reg


@pytest.mark.slow
def test_trainer_with_mesh_end_to_end(tmp_path):
    """Trainer on the 8-device data-parallel mesh: epochs, checkpoints,
    validation — the full loop under GSPMD."""
    from ugaitnet_tpu.core import checkpoint as ckpt
    from ugaitnet_tpu.data.synthetic import make_synthetic_dataset
    from ugaitnet_tpu.parallel.sharding import make_mesh
    from ugaitnet_tpu.train.trainer import Trainer

    ds = make_synthetic_dataset(num_subjects=4, videos_per_subject=3,
                                subseqs_per_video=2, seed=5)
    mcfg = ModelConfig(
        branches=(BranchConfig(kind="gaitset", modality="of",
                               gaitset_channels=(4, 4, 8), part_dim=8),
                  BranchConfig(kind="gaitset", modality="gray",
                               gaitset_channels=(4, 4, 8), part_dim=8)),
        merge="sign_max", nclasses=4)
    # bs * expand = 16, divisible by the 8-device axis
    dcfg = DataConfig(batch_size=8, expand_level=2, repetitions=2,
                      augment=False)
    tcfg = TrainConfig(lr=1e-3, epochs=2, extra_epochs=0,
                       save_every_epochs=1, loss_weights=(1.0, 0.1))
    mesh = make_mesh(8)
    t = Trainer(mcfg, dcfg, tcfg, str(tmp_path / "exp"), mesh=mesh)
    state = t.fit(ds, val_perc=0.3)
    assert ckpt.latest_checkpoint_step(str(tmp_path / "exp")) == 2
    assert np.isfinite(np.asarray(
        jax.tree.leaves(state.params)[0], dtype=np.float32)).all()


def test_shard_batch_divisibility_error():
    from ugaitnet_tpu.parallel.sharding import make_mesh, shard_batch
    mesh = make_mesh(8)
    bad = Batch(volumes=(jnp.zeros((10, 2)),), use_flags=(jnp.ones(10),),
                labels=jnp.zeros(10, jnp.int32))
    with pytest.raises(ValueError, match="not divisible"):
        shard_batch(bad, mesh)


def test_shardmap_step_matches_single_device(setup):
    """Explicit-collectives shard_map step == single-device numerics, exactly.

    Dropout is disabled (rates 0) so the per-shard dropout keys are inert and
    the only remaining difference between the two steps is the collective
    structure itself: all_gather before triplet mining, pmean of CE and of
    grads. With l2_mode=feature (batch-independent normalization) the losses
    and the updated parameters must agree to fp tolerance — a materially
    wrong collective cannot pass this."""
    import dataclasses
    from ugaitnet_tpu.parallel.sharding import make_shardmap_train_step

    ds, _, _, _, pipe, mcfg, tcfg = setup
    mcfg_f = dataclasses.replace(
        mcfg, l2_mode="feature", dropout_code=0.0,
        branches=tuple(dataclasses.replace(b, dropout=0.0)
                       for b in mcfg.branches))
    model = UGaitNet(mcfg_f)
    tx = make_optimizer(tcfg)

    vols, flags, labels = pipe.load(np.arange(8), jax.random.PRNGKey(0))
    batch = Batch(volumes=tuple(vols), use_flags=tuple(flags), labels=labels)

    single = make_train_step(model, tx, mcfg_f, tcfg)
    s1, m1 = single(init_state(model, tx, jax.random.PRNGKey(0)), batch,
                    jax.random.PRNGKey(7))

    mesh = make_mesh(8)
    stepf = make_shardmap_train_step(model, tx, mcfg_f, tcfg, mesh)
    st = replicate(init_state(model, tx, jax.random.PRNGKey(0)), mesh)
    sb = shard_batch(batch, mesh)
    s2, m2 = stepf(st, sb, jax.random.PRNGKey(7))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-4)
    # updated params equal => pmean'd grads equal the full-batch grads
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_remat_identical_numerics(setup):
    """ModelConfig.remat recomputes activations instead of storing them —
    the loss, grads, and one optimizer step must be identical to the
    non-remat model (same ops, same order, just re-executed)."""
    import dataclasses
    ds, model, tx, _, pipe, mcfg, tcfg = setup
    vols, flags, labels = pipe.load(np.arange(8), jax.random.PRNGKey(0))
    batch = Batch(volumes=tuple(vols), use_flags=tuple(flags), labels=labels)

    mcfg_r = dataclasses.replace(mcfg, remat=True)
    model_r = UGaitNet(mcfg_r)
    # identical init: remat is a lifted transform, the param tree and
    # names must be unchanged (checkpoints interchangeable)
    s0 = init_state(model, tx, jax.random.PRNGKey(0))
    s0r = init_state(model_r, tx, jax.random.PRNGKey(0))
    assert jax.tree_util.tree_structure(s0.params) \
        == jax.tree_util.tree_structure(s0r.params)
    for a, b in zip(jax.tree.leaves(s0.params), jax.tree.leaves(s0r.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    step = make_train_step(model, tx, mcfg, tcfg)
    step_r = make_train_step(model_r, tx, mcfg_r, tcfg)
    s1, m1 = step(s0, batch, jax.random.PRNGKey(7))
    s1r, m1r = step_r(s0r, batch, jax.random.PRNGKey(7))
    np.testing.assert_allclose(float(m1["loss"]), float(m1r["loss"]),
                               rtol=1e-6)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s1r.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
