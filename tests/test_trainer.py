"""Trainer loop: checkpoints, resume, LR control, logging, schedules."""

import os

import numpy as np
import jax
import pytest

from ugaitnet_tpu.core import checkpoint as ckpt
from ugaitnet_tpu.core.config import (BranchConfig, DataConfig, ModelConfig,
                                      TrainConfig, load_json)
from ugaitnet_tpu.data.synthetic import make_synthetic_dataset
from ugaitnet_tpu.obsv.logger import read_metrics
from ugaitnet_tpu.train.schedule import (
    EarlyStopOnAccuracy, ReduceLROnPlateau, ReduceLROnPlateauOrSlowdown)
from ugaitnet_tpu.train.trainer import Trainer, experiment_name
from ugaitnet_tpu.train.train_step import (
    get_lr, init_state, make_optimizer, set_lr)
from ugaitnet_tpu.models.network import UGaitNet


def tiny_cfgs(epochs=2, extra=0):
    mcfg = ModelConfig(
        branches=(BranchConfig(kind="gaitset", modality="of",
                               gaitset_channels=(4, 4, 8), part_dim=8),
                  BranchConfig(kind="gaitset", modality="gray",
                               gaitset_channels=(4, 4, 8), part_dim=8)),
        merge="sign_max", nclasses=4)
    dcfg = DataConfig(batch_size=8, expand_level=2, repetitions=2,
                      augment=False)
    tcfg = TrainConfig(lr=1e-3, epochs=epochs, extra_epochs=extra,
                       save_every_epochs=1, loss_weights=(1.0, 0.1))
    return mcfg, dcfg, tcfg


@pytest.fixture(scope="module")
def ds():
    return make_synthetic_dataset(num_subjects=4, videos_per_subject=3,
                                  subseqs_per_video=2, seed=1)


def test_trainer_runs_and_checkpoints(tmp_path, ds):
    mcfg, dcfg, tcfg = tiny_cfgs(epochs=2)
    exp = str(tmp_path / "exp1")
    t = Trainer(mcfg, dcfg, tcfg, exp)
    state = t.fit(ds, val_perc=0.3)
    assert ckpt.latest_checkpoint_step(exp) == 2
    recs = read_metrics(exp)
    assert any("train/loss" in r for r in recs)
    assert any(k.startswith("val/") for r in recs for k in r)
    assert os.path.exists(os.path.join(exp, "config.json"))
    cfgs = load_json(os.path.join(exp, "config.json"))
    assert cfgs["model"].nclasses == 4


def test_trainer_resume(tmp_path, ds):
    mcfg, dcfg, tcfg = tiny_cfgs(epochs=1)
    exp = str(tmp_path / "exp2")
    t = Trainer(mcfg, dcfg, tcfg, exp)
    t.fit(ds, val_perc=0.3)
    assert ckpt.latest_checkpoint_step(exp) == 1
    # second run continues to epoch 3
    mcfg, dcfg, tcfg = tiny_cfgs(epochs=3)
    t2 = Trainer(mcfg, dcfg, tcfg, exp)
    state2, start = t2.init_or_resume()
    assert start == 1
    t2.fit(ds, val_perc=0.3)
    assert ckpt.latest_checkpoint_step(exp) == 3


def test_extra_epochs_finetune(tmp_path, ds):
    mcfg, dcfg, tcfg = tiny_cfgs(epochs=1, extra=1)
    exp = str(tmp_path / "exp3")
    t = Trainer(mcfg, dcfg, tcfg, exp)
    t.fit(ds, val_perc=0.3)
    assert ckpt.latest_checkpoint_step(exp) == 2
    recs = read_metrics(exp)
    assert any("finetune/loss" in r for r in recs)


def test_set_get_lr():
    mcfg, _, tcfg = tiny_cfgs()
    model = UGaitNet(mcfg)
    tx = make_optimizer(tcfg)
    state = init_state(model, tx, jax.random.PRNGKey(0))
    assert abs(get_lr(state) - 1e-3) < 1e-9
    state = set_lr(state, 5e-4)
    assert abs(get_lr(state) - 5e-4) < 1e-9


def test_plateau_reduces_after_patience():
    p = ReduceLROnPlateau(lr=1.0, factor=0.5, patience=2)
    assert p.update(1.0) == 1.0   # improves (inf -> 1.0)
    assert p.update(1.0) == 1.0   # wait 1
    assert p.update(1.0) == 0.5   # wait 2 -> reduce
    assert p.update(0.4) == 0.5   # improvement resets


def test_plateau_slowdown_relative_delta():
    p = ReduceLROnPlateauOrSlowdown(lr=1.0, factor=0.5, patience=1,
                                    min_delta=0.1)
    p.update(10.0)                # best = 10
    # 9.5 is <5% better than best -> counts as plateau -> reduce
    assert p.update(9.5) == 0.5
    # 5.0 is >10% better -> improvement
    p2 = ReduceLROnPlateauOrSlowdown(lr=1.0, factor=0.5, patience=1,
                                     min_delta=0.1)
    p2.update(10.0)
    assert p2.update(5.0) == 1.0


def test_plateau_slowdown_min_delta_zero_seeds_best():
    """min_delta=0: the initial best=inf made the relative threshold
    inf*0 = nan, so best never seeded and the LR decayed every `patience`
    epochs through monotone improvement."""
    p = ReduceLROnPlateauOrSlowdown(lr=1.0, factor=0.5, patience=2,
                                    min_delta=0.0)
    assert p.update(1.0) == 1.0    # seeds best
    assert p.best == 1.0
    assert p.update(0.5) == 1.0    # improvement, no decay
    assert p.update(0.25) == 1.0
    assert p.best == 0.25


def test_plateau_slowdown_nan_metric_still_decays():
    """A NaN monitored metric (diverging run) must count as NO improvement:
    treating any non-finite best as 'seed again' let NaN re-seed best every
    epoch, so wait never accumulated and the LR never dropped while the
    run diverged."""
    p = ReduceLROnPlateauOrSlowdown(lr=1.0, factor=0.5, patience=2,
                                    min_delta=0.01)
    assert p.update(float("nan")) == 1.0   # wait 1: nan never seeds best
    assert p.update(float("nan")) == 0.5   # wait 2 -> reduce
    assert np.isinf(p.best)                # best still unseeded
    assert p.update(2.0) == 0.5            # first finite value seeds best
    assert p.best == 2.0
    assert p.update(1.0) == 0.5            # real improvement, no decay


def test_early_stop():
    e = EarlyStopOnAccuracy(0.99)
    assert not e.update(0.5)
    assert e.update(0.995)


def test_experiment_name_encodes_config():
    mcfg, dcfg, tcfg = tiny_cfgs()
    name = experiment_name(mcfg, dcfg, tcfg)
    assert "of+gray" in name and "sign_max" in name and "bs008" in name


def test_sgd_set_lr_sticks():
    """Regression: passing the Keras decay schedule as the injected
    learning_rate made inject_hyperparams recompute it every step, so
    set_lr (plateau reductions, the fine-tune lr reset) was a silent
    no-op for sgd.  The base lr must be settable with the 1e-5
    inverse-time decay still applied on top."""
    import jax.numpy as jnp

    from ugaitnet_tpu.core.config import TrainConfig
    from ugaitnet_tpu.train.train_step import (TrainState, get_lr,
                                               make_optimizer, set_lr)
    tx = make_optimizer(TrainConfig(optimizer="sgd", lr=1e-4, momentum=0.0))
    p = {"w": jnp.ones(4)}
    st = TrainState(step=jnp.asarray(0, jnp.int32), params=p,
                    opt_state=tx.init(p))
    g = {"w": jnp.ones(4)}
    u, o = tx.update(g, st.opt_state, p)
    np.testing.assert_allclose(float(u["w"][0]), -1e-4, rtol=1e-4)
    st = TrainState(step=st.step, params=p, opt_state=o)
    st = set_lr(st, 5e-6)
    assert np.isclose(get_lr(st), 5e-6)
    u, _ = tx.update(g, st.opt_state, p)
    # decay at count=1: 5e-6 / (1 + 1e-5)
    np.testing.assert_allclose(float(u["w"][0]), -5e-6 / (1 + 1e-5),
                               rtol=1e-4)


def test_metrics_logger_strict_json_on_nonfinite(tmp_path):
    """nan/inf metrics (e.g. an undefined val EER) must serialize as
    null — literal NaN is invalid JSON and breaks jq/strict consumers
    of the metrics.jsonl stream."""
    import json as _json

    from ugaitnet_tpu.obsv.logger import MetricsLogger
    lg = MetricsLogger(str(tmp_path))
    lg.log(3, {"loss": 1.5, "eer": float("nan"), "peak": float("inf")})
    lg.close()
    line = open(tmp_path / "metrics.jsonl").read().strip().splitlines()[-1]
    assert "NaN" not in line and "Infinity" not in line
    rec = _json.loads(line)
    assert rec["loss"] == 1.5
    assert rec["eer"] is None and rec["peak"] is None
