"""Trainer controllers: val-loss plateau, best checkpoint, resume of the
LR schedule state (reference: ReduceLROnPlateau(monitor='val_loss') +
ModelCheckpoint(save_best_only=True), mains/..._1mod.py:245-248,
mains/..._CasiaB.py:363-364)."""

import numpy as np
import jax
import pytest

from ugaitnet_tpu.core import checkpoint as ckpt
from ugaitnet_tpu.core.config import (BranchConfig, DataConfig, ModelConfig,
                                      TrainConfig)
from ugaitnet_tpu.data.synthetic import make_synthetic_dataset
from ugaitnet_tpu.train.train_step import get_lr
from ugaitnet_tpu.train.trainer import Trainer


def _tiny_cfgs():
    mcfg = ModelConfig(
        branches=(BranchConfig(kind="gaitset", modality="of",
                               gaitset_channels=(4, 4, 8), part_dim=8),),
        nclasses=4)
    dcfg = DataConfig(batch_size=4, expand_level=1, repetitions=2,
                      augment=False)
    tcfg = TrainConfig(lr=1e-3, epochs=5, extra_epochs=0,
                       save_every_epochs=1, loss_weights=(1.0, 0.1))
    return mcfg, dcfg, tcfg


@pytest.fixture(scope="module")
def tiny_ds():
    return make_synthetic_dataset(num_subjects=4, videos_per_subject=3,
                                  subseqs_per_video=2, seed=3)


def test_plateau_drops_lr_on_val_plateau_not_train(tiny_ds, tmp_path,
                                                   monkeypatch):
    """Train loss decreases every epoch, but the val loss is pinned flat:
    the LR must still drop (plateau monitors val, patience=3)."""
    mcfg, dcfg, tcfg = _tiny_cfgs()
    monkeypatch.setattr(Trainer, "_val_metrics",
                        lambda self, state, pipe: {"loss": 1.0})
    monkeypatch.setattr(Trainer, "_validate",
                        lambda self, state, ds, idx, epoch=0: {})
    t = Trainer(mcfg, dcfg, tcfg, str(tmp_path / "exp"))
    state = t.fit(tiny_ds, val_perc=0.3)
    assert get_lr(state) < tcfg.lr * 0.99, (
        "LR should have dropped on the flat val loss")


def test_best_checkpoint_tracks_min_val_loss(tiny_ds, tmp_path, monkeypatch):
    mcfg, dcfg, tcfg = _tiny_cfgs()
    val_seq = iter([3.0, 1.0, 2.0, 2.5, 2.5])
    captured = {}

    def fake_val(self, state, pipe):
        v = next(val_seq)
        if v == 1.0:  # remember the params that should become 'best'
            captured["params"] = jax.device_get(state.params)
        return {"loss": v}

    monkeypatch.setattr(Trainer, "_val_metrics", fake_val)
    monkeypatch.setattr(Trainer, "_validate",
                        lambda self, state, ds, idx, epoch=0: {})
    t = Trainer(mcfg, dcfg, tcfg, str(tmp_path / "exp"))
    state = t.fit(tiny_ds, val_perc=0.3)

    assert ckpt.has_best_checkpoint(str(tmp_path / "exp"))
    best = ckpt.restore_checkpoint(str(tmp_path / "exp"), "best", state)
    a = jax.tree.leaves(captured["params"])[0]
    b = jax.tree.leaves(best.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_plateau_state_survives_resume(tiny_ds, tmp_path, monkeypatch):
    """After a restart, the reduced LR must persist (no reset to tcfg.lr)."""
    mcfg, dcfg, tcfg = _tiny_cfgs()
    monkeypatch.setattr(Trainer, "_val_metrics",
                        lambda self, state, pipe: {"loss": 1.0})
    monkeypatch.setattr(Trainer, "_validate",
                        lambda self, state, ds, idx, epoch=0: {})
    exp = str(tmp_path / "exp")
    t = Trainer(mcfg, dcfg, tcfg, exp)
    state = t.fit(tiny_ds, val_perc=0.3)
    reduced = get_lr(state)
    assert reduced < tcfg.lr * 0.99

    import dataclasses
    tcfg2 = dataclasses.replace(tcfg, epochs=7)
    t2 = Trainer(mcfg, dcfg, tcfg2, exp)
    state2 = t2.fit(tiny_ds, val_perc=0.3)
    assert get_lr(state2) <= reduced * 1.001, (
        "resume must not reset the reduced LR back to tcfg.lr")


def test_val_metrics_real_path(tiny_ds, tmp_path):
    """The un-mocked _val_metrics runs the eval step on the val view and
    returns a finite full-objective loss."""
    from ugaitnet_tpu.data.pipeline import GaitPipeline
    from ugaitnet_tpu.data.sampler import split_train_val_by_video

    mcfg, dcfg, tcfg = _tiny_cfgs()
    t = Trainer(mcfg, dcfg, tcfg, str(tmp_path / "exp"))
    state, _ = t.init_or_resume()
    _, val_idx = split_train_val_by_video(tiny_ds.video_ids, perc=0.3,
                                          seed=0)
    pipe = GaitPipeline(tiny_ds, dcfg, t.modalities,
                        labmap=tiny_ds.label_map(), indices=val_idx)
    vm = t._val_metrics(state, pipe)
    assert np.isfinite(vm["loss"])
    assert "id_ce" in vm


def test_early_stop_survives_restart(tiny_ds, tmp_path, monkeypatch):
    """Once EarlyStopOnAccuracy fires, a restarted run must NOT resume the
    main loop toward tcfg.epochs (round-3 review finding: the stop
    decision lived only in process memory; the plateau state was
    persisted but the stop was not)."""
    mcfg, dcfg, tcfg = _tiny_cfgs()
    monkeypatch.setattr(Trainer, "_val_metrics",
                        lambda self, state, pipe: {"loss": 1.0})
    monkeypatch.setattr(Trainer, "_validate",
                        lambda self, state, ds, idx, epoch=0: {})
    # force the stop right after epoch 2 by faking perfect train accuracy
    real_epoch = Trainer._epoch

    def fake_epoch(self, state, pipe, sampler, epoch, seed):
        state, m = real_epoch(self, state, pipe, sampler, epoch, seed)
        m["acc"] = 1.0 if epoch >= 1 else 0.0
        return state, m

    monkeypatch.setattr(Trainer, "_epoch", fake_epoch)
    exp = str(tmp_path / "exp")
    t = Trainer(mcfg, dcfg, tcfg, exp)
    t.fit(tiny_ds, val_perc=0.3)
    stopped_at = ckpt.latest_checkpoint_step(exp)
    assert stopped_at < tcfg.epochs

    # restart: epochs beyond the stop must not run
    calls = []

    def counting_epoch(self, state, pipe, sampler, epoch, seed):
        calls.append(epoch)
        return real_epoch(self, state, pipe, sampler, epoch, seed)

    monkeypatch.setattr(Trainer, "_epoch", counting_epoch)
    t2 = Trainer(mcfg, dcfg, tcfg, exp)
    t2.fit(tiny_ds, val_perc=0.3)
    assert calls == [], f"main loop re-ran epochs {calls} after early stop"
    assert ckpt.latest_checkpoint_step(exp) == stopped_at


_CLI_BOOT = """
import os, sys
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8"
                           ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
from ugaitnet_tpu.cli.train import main
main(sys.argv[1:])
"""


def _train_args(experdir, epochs=4):
    return ["--synthetic", "--nclasses", "4", "--bs", "4",
            "--repetitions", "2", "--epochs", str(epochs),
            "--savemodelfreq", "1", "--gschannels", "4,4,8",
            "--gspartdim", "8", "--noaugment", "--expandlevel", "1",
            "--valperc", "0.15", "--lr", "1e-3", "--seed", "0",
            "--experdir", experdir, "--experfix", "killresume"]


def _only_experdir(base):
    import os
    runs = [d for d in os.listdir(base)
            if os.path.isdir(os.path.join(base, d))]
    assert len(runs) == 1, runs
    return os.path.join(base, runs[0])


def _epoch_losses(experdir, prefix="train/"):
    from ugaitnet_tpu.obsv.logger import read_metrics
    out = {}
    for rec in read_metrics(experdir):
        if f"{prefix}loss" in rec:
            out[int(rec["step"])] = float(rec[f"{prefix}loss"])
    return out


@pytest.mark.slow
def test_kill_and_resume_e2e(tmp_path):
    """Crash-resume acceptance (VERDICT r4 ask #8): SIGKILL a real
    cli/train.py subprocess mid-run, restart it, and require that it
    resumes at the last durable chunk (never back at epoch 1) and lands on
    EXACTLY the same per-epoch losses as an uninterrupted run — the
    sampler fast-forward in Trainer._fit makes crash-resume replay the
    identical batch sequence.  The reference's whole resilience story is
    this flow (utils/mj_netUtils.py:8-29 getLastEpochModel + initepoch)."""
    import os
    import subprocess
    import sys
    import time

    env = dict(os.environ)
    env.pop("UGAITNET_TPU_TESTS", None)

    # --- run A: uninterrupted ------------------------------------------
    base_a = str(tmp_path / "expA")
    subprocess.run([sys.executable, "-c", _CLI_BOOT, *_train_args(base_a)],
                   env=env, check=True, timeout=900,
                   stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
    exp_a = _only_experdir(base_a)
    losses_a = _epoch_losses(exp_a)
    # run A may legitimately early-stop before --epochs 4 (train acc hits
    # 0.99 on this tiny task around epoch 3); the contract below is that
    # run B reproduces run A EXACTLY — including the stop decision
    assert min(losses_a) == 1 and max(losses_a) >= 3, losses_a

    # --- run B: killed mid-run, then resumed ---------------------------
    from ugaitnet_tpu.core import checkpoint as ckpt
    base_b = str(tmp_path / "expB")
    proc = subprocess.Popen(
        [sys.executable, "-c", _CLI_BOOT, *_train_args(base_b)], env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
    try:
        deadline = time.time() + 600
        exp_b = None
        while time.time() < deadline:
            if proc.poll() is not None:
                raise AssertionError(
                    "run B finished before it could be killed — slow the "
                    "poll or raise --epochs\n"
                    + proc.stdout.read().decode(errors="replace")[-2000:])
            try:
                exp_b = _only_experdir(base_b)
                last = ckpt.latest_checkpoint_step(exp_b)
            except (AssertionError, OSError):
                last = None
            # kill right after the FIRST durable chunk, so at least two
            # epochs (and the stop decision) happen post-resume
            if last is not None and int(last) >= 1:
                break
            time.sleep(0.5)
        else:
            raise AssertionError("no mid-run checkpoint appeared in 600s")
        proc.kill()   # SIGKILL: no cleanup, no atexit, no orbax flush
        proc.wait(timeout=60)
    finally:
        if proc.poll() is None:
            proc.kill()

    killed_at = int(ckpt.latest_checkpoint_step(exp_b))
    assert killed_at < max(losses_a)

    # restart: must resume from the durable chunk and run to completion
    res = subprocess.run(
        [sys.executable, "-c", _CLI_BOOT, *_train_args(base_b)], env=env,
        check=True, timeout=900, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT)
    out = res.stdout.decode(errors="replace")
    assert "resum" in out.lower(), out[-2000:]

    losses_b = _epoch_losses(exp_b)
    # the resumed run reproduces run A EXACTLY: same epoch set (including
    # the early-stop decision — plateau/early-stop state survived the
    # SIGKILL), same per-epoch losses (the sampler fast-forward replays
    # the identical batch sequence, same fp32 arithmetic)
    assert set(losses_b) == set(losses_a), (losses_a, losses_b)
    for e in sorted(losses_a):
        np.testing.assert_allclose(
            losses_b[e], losses_a[e], rtol=0, atol=1e-6,
            err_msg=f"epoch {e}: resumed run diverged from the "
                    f"uninterrupted run")
    # controller state survived (plateau/early-stop persistence)
    assert os.path.exists(os.path.join(exp_b, "controller.json"))
