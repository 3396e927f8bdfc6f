"""Sweep CLI pieces: grid parsing + TensorBoard HParams output."""

import glob
import os

from ugaitnet_tpu.cli.sweep import _log_hparams, parse_grid


def test_parse_grid():
    g = parse_grid(["lr=1e-4,3e-4", "optimizer=adam,sgd"])
    assert g == {"lr": ["1e-4", "3e-4"], "optimizer": ["adam", "sgd"]}


def test_log_hparams_writes_plugin_events(tmp_path):
    d = str(tmp_path / "hp")
    _log_hparams(d, 0, {"lr": "1e-4", "optimizer": "adam"},
                 {"loss": 0.5, "acc": 0.9})
    _log_hparams(d, 1, {"lr": "3e-4", "optimizer": "adam"},
                 {"loss": 0.4, "acc": 0.95})
    evs = glob.glob(os.path.join(d, "run-*", "events.out.tfevents.*"))
    assert len(evs) >= 2
    # the HParams plugin stores its session protos under the
    # '_hparams_/session_start_info' tag — look for the plugin marker in
    # the raw event bytes (cheap, no TB parser needed)
    blob = b"".join(open(e, "rb").read() for e in evs)
    assert b"_hparams_" in blob
    assert b"session_start_info" in blob
