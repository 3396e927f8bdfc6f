"""Convergence-to-Rank-1: the recorded accuracy artifact (VERDICT r3 #2,
hardened per VERDICT r4 #3).

Trains the flagship 2-mod topology to convergence on synthetic identities
via the real Trainer.fit loop (now with expand_level=2 modality dropout),
then scores held-out draws through the FULL eval_camera_pairs protocol plus
modality-dropout probe sweeps and pooled verification EER.  Chance is
1/num_subjects; the assert is >= 0.9 — a model that plateaus (broken
sampler, augment, LR control, encode or kNN) fails this where the
loss-goes-down smokes would pass.

The committed artifact `benchmarks/results_synthetic_rank1.json` is the
64-identity run (chance 1.6%) produced by the same entry
(`python benchmarks/synthetic_rank1.py`); the pytest tier runs a reduced
16-identity version of the identical code path.
"""

import json
import os
import sys

import pytest

pytestmark = pytest.mark.slow

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def test_synthetic_convergence_rank1(tmp_path):
    from benchmarks.synthetic_rank1 import run

    res = run(str(tmp_path / "exp"), num_subjects=16)
    assert res["rank1_subseq"] >= 0.9, res
    assert res["rank1_video"] >= 0.9, res
    # EER recorded and sane for a converged model
    assert res["eer"] == res["eer"] and res["eer"] <= 0.25, res
    assert set(res["sweeps"]) == {"full", "of_only", "gray_only"}

    # the committed 64-id artifact must exist, agree on the protocol
    # shape, and carry SENSITIVITY: the full config scores >= 0.9 while at
    # least one single-modality probe sweep visibly degrades (the metric
    # can move — it is not a saturated 1.0)
    path = os.path.join(os.path.dirname(__file__), os.pardir,
                        "benchmarks", "results_synthetic_rank1.json")
    with open(path) as f:
        recorded = json.load(f)
    assert recorded["num_subjects"] >= 64
    assert recorded["chance_rank1"] <= 1 / 64 + 1e-9
    assert recorded["rank1_subseq"] >= 0.9
    sweeps = recorded["sweeps"]
    degraded = min(sweeps["of_only"]["rank1_subseq"],
                   sweeps["gray_only"]["rank1_subseq"])
    assert degraded < sweeps["full"]["rank1_subseq"] - 0.02 or \
        max(sweeps["of_only"]["eer"], sweeps["gray_only"]["eer"]) \
        > sweeps["full"]["eer"] + 0.02, sweeps
