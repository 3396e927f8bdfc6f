"""Convergence-to-Rank-1: the first recorded accuracy number (VERDICT r3 #2).

Trains the flagship 2-mod topology to convergence on 16 synthetic
identities via the real Trainer.fit loop, then scores held-out draws
through the FULL eval_camera_pairs protocol.  Chance is 1/16; the assert
is >= 0.9 — a model that plateaus (broken sampler, augment, LR control,
encode or kNN) fails this where the loss-goes-down smokes would pass.

The committed artifact `benchmarks/results_synthetic_rank1.json` is
produced by the same entry (`python benchmarks/synthetic_rank1.py`).
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def test_synthetic_convergence_rank1(tmp_path):
    from benchmarks.synthetic_rank1 import run

    res = run(str(tmp_path / "exp"))
    assert res["rank1_subseq"] >= 0.9, res
    assert res["rank1_video"] >= 0.9, res

    # the committed artifact must exist and agree on the protocol shape
    path = os.path.join(os.path.dirname(__file__), os.pardir,
                        "benchmarks", "results_synthetic_rank1.json")
    with open(path) as f:
        recorded = json.load(f)
    assert recorded["rank1_subseq"] >= 0.9
    assert recorded["num_subjects"] == res["num_subjects"]
