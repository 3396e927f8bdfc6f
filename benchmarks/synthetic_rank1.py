"""Synthetic-identities convergence run -> full eval protocol -> Rank-1.

The closest legal proxy for the reference's north-star number (Rank-1 98.9%
on CASIA-B, /root/reference/README.md:8, protocol at
/root/reference/mains/mj_testUWYHGaitNet_open_casiab.py:380-429) in an
image with no real gait data: train the flagship 2-mod topology (gaitset x
gaitset, sign_max merge — width scaled down for the 1-core CPU host) via
the real `Trainer.fit` loop (P x K sampler, joint augmentation pipeline,
plateau LR control, early stop, checkpointing), then push a HELD-OUT
dataset — same identity templates, disjoint noise draws (
`make_synthetic_dataset(template_seed=...)`) — through the FULL
`eval/protocol.py` camera-pair path (encode_set -> per-gallery-camera kNN
-> subsequence Rank-1 + per-video majority vote).

Unlike the loss-goes-down smoke tests, this validates sampler + augment +
LR control + encode + kNN protocol JOINTLY: a model that plateaus at
chance scores Rank-1 ~= 1/num_subjects here and fails loudly.

Run as a script to (re)produce `benchmarks/results_synthetic_rank1.json`;
`tests/test_convergence_rank1.py` runs the same entry under pytest.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run(experdir: str, num_subjects: int = 16, epochs: int = 20,
        seed: int = 0) -> dict:
    from ugaitnet_tpu.core.config import (BranchConfig, DataConfig,
                                          EvalConfig, ModelConfig,
                                          TrainConfig)
    from ugaitnet_tpu.data.synthetic import make_synthetic_dataset
    from ugaitnet_tpu.eval.protocol import (EncodedSet, encode_set,
                                            eval_camera_pairs)
    from ugaitnet_tpu.train.trainer import Trainer

    # same template_seed, different seed: shared identities, every eval
    # subsequence an unseen draw
    train_ds = make_synthetic_dataset(num_subjects=num_subjects,
                                      videos_per_subject=3,
                                      subseqs_per_video=3, seed=seed,
                                      template_seed=7, name="syn_train")
    eval_ds = make_synthetic_dataset(num_subjects=num_subjects,
                                     videos_per_subject=3,
                                     subseqs_per_video=3, seed=seed + 1,
                                     template_seed=7, name="syn_eval")

    mcfg = ModelConfig(
        branches=(BranchConfig(kind="gaitset", modality="of",
                               gaitset_channels=(8, 8, 16), part_dim=16),
                  BranchConfig(kind="gaitset", modality="gray",
                               gaitset_channels=(8, 8, 16), part_dim=16)),
        merge="sign_max", nclasses=num_subjects)
    dcfg = DataConfig(batch_size=16, repetitions=4, expand_level=1,
                      augment=False)
    tcfg = TrainConfig(lr=3e-3, epochs=epochs, extra_epochs=0,
                       save_every_epochs=5, loss_weights=(1.0, 0.2),
                       optimizer="adam")

    t0 = time.time()
    trainer = Trainer(mcfg, dcfg, tcfg, experdir)
    state = trainer.fit(train_ds, val_perc=0.15, seed=seed)
    train_s = time.time() - t0

    ecfg = EvalConfig(typecode=3, batch_size=32, knn=1)
    t0 = time.time()
    enc = encode_set(trainer.model, state.params, eval_ds, ("of", "gray"),
                     ecfg)
    encode_s = time.time() - t0

    # probe: held-out subsequences seen from camera 0; gallery: the other
    # cameras — same open-set split shape as the CASIA-B protocol
    probe_sel = np.where(enc.cams == 0)[0]
    gal_sel = np.where(enc.cams != 0)[0]
    probe = EncodedSet(enc.codes[probe_sel], enc.labels[probe_sel],
                       enc.video_ids[probe_sel], enc.cams[probe_sel])
    gallery = EncodedSet(enc.codes[gal_sel], enc.labels[gal_sel],
                         enc.video_ids[gal_sel], enc.cams[gal_sel])
    res = eval_camera_pairs(gallery, probe, probe_camera=0, knn=1,
                            cameras=(0, 1, 2))
    return {
        "protocol": "eval_camera_pairs (probe cam 0, galleries cams 1,2)",
        "num_subjects": num_subjects,
        "train_subseqs": int(len(train_ds.labels)),
        "eval_subseqs": int(len(eval_ds.labels)),
        "probe_subseqs": int(len(probe_sel)),
        "rank1_subseq": res["rank1_subseq"],
        "rank1_video": res["rank1_video"],
        "chance_rank1": 1.0 / num_subjects,
        "train_seconds": round(train_s, 1),
        "encode_seconds": round(encode_s, 1),
    }


if __name__ == "__main__":
    # the artifact run uses the deterministic CPU mesh (same as the suite)
    os.environ.setdefault("XLA_FLAGS",
                          "--xla_force_host_platform_device_count=8")
    import jax
    jax.config.update("jax_platforms", "cpu")
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        out = run(os.path.join(d, "exp"))
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "results_synthetic_rank1.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
