"""import_reference_dir against a miniature reference-layout h5 tree.

The reference emits one h5 per sample via deepdish
(/root/reference/data/generateOFData.py:136-149): keys data (60,60,T*C
channel-last, int16 for OF), label (uint16), videoId (uint16), gait
(uint8), cam (int), compressFactor (uint8, 100 for OF).  This is the ONLY
bridge from the reference's on-disk format into this framework, so the
day-one real-data path (CASIA-B / TUM import -> pipeline -> encode) is
exercised here end to end on synthetic files written in exactly that
layout — including the empty-file filter, the channel-last transpose, and
the compressFactor-mismatch guard.
"""

import os

import h5py
import jax
import numpy as np
import pytest

from ugaitnet_tpu.data.convert import import_reference_dir


def _write_ref_sample(path, data, label, video_id, gait, cam, cf=100):
    """Write one per-sample file in the deepdish-on-pytables layout the
    reference produces: every dict key a root-level dataset, scalars as
    0-d datasets (generateOFData.py:137-149)."""
    with h5py.File(path, "w") as f:
        f["data"] = data
        f["label"] = np.uint16(label)
        f["videoId"] = np.uint16(video_id)
        f["gait"] = np.uint8(gait)
        f["cam"] = int(cam)
        f["compressFactor"] = np.uint8(cf)
        f["frames"] = np.arange(25, dtype=np.uint16)   # present, unused


def _make_tree(tmp_path, n=6, cf=100):
    rng = np.random.RandomState(0)
    d = str(tmp_path / "of_ref")
    os.makedirs(d, exist_ok=True)
    truth = []
    for i in range(n):
        data = rng.randint(-3000, 3000, (60, 60, 50)).astype(np.int16)
        label, vid, gait, cam = 300 + i // 2, 10 + i, i % 3, 90
        _write_ref_sample(os.path.join(d, f"{i:03d}-nm-{i:02d}.h5"),
                          data, label, vid, gait, cam, cf)
        truth.append((data, label, vid, gait, cam))
    return d, truth


def test_import_transposes_and_filters(tmp_path):
    d, truth = _make_tree(tmp_path)
    # an empty file (the reference's pre-filter drops zero-size samples,
    # mj_dataGeneratorMMUWYHsingle.py:111-131) ...
    with h5py.File(os.path.join(d, "zzz-empty.h5"), "w") as f:
        f["data"] = np.zeros((0,), np.int16)
        f["compressFactor"] = np.uint8(100)
    # ... and a file that is not valid hdf5 at all
    with open(os.path.join(d, "zz-corrupt.h5"), "wb") as f:
        f.write(b"not an hdf5 file")

    ds = import_reference_dir(d, "of", name="mini")
    assert len(ds) == len(truth)
    st = ds.modalities["of"]
    assert st.volumes.dtype == np.int16
    assert st.volumes.shape == (len(truth), 50, 60, 60)
    assert st.compress_factor == 100.0
    for i, (data, label, vid, gait, cam) in enumerate(truth):
        # (60,60,TC) channel-last -> (TC,60,60) planes
        np.testing.assert_array_equal(st.volumes[i],
                                      np.moveaxis(data, 2, 0))
        assert ds.labels[i] == label
        assert ds.video_ids[i] == vid
        assert ds.gaits[i] == gait
        assert ds.cams[i] == cam


def test_import_compress_factor_guard(tmp_path):
    d, _ = _make_tree(tmp_path, n=2)
    bad = np.random.RandomState(1).randint(0, 255, (60, 60, 25)
                                           ).astype(np.uint8)
    _write_ref_sample(os.path.join(d, "x-badcf.h5"), bad, 1, 1, 0, 90,
                      cf=1)
    with pytest.raises(ValueError, match="compressFactor"):
        import_reference_dir(d, "of")


def test_migration_import_merge_train_evaluate(tmp_path):
    """The MIGRATION.md §1+§3 chain end to end through the CLIs: two
    reference-layout per-sample h5 trees (of int16 cf=100, gray uint8
    cf=1) -> `build_data --import-ref` per modality -> `--merge` into one
    multimodal store -> `cli.train` one epoch -> `cli.evaluate` openset
    self-retrieval.  This is exactly what a reference user runs on day one
    with real CASIA-B/TUM data."""
    from ugaitnet_tpu.cli.build_data import main as build_main

    rng = np.random.RandomState(7)
    trees = {"of": str(tmp_path / "ref_of"),
             "gray": str(tmp_path / "ref_gray")}
    for d in trees.values():
        os.makedirs(d)
    # 4 subjects x 2 videos x 2 windows, sample-aligned across modalities
    vid = 0
    for s in range(4):
        for v in range(2):
            vid += 1
            for w in range(2):
                stem = f"{400 + s:03d}-nm-{vid:02d}-{w:02d}.h5"
                _write_ref_sample(
                    os.path.join(trees["of"], stem),
                    rng.randint(-3000, 3000, (60, 60, 50)).astype(np.int16),
                    400 + s, vid, 0, 90, cf=100)
                _write_ref_sample(
                    os.path.join(trees["gray"], stem),
                    rng.randint(0, 255, (60, 60, 25)).astype(np.uint8),
                    400 + s, vid, 0, 90, cf=1)

    packed = {m: str(tmp_path / f"packed_{m}") for m in trees}
    for m, d in trees.items():
        build_main(["--import-ref", d, "--modality", m,
                    "--outdir", packed[m]])
    joint = str(tmp_path / "joint")
    build_main(["--merge", packed["of"], packed["gray"],
                "--outdir", joint])

    from ugaitnet_tpu.cli.train import main as train_main
    exper = str(tmp_path / "exp")
    train_main(["--datadir", joint, "--nclasses", "4",
                "--mod0", "of", "--mod1", "gray", "--mergefun", "sign_max",
                "--bs", "8", "--epochs", "1", "--savemodelfreq", "1",
                "--repetitions", "2", "--expandlevel", "2",
                "--gschannels", "4,4,8", "--gspartdim", "8",
                "--experdir", exper, "--experfix", "mig"])
    runs = os.listdir(exper)
    assert len(runs) == 1
    experdir = os.path.join(exper, runs[0])

    from ugaitnet_tpu.cli.evaluate import main as eval_main
    import io
    from contextlib import redirect_stdout
    buf = io.StringIO()
    with redirect_stdout(buf):
        eval_main(["--experdir", experdir, "--gallery", joint,
                   "--probes", joint, "--protocol", "openset",
                   "--knn", "1", "--bs", "8"])
    out = buf.getvalue()
    line = [l for l in out.splitlines() if "rank1_subseq" in l][-1]
    assert "1.0" in line   # self-retrieval: probe == gallery


def test_import_then_pipeline_then_encode(tmp_path):
    """The full day-one path: reference files -> import -> GaitPipeline
    preprocess -> model encode."""
    from ugaitnet_tpu.core.config import (BranchConfig, DataConfig,
                                          ModelConfig)
    from ugaitnet_tpu.data.pipeline import GaitPipeline
    from ugaitnet_tpu.eval.encode import encode_dataset
    from ugaitnet_tpu.models.network import UGaitNet, init_params

    d, _ = _make_tree(tmp_path, n=4)
    ds = import_reference_dir(d, "of")
    pipe = GaitPipeline(ds, DataConfig(augment=False), ("of",))
    vols, flags, labels = pipe.load(np.arange(4), jax.random.PRNGKey(0),
                                    expand=1)
    assert vols[0].shape == (4, 25, 60, 60, 2)
    assert np.all(np.isfinite(np.asarray(vols[0])))

    mcfg = ModelConfig(
        branches=(BranchConfig(kind="gaitset", modality="of",
                               gaitset_channels=(4, 4, 8), part_dim=8),),
        merge="max", nclasses=0)
    model = UGaitNet(mcfg)
    params = init_params(model, jax.random.PRNGKey(0))
    codes, labels, vids, cams = encode_dataset(model, params, ds, ("of",),
                                               batch_size=4)
    assert codes.shape == (4, 62 * 8)
    assert np.all(np.isfinite(codes))
    np.testing.assert_array_equal(cams, ds.cams)
