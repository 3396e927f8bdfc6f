"""Full CLI acceptance test: every user-facing entry point chained the way
a user would — build a packed dataset, train, evaluate, export a serving
artifact, serve from it — all on the synthetic dataset, all through the
CLI mains (no library shortcuts).  The reference's equivalent "test" was
running its mains by hand (SURVEY.md §4)."""

import json
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def workflow(tmp_path_factory):
    root = tmp_path_factory.mktemp("wf")
    data = str(root / "packed")
    exper = str(root / "exp")

    from ugaitnet_tpu.cli.build_data import main as build_main
    build_main(["--synthetic", "--outdir", data])

    from ugaitnet_tpu.cli.train import main as train_main
    train_main(["--datadir", data, "--nclasses", "5",
                "--mod0", "of", "--mod1", "gray", "--mergefun", "sign_max",
                "--bs", "8", "--epochs", "2", "--savemodelfreq", "1",
                "--gschannels", "4,4,8", "--gspartdim", "8",
                "--experdir", exper, "--experfix", "wf"])
    runs = [d for d in os.listdir(exper)
            if os.path.isdir(os.path.join(exper, d))]
    assert len(runs) == 1
    return data, os.path.join(exper, runs[0])


@pytest.mark.slow
def test_train_wrote_config_and_checkpoint(workflow):
    _, experdir = workflow
    cfg = json.load(open(os.path.join(experdir, "config.json")))
    assert cfg["model"]["nclasses"] == 5
    from ugaitnet_tpu.core import checkpoint as ckpt
    assert ckpt.latest_checkpoint_step(experdir) is not None


@pytest.mark.slow
def test_evaluate_cli(workflow, capsys):
    data, experdir = workflow
    from ugaitnet_tpu.cli.evaluate import main as eval_main
    eval_main(["--experdir", experdir, "--gallery", data,
               "--probes", data, "--protocol", "openset", "--knn", "1",
               "--bs", "8"])
    out = capsys.readouterr().out
    assert "rank1" in out
    # self-retrieval: every probe is in the gallery at distance 0
    line = [l for l in out.splitlines() if "rank1_subseq" in l][-1]
    assert "1.0" in line
    # confusion matrices are persisted next to the results (reference
    # result-bundle parity, mj_testUWYHGaitNet_open_casiab.py:415-435)
    import glob
    conf = glob.glob(os.path.join(experdir, "confusions_*.npz"))
    assert conf, "no confusions_*.npz written by evaluate"
    z = np.load(conf[0])
    assert "subseq" in z and "labels" in z
    cm = z["subseq"]
    # perfect self-retrieval -> strictly diagonal confusion
    assert cm.sum() == cm.trace() and cm.sum() > 0


@pytest.mark.slow
def test_evaluate_cli_dp_mesh_matches(workflow, capsys):
    """--dp 8 shards the encode over the CPU mesh; the protocol results
    must match the single-device run (codes agree to ~1e-7, and the kNN
    decisions — discrete — exactly)."""
    data, experdir = workflow
    from ugaitnet_tpu.cli.evaluate import main as eval_main
    args = ["--experdir", experdir, "--gallery", data,
            "--probes", data, "--protocol", "openset", "--knn", "1",
            "--bs", "8"]
    eval_main(args)
    single = capsys.readouterr().out
    # wipe the code caches so --dp actually re-encodes
    import glob
    for f in glob.glob(os.path.join(experdir, "codes_*.npz")):
        os.remove(f)
    eval_main(args + ["--dp", "8"])
    sharded = capsys.readouterr().out
    pick = lambda s: [l for l in s.splitlines() if "rank1" in l]  # noqa: E731
    assert pick(sharded) == pick(single)


@pytest.mark.slow
def test_export_and_serve_from_artifact(workflow, tmp_path):
    data, experdir = workflow
    from ugaitnet_tpu.cli.export_model import main as export_main
    art = str(tmp_path / "artifact")
    export_main(["--experdir", experdir, "--out", art, "--buckets", "4"])

    from ugaitnet_tpu.data.schema import GaitDataset
    from ugaitnet_tpu.eval.export import ExportedEncoder
    ds = GaitDataset.load(data)
    enc = ExportedEncoder(art)
    raw = {"raw_of": np.asarray(ds.modalities["of"].volumes[:3]),
           "raw_gray": np.asarray(ds.modalities["gray"].volumes[:3])}
    codes = enc.encode(raw)
    assert codes.shape[0] == 3 and np.all(np.isfinite(codes))
    # same clip -> same code; different clip -> different code
    assert not np.allclose(codes[0], codes[1])
    # empty query answers (0, D) instead of failing inside the executable
    empty = {k: v[:0] for k, v in raw.items()}
    assert enc.encode(empty).shape == (0, codes.shape[1])
    # warmup path: runs every bucket once, idempotent
    enc2 = ExportedEncoder(art, warmup=True)
    assert np.allclose(enc2.encode(raw), codes)


def test_build_data_merge_cli(tmp_path):
    """--merge aligns per-modality --import-ref-style packed dirs into one
    multimodal dataset (the two-step migration path in MIGRATION.md §1)."""
    from ugaitnet_tpu.cli.build_data import main as build_main
    from ugaitnet_tpu.data.schema import GaitDataset
    from ugaitnet_tpu.data.synthetic import make_synthetic_dataset

    dirs = []
    for mod in ("of", "gray"):
        ds = make_synthetic_dataset(num_subjects=2, videos_per_subject=1,
                                    subseqs_per_video=2, modalities=(mod,))
        d = str(tmp_path / mod)
        ds.save(d)
        dirs.append(d)
    out = str(tmp_path / "joint")
    build_main(["--merge", *dirs, "--outdir", out])

    merged = GaitDataset.load(out)
    assert set(merged.modality_names) == {"of", "gray"}
    assert len(merged) == 4
    # misaligned inputs must fail loudly, not pair wrong samples
    small = make_synthetic_dataset(num_subjects=1, videos_per_subject=1,
                                   subseqs_per_video=2, modalities=("gray",))
    d_bad = str(tmp_path / "bad")
    small.save(d_bad)
    with pytest.raises(ValueError, match="not aligned"):
        build_main(["--merge", dirs[0], d_bad,
                    "--outdir", str(tmp_path / "x")])
