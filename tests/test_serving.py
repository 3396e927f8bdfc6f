"""Serving: device-resident gallery identification end-to-end."""

import numpy as np
import jax
import pytest

from ugaitnet_tpu.core.config import BranchConfig, ModelConfig
from ugaitnet_tpu.data.synthetic import make_synthetic_dataset
from ugaitnet_tpu.eval.serving import SignatureService
from ugaitnet_tpu.models.network import UGaitNet, init_params


@pytest.fixture(scope="module")
def service():
    ds = make_synthetic_dataset(num_subjects=5, videos_per_subject=2,
                                subseqs_per_video=3, seed=7)
    mcfg = ModelConfig(
        branches=(BranchConfig(kind="gaitset", modality="of",
                               gaitset_channels=(4, 4, 8), part_dim=8),
                  BranchConfig(kind="gaitset", modality="gray",
                               gaitset_channels=(4, 4, 8), part_dim=8)),
        merge="sign_max", nclasses=0)
    model = UGaitNet(mcfg)
    params = init_params(model, jax.random.PRNGKey(0))
    svc = SignatureService(model, params, ("of", "gray"), knn=3,
                           buckets=(4, 16))
    svc.build_gallery(ds, batch_size=16)
    return ds, svc


def test_identify_self_queries(service):
    ds, svc = service
    # querying gallery members must return their own labels (untrained net,
    # nearest neighbor = the identical sample at distance ~0)
    raw = {"raw_of": ds.modalities["of"].volumes[:6],
           "raw_gray": ds.modalities["gray"].volumes[:6]}
    labels, dists = svc.identify_raw(raw)
    np.testing.assert_array_equal(labels, ds.labels[:6])
    assert dists.shape == (6, 3)
    assert np.all(dists[:, 0] < dists[:, 2] + 1e-5)


def test_bucket_padding_consistency(service):
    ds, svc = service
    raw1 = {"raw_of": ds.modalities["of"].volumes[:1],
            "raw_gray": ds.modalities["gray"].volumes[:1]}
    raw3 = {"raw_of": ds.modalities["of"].volumes[:3],
            "raw_gray": ds.modalities["gray"].volumes[:3]}
    l1, d1 = svc.identify_raw(raw1)
    l3, d3 = svc.identify_raw(raw3)
    assert l1[0] == l3[0]
    np.testing.assert_allclose(d1[0], d3[0], rtol=1e-5)


def test_missing_modality_query(service):
    ds, svc = service
    raw = {"raw_of": np.zeros_like(ds.modalities["of"].volumes[:2]),
           "present_of": np.zeros(2, np.float32),
           "raw_gray": ds.modalities["gray"].volumes[:2]}
    labels, dists = svc.identify_raw(raw)
    assert labels.shape == (2,)
    assert np.isfinite(dists).all()


def test_warmup_precompiles_buckets(service):
    ds, svc = service
    svc.warmup()  # must not raise; compiles both buckets
    raw = {"raw_of": ds.modalities["of"].volumes[:2],
           "raw_gray": ds.modalities["gray"].volumes[:2]}
    labels, _ = svc.identify_raw(raw)
    assert labels.shape == (2,)


def test_exported_encoder_roundtrip(service, tmp_path):
    """jax.export deployment artifact: serialize the raw->codes encoder
    (params baked in), reload WITHOUT the service/model, and require
    bit-identical codes, including bucket padding and a present-flag."""
    ds, svc = service
    from ugaitnet_tpu.eval.export import ExportedEncoder, export_encoder

    out = str(tmp_path / "artifact")
    sizes = export_encoder(svc, out, buckets=(4,))
    assert sizes[4] > 0

    enc = ExportedEncoder(out)
    raw = {"raw_of": np.asarray(ds.modalities["of"].volumes[:3]),
           "raw_gray": np.asarray(ds.modalities["gray"].volumes[:3])}
    got = enc.encode(raw)

    import jax.numpy as jnp
    feed = {"raw_of": jnp.asarray(raw["raw_of"]),
            "raw_gray": jnp.asarray(raw["raw_gray"]),
            "present_of": jnp.ones(3, jnp.float32),
            "present_gray": jnp.ones(3, jnp.float32),
            "labels": jnp.zeros(3, jnp.int32)}
    # pad to the bucket like the artifact does
    feed4 = {k: (jnp.concatenate([v, v[-1:]]) if k.startswith("raw_")
                 else jnp.concatenate([v, jnp.zeros_like(v[-1:])]))
             for k, v in feed.items()}
    want = np.asarray(svc._encode_raw(svc.params, feed4))[:3]
    # the deserialized StableHLO recompiles independently; fp reassociation
    # gives ~1e-7 noise
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    # a disabled modality flows through the artifact too
    raw0 = dict(raw, present_of=np.zeros(3, np.float32))
    got0 = enc.encode(raw0)
    assert not np.allclose(got0, got)


def test_exported_encoder_platform_guard(service, tmp_path):
    import json
    import os

    import pytest

    from ugaitnet_tpu.eval.export import ExportedEncoder, export_encoder
    out = str(tmp_path / "artifact")
    export_encoder(service[1], out, buckets=(4,))
    meta = json.load(open(os.path.join(out, "meta.json")))
    meta["platform"] = "tpu-v9"
    json.dump(meta, open(os.path.join(out, "meta.json"), "w"))
    with pytest.raises(RuntimeError, match="exported for platform"):
        ExportedEncoder(out)


def test_oversize_query_chunks_through_max_bucket(service):
    """n > max(buckets) must chunk through the warmed largest bucket, not
    jit a fresh padded shape per oversize n (the 'steady-state serving
    never recompiles' contract; round-3 review finding)."""
    ds, svc = service
    n = 19   # buckets are (4, 16): forces 16 + 3->4 chunks
    raw = {"raw_of": ds.modalities["of"].volumes[:n],
           "raw_gray": ds.modalities["gray"].volumes[:n],
           "present_of": np.ones(n, np.float32),
           "present_gray": np.ones(n, np.float32)}
    labels, dists = svc.identify_raw(raw)
    assert labels.shape == (n,) and dists.shape == (n, 3)
    np.testing.assert_array_equal(labels, ds.labels[:n])
    # codes are per-sample (serving forces l2_mode="feature"), so the
    # chunked answers must equal per-row single queries
    one = {k: np.asarray(v)[16:17] for k, v in raw.items()}
    l_one, d_one = svc.identify_raw(one)
    assert l_one[0] == labels[16]
    np.testing.assert_allclose(d_one[0], dists[16], rtol=1e-5)


def test_norm_stats_serving_matches_eval_encode():
    """A --normstats model must be served with the same standardization:
    the service's baked-in stats produce codes identical to the eval
    path's (GaitPipeline norm_stats), and different from an un-normalized
    service (the silent-degradation failure this guards against)."""
    from ugaitnet_tpu.eval.encode import encode_dataset
    ds = make_synthetic_dataset(num_subjects=3, videos_per_subject=2,
                                subseqs_per_video=2, seed=11)
    mcfg = ModelConfig(
        branches=(BranchConfig(kind="gaitset", modality="of",
                               gaitset_channels=(4, 4, 8), part_dim=8),
                  BranchConfig(kind="gaitset", modality="gray",
                               gaitset_channels=(4, 4, 8), part_dim=8)),
        merge="sign_max", nclasses=0, l2_mode="feature")
    model = UGaitNet(mcfg)
    params = init_params(model, jax.random.PRNGKey(2))
    rng = np.random.RandomState(5)
    stats = {}
    for m in ("of", "gray"):
        tc = ds.modalities[m].volumes.shape[1]
        stats[m] = (0.1 * rng.randn(1, tc).astype(np.float32),
                    (1.0 + 0.5 * rng.rand(1, tc)).astype(np.float32))
    codes_eval, _, _, _ = encode_dataset(model, params, ds, ("of", "gray"),
                                         typecode=3, batch_size=8,
                                         norm_stats=stats)
    svc = SignatureService(model, params, ("of", "gray"), buckets=(8,),
                           norm_stats=stats)
    svc.build_gallery(ds, batch_size=8)
    # _host_codes holds the un-padded install codes (the device buffer is
    # capacity-padded for incremental enrollment)
    np.testing.assert_allclose(svc._host_codes, codes_eval,
                               rtol=2e-5, atol=1e-6)
    svc0 = SignatureService(model, params, ("of", "gray"), buckets=(8,))
    svc0.build_gallery(ds, batch_size=8)
    assert not np.allclose(svc0._host_codes, codes_eval, atol=1e-4)


def test_norm_stats_missing_modality_rejected():
    mcfg = ModelConfig(
        branches=(BranchConfig(kind="gaitset", modality="of",
                               gaitset_channels=(4, 4, 8), part_dim=8),
                  BranchConfig(kind="gaitset", modality="gray",
                               gaitset_channels=(4, 4, 8), part_dim=8)),
        merge="sign_max", nclasses=0)
    model = UGaitNet(mcfg)
    params = init_params(model, jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="missing modalities"):
        SignatureService(model, params, ("of", "gray"),
                         norm_stats={"of": (np.zeros(2), np.ones(2))})


def test_multi_source_norm_stats_end_to_end(tmp_path):
    """BothDatasets serving: each gallery sample is standardized with ITS
    dataset's stats row (not row 0), exported artifacts take a per-sample
    'source' input, and multi-source queries without one fail loudly."""
    from ugaitnet_tpu.eval.encode import encode_dataset
    from ugaitnet_tpu.eval.export import ExportedEncoder, export_encoder

    ds = make_synthetic_dataset(num_subjects=4, videos_per_subject=2,
                                subseqs_per_video=2, seed=13)
    # alternate samples between two "datasets" with very different stats
    ds.dataset_source = (np.arange(len(ds)) % 2).astype(np.int32)
    mcfg = ModelConfig(
        branches=(BranchConfig(kind="gaitset", modality="of",
                               gaitset_channels=(4, 4, 8), part_dim=8),
                  BranchConfig(kind="gaitset", modality="gray",
                               gaitset_channels=(4, 4, 8), part_dim=8)),
        merge="sign_max", nclasses=0, l2_mode="feature")
    model = UGaitNet(mcfg)
    params = init_params(model, jax.random.PRNGKey(3))
    rng = np.random.RandomState(9)
    stats = {}
    for m in ("of", "gray"):
        tc = ds.modalities[m].volumes.shape[1]
        stats[m] = (
            np.stack([0.1 * rng.randn(tc), 2.0 + rng.randn(tc)]
                     ).astype(np.float32),
            np.stack([1.0 + 0.5 * rng.rand(tc), 3.0 + rng.rand(tc)]
                     ).astype(np.float32))

    codes_eval, _, _, _ = encode_dataset(model, params, ds, ("of", "gray"),
                                         typecode=3, batch_size=8,
                                         norm_stats=stats)
    svc = SignatureService(model, params, ("of", "gray"), buckets=(8,),
                           norm_stats=stats)
    assert svc.norm_sources == 2
    svc.build_gallery(ds, batch_size=8)
    # pre-fix, build_gallery standardized every sample with row 0 and the
    # source=1 half of the gallery silently diverged from the eval path
    np.testing.assert_allclose(svc._host_codes, codes_eval,
                               rtol=2e-5, atol=1e-6)

    # multi-source queries must declare their dataset
    raw = {"raw_of": ds.modalities["of"].volumes[:2],
           "raw_gray": ds.modalities["gray"].volumes[:2]}
    with pytest.raises(ValueError, match="source"):
        svc.identify_raw(raw)
    raw["source"] = ds.dataset_source[:2]
    labels, _ = svc.identify_raw(raw)
    np.testing.assert_array_equal(labels, ds.labels[:2])

    # exported artifact: carries the source input and reproduces the
    # service's codes for mixed-source feeds
    out = str(tmp_path / "artifact")
    export_encoder(svc, out, buckets=(8,))
    enc = ExportedEncoder(out)
    assert enc.meta["has_source"] and enc.meta["norm_sources"] == 2
    feed = {"raw_of": np.asarray(ds.modalities["of"].volumes[:8]),
            "raw_gray": np.asarray(ds.modalities["gray"].volumes[:8]),
            "source": ds.dataset_source[:8]}
    got = enc.encode(feed)
    np.testing.assert_allclose(got, codes_eval[:8], rtol=2e-5, atol=1e-6)
    with pytest.raises(ValueError, match="source"):
        enc.encode({k: v for k, v in feed.items() if k != "source"})


@pytest.mark.parametrize("dtype", ["float32", "int8"])
def test_enroll_remove_no_recompile(service, dtype):
    """Production enrollment contract: enroll()/remove() within capacity
    change NO traced shape or static argument, so the jitted _identify
    never recompiles (capacity-padded gallery + class capacity + the
    distance-bias tombstone vector); results match a freshly built
    service over the same rows (sorted-unique dense ids, per-row int8
    quantization is append-independent)."""
    ds, base = service
    model, params = base.model, base.params
    svc = SignatureService(model, params, ("of", "gray"), knn=3,
                           buckets=(4, 16), gallery_dtype=dtype)
    codes = svc.encode_raw({"raw_of": ds.modalities["of"].volumes,
                            "raw_gray": ds.modalities["gray"].volumes})
    svc.set_gallery(codes[:20], ds.labels[:20])  # capacity 32: headroom
    raw = {"raw_of": ds.modalities["of"].volumes[:6],
           "raw_gray": ds.modalities["gray"].volumes[:6]}
    np.testing.assert_array_equal(svc.identify_raw(raw)[0], ds.labels[:6])
    compiles = svc._identify._cache_size()

    # enroll two brand-new identities from raw volumes
    ds2 = make_synthetic_dataset(num_subjects=2, videos_per_subject=1,
                                 subseqs_per_video=3, seed=99)
    raw2 = {"raw_of": ds2.modalities["of"].volumes,
            "raw_gray": ds2.modalities["gray"].volumes}
    svc.enroll_raw(raw2, ds2.labels + 1000)
    np.testing.assert_array_equal(svc.identify_raw(raw2)[0],
                                  ds2.labels + 1000)
    np.testing.assert_array_equal(svc.identify_raw(raw)[0], ds.labels[:6])
    assert svc._identify._cache_size() == compiles, "enroll recompiled"

    # parity vs a service built fresh over the same rows
    fresh = SignatureService(model, params, ("of", "gray"), knn=3,
                             buckets=(4, 16), gallery_dtype=dtype)
    fresh.set_gallery(svc._host_codes, svc._host_labels)
    for r in (raw, raw2):
        la, da = svc.identify_raw(r)
        lb, db = fresh.identify_raw(r)
        np.testing.assert_array_equal(la, lb)
        np.testing.assert_allclose(da, db, rtol=1e-5, atol=1e-5)

    # remove tombstones via the bias vector only — no recompile, and the
    # removed identities can no longer be predicted
    assert svc.remove(np.unique(ds2.labels + 1000)) == len(ds2.labels)
    assert not np.isin(svc.identify_raw(raw2)[0], ds2.labels + 1000).any()
    np.testing.assert_array_equal(svc.identify_raw(raw)[0], ds.labels[:6])
    assert svc._identify._cache_size() == compiles, "remove recompiled"

    # growing past capacity rebuilds (compacting tombstones) and stays
    # correct; capacity rebuild may legitimately recompile
    svc.enroll(codes[20:], ds.labels[20:])
    assert svc._gallery_size == 30
    np.testing.assert_array_equal(svc.identify_raw(raw)[0], ds.labels[:6])


@pytest.mark.parametrize("dtype", ["float32", "int8"])
def test_identify_video_matches_eval_merged_protocol(service, dtype):
    """identify_video = the reference's merged-video-code protocol as a
    serving call: per-clip signatures merged (mean and max) into one video
    code, kNN over the gallery — labels must match knn_predict over
    _merge_codes_per_video exactly (f32), and int8 must agree on labels."""
    from ugaitnet_tpu.ops.knn import knn_predict

    ds, base = service
    svc = base
    if dtype == "int8":
        svc = SignatureService(base.model, base.params, ("of", "gray"),
                               knn=3, buckets=(4, 16), gallery_dtype=dtype)
        svc.build_gallery(ds, batch_size=16)
    for use_avg in (True, False):
        for start in (0, 6, 12):
            clips = {"raw_of": ds.modalities["of"].volumes[start:start + 3],
                     "raw_gray":
                         ds.modalities["gray"].volumes[start:start + 3]}
            codes = base.encode_raw(clips)
            merged = codes.mean(0) if use_avg else codes.max(0)
            oracle = knn_predict(merged[None], base._host_codes,
                                 base._host_labels, k=3)[0]
            label, dists = svc.identify_video(clips, use_avg=use_avg)
            assert label == oracle, (dtype, use_avg, start)
            assert dists.shape == (3,) and np.isfinite(dists).all()


def test_verify_pairs_with_eer_calibration(service):
    """1:1 verification serving: EER-calibrated threshold separates
    same-person from different-person clip pairs, and verify_raw's
    decisions agree with the calibration distances."""
    ds, svc = service
    # pairs: (clip_i, other clip of the same subject) and (clip_i, clip of
    # a different subject) — synthetic subjects have 6 clips each
    a_idx = np.arange(0, 24, 2)
    same_idx = a_idx // 6 * 6 + (a_idx % 6 + 1) % 6   # same subject block
    diff_idx = (a_idx + 6) % 24                        # next subject
    vol = {m: ds.modalities[m].volumes for m in ("of", "gray")}

    def raw(idx):
        return {"raw_of": vol["of"][idx], "raw_gray": vol["gray"][idx]}

    ca = svc.encode_raw(raw(a_idx))
    cb = np.concatenate([svc.encode_raw(raw(same_idx)),
                         svc.encode_raw(raw(diff_idx))])
    ca2 = np.concatenate([ca, ca])
    same = np.concatenate([np.ones(len(a_idx)), np.zeros(len(a_idx))])
    eer, thr = svc.calibrate_verification(ca2, cb, same)
    # synthetic identities are well separated: EER must be far below chance
    assert eer < 0.25 and np.isfinite(thr)
    d, dec = svc.verify_codes(ca2, cb, threshold=thr)
    assert dec.mean() > 0.3 and dec.mean() < 0.7  # both classes predicted
    # verify_raw end-to-end agrees with verify over pre-encoded codes
    d2, dec2 = svc.verify_raw(raw(a_idx), raw(same_idx), threshold=thr)
    np.testing.assert_allclose(d2, d[:len(a_idx)], rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(dec2, dec[:len(a_idx)])
    with pytest.raises(ValueError, match="paired"):
        svc.verify_codes(ca, cb)


@pytest.mark.slow
def test_mesh_enroll_parity(service):
    """Enrollment on the mesh-sharded gallery: device-side appends write
    into the row-sharded buffers and predictions stay label-identical to
    the single-device service."""
    from ugaitnet_tpu.parallel.sharding import make_mesh

    ds, base = service
    model, params = base.model, base.params
    codes = base.encode_raw({"raw_of": ds.modalities["of"].volumes,
                             "raw_gray": ds.modalities["gray"].volumes})
    raw = {"raw_of": ds.modalities["of"].volumes[:8],
           "raw_gray": ds.modalities["gray"].volumes[:8]}
    for dtype in ("float32", "int8"):
        sharded = SignatureService(model, params, ("of", "gray"), knn=3,
                                   buckets=(4, 16), gallery_dtype=dtype,
                                   mesh=make_mesh(8))
        sharded.set_gallery(codes[:20], ds.labels[:20])
        compiles = sharded._identify._cache_size()
        sharded.enroll(codes[20:], ds.labels[20:])
        assert sharded._identify._cache_size() == compiles, dtype
        single = SignatureService(model, params, ("of", "gray"), knn=3,
                                  buckets=(4, 16), gallery_dtype=dtype)
        single.set_gallery(codes, ds.labels)
        np.testing.assert_array_equal(sharded.identify_raw(raw)[0],
                                      single.identify_raw(raw)[0],
                                      err_msg=dtype)


@pytest.mark.slow
def test_mesh_sharded_gallery_parity(service):
    """Pod-scale serving (VERDICT r4 ask #2): the mesh-sharded gallery
    (rows over the data axis, probes replicated, GSPMD top-k merge) must
    predict the same labels and distances as the single-device service,
    for BOTH f32 and int8 galleries — including a gallery size that does
    not divide the mesh (pad sentinels must never reach a top-k)."""
    from ugaitnet_tpu.parallel.sharding import make_mesh

    ds, svc = service
    mesh = make_mesh(8)
    model, params = svc.model, svc.params

    raw = {"raw_of": ds.modalities["of"].volumes[:8],
           "raw_gray": ds.modalities["gray"].volumes[:8]}
    lab_ref, _ = svc.identify_raw(raw)
    assert svc._gallery_size == 30  # deliberately does NOT divide the mesh
    for dtype in ("float32", "int8"):
        single = svc
        if dtype == "int8":
            single = SignatureService(model, params, ("of", "gray"), knn=3,
                                      buckets=(4, 16), gallery_dtype=dtype)
            single.build_gallery(ds, batch_size=16)
        _, d_single = single.identify_raw(raw)
        sharded = SignatureService(model, params, ("of", "gray"), knn=3,
                                   buckets=(4, 16), gallery_dtype=dtype,
                                   mesh=mesh)
        sharded.build_gallery(ds, batch_size=16)
        # 30 gallery rows over 8 shards -> 2 pad sentinel rows
        assert sharded._gallery_dense.shape[0] % 8 == 0
        lab_s, d_s = sharded.identify_raw(raw)
        # labels: sharded == single-device == f32 reference
        np.testing.assert_array_equal(lab_s, lab_ref, err_msg=dtype)
        # distances: pinned against the SAME-dtype single-device service
        # (int8 carries its own ~0.3% cross-term resolution vs f32 — that
        # is quantization, not sharding; sharding itself only adds bf16
        # encode noise between the two jitted programs)
        np.testing.assert_allclose(d_s, d_single, atol=0.1, err_msg=dtype)


def test_knn_predict_sharded_int8_parity():
    """ops-level parity: knn_predict_sharded(int8) == knn_predict on an
    awkward (non-dividing) gallery size with near-tie-free geometry."""
    from ugaitnet_tpu.ops.knn import knn_predict, knn_predict_sharded
    from ugaitnet_tpu.parallel.sharding import make_mesh

    rng = np.random.RandomState(3)
    protos = rng.randn(13, 24).astype(np.float32)
    protos /= np.linalg.norm(protos, axis=1, keepdims=True)
    gal = np.repeat(protos, 5, 0) + rng.randn(65, 24).astype(np.float32) * .05
    glab = np.repeat(np.arange(13) * 7 + 2, 5)   # sparse label ids
    probes = np.repeat(protos, 2, 0) + \
        rng.randn(26, 24).astype(np.float32) * .05

    mesh = make_mesh(8)
    ref = knn_predict(probes, gal, glab, k=3)
    for dtype in ("float32", "int8"):
        got = knn_predict_sharded(probes, gal, glab, mesh, k=3,
                                  gallery_dtype=dtype)
        np.testing.assert_array_equal(got, ref, err_msg=dtype)
