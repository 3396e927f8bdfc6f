"""Eval stack: kNN parity, EER, protocols, end-to-end open-world smoke."""

import numpy as np
import jax
import pytest

from ugaitnet_tpu.core.config import (BranchConfig, DataConfig, EvalConfig,
                                      ModelConfig, TrainConfig)
from ugaitnet_tpu.data.sampler import BalancedGaitSampler
from ugaitnet_tpu.data.synthetic import make_synthetic_dataset
from ugaitnet_tpu.data.pipeline import GaitPipeline
from ugaitnet_tpu.eval.encode import encode_dataset
from ugaitnet_tpu.eval.protocol import (
    EncodedSet, encode_set, eval_all_combos, eval_camera_pairs, eval_openset,
    modality_combos)
from ugaitnet_tpu.eval.verification import verification_eer
from ugaitnet_tpu.models.network import UGaitNet
from ugaitnet_tpu.ops.knn import knn_predict
from ugaitnet_tpu.ops.metrics import eer_verif_dist, video_majority_vote
from ugaitnet_tpu.train.train_step import (
    Batch, init_state, make_optimizer, make_train_step)


def test_knn_matches_bruteforce_vote():
    rng = np.random.RandomState(0)
    gal = rng.randn(50, 8).astype(np.float32)
    labs = rng.randint(0, 5, 50)
    probes = rng.randn(20, 8).astype(np.float32)
    pred = knn_predict(probes, gal, labs, k=3)
    # brute force oracle (sklearn semantics: uniform vote, smallest class
    # wins ties via argmax over sorted classes)
    d = ((probes[:, None, :] - gal[None, :, :]) ** 2).sum(-1)
    for i in range(20):
        nn = np.argsort(d[i], kind="stable")[:3]
        votes = labs[nn]
        ulab, cnt = np.unique(votes, return_counts=True)
        assert pred[i] == ulab[np.argmax(cnt)]


def test_eer_separable_is_zero():
    gt = np.array([1, 1, 1, 0, 0, 0])
    dist = np.array([0.1, 0.2, 0.15, 0.9, 0.8, 0.95])
    eer, thr = eer_verif_dist(gt, dist)
    assert eer == 0.0
    assert 0.2 <= thr <= 0.8


def test_eer_reference_toy_example():
    # /root/reference/nets/mj_metrics.py:29-31 toy: one 0-labelled score
    # (0.07) sits inside the positive range -> fpr 0.25 at the crossing
    y = np.array([1, 1, 1, 1, 1, 0, 0, 0, 0])
    y_pred = np.array([0.01, 0.02, 0.015, 0.08, 0.05, 0.07, 0.2, 0.15, 0.18])
    eer, _ = eer_verif_dist(y, y_pred)
    assert abs(eer - 0.25) < 1e-9


def test_video_majority_vote():
    pred = np.array([1, 1, 2, 3, 3, 3])
    gt = np.array([1, 1, 1, 3, 3, 3])
    vids = np.array([0, 0, 0, 1, 1, 1])
    acc, vp, vg = video_majority_vote(pred, gt, vids)
    assert acc == 1.0
    np.testing.assert_array_equal(vp, [1, 3])


def test_modality_combos():
    c = modality_combos(2)
    assert len(c) == 3
    assert (1.0, 1.0) in c and (0.0, 1.0) in c


def test_verification_eer_random_codes_near_half():
    rng = np.random.RandomState(0)
    codes = rng.randn(200, 16)
    labels = rng.randint(0, 10, 200)
    out = verification_eer(codes, labels)
    assert 0.2 < out["eer"] < 0.8


def test_verification_eer_undefined_is_nan():
    """No positive pairs (every subject appears once) -> EER undefined:
    nan, not a fabricated worst-case 1.0."""
    rng = np.random.RandomState(0)
    codes = rng.randn(5, 8)
    out = verification_eer(codes, np.arange(5))
    assert np.isnan(out["eer"]) and np.isnan(out["eer_threshold"])
    assert out["chance"] == 0.0


@pytest.fixture(scope="module")
def trained():
    """Train a tiny 2-mod model on separable synthetic data."""
    ds = make_synthetic_dataset(num_subjects=6, videos_per_subject=4,
                                subseqs_per_video=3, num_cams=3, seed=3)
    mcfg = ModelConfig(
        branches=(BranchConfig(kind="gaitset", modality="of",
                               gaitset_channels=(8, 8, 16), part_dim=16),
                  BranchConfig(kind="gaitset", modality="gray",
                               gaitset_channels=(8, 8, 16), part_dim=16)),
        merge="sign_max", nclasses=6)
    tcfg = TrainConfig(lr=1e-3, loss_weights=(1.0, 0.1))
    model = UGaitNet(mcfg)
    tx = make_optimizer(tcfg)
    state = init_state(model, tx, jax.random.PRNGKey(0))
    step = make_train_step(model, tx, mcfg, tcfg)
    pipe = GaitPipeline(ds, DataConfig(batch_size=12, expand_level=2,
                                       augment=False),
                        ("of", "gray"), labmap=ds.label_map(), augment=False)
    sampler = BalancedGaitSampler(ds.labels, ds.gaits, batch_size=12,
                                  repetition=2, seed=0)
    for i in range(25):
        idx = sampler.next_batch()
        vols, flags, labels = pipe.load(idx, jax.random.PRNGKey(i))
        state, m = step(state, Batch(tuple(vols), tuple(flags), labels),
                        jax.random.PRNGKey(1000 + i))
    return ds, model, state, m


@pytest.mark.slow
def test_end_to_end_openworld(trained):
    ds, model, state, metrics = trained
    assert np.isfinite(float(metrics["loss"]))
    ecfg = EvalConfig(knn=3, typecode=3, batch_size=32)
    gallery = encode_set(model, state.params, ds, ("of", "gray"), ecfg)
    assert gallery.codes.shape == (len(ds), 62 * 16)

    # probe with the same set from a "different camera" protocol-wise
    for probe_cam in np.unique(ds.cams):
        sel = np.where(ds.cams == probe_cam)[0]
        probe = EncodedSet(gallery.codes[sel], gallery.labels[sel],
                           gallery.video_ids[sel], gallery.cams[sel])
        res = eval_camera_pairs(gallery, probe, probe_camera=int(probe_cam),
                                knn=3, cameras=np.unique(ds.cams).tolist())
        assert res["rank1_subseq"] > 0.5  # separable synthetic data
        assert res["rank1_video"] >= res["rank1_subseq"] - 0.2


@pytest.mark.slow
def test_openset_video_merged(trained):
    ds, model, state, _ = trained
    ecfg = EvalConfig(knn=3, typecode=3, batch_size=32)
    gallery = encode_set(model, state.params, ds, ("of", "gray"), ecfg)
    res = eval_openset(gallery, gallery, knn=1)
    assert res["rank1_subseq"] == 1.0  # self-match with k=1
    assert res["rank1_video_merged"] > 0.8


@pytest.mark.slow
def test_missing_modality_eval_combo(trained):
    ds, model, state, _ = trained
    ecfg = EvalConfig(knn=3, typecode=3, batch_size=32)
    res = eval_all_combos(model, state.params, ds, ds, ("of", "gray"), ecfg)
    assert set(res.keys()) == {"of", "gray", "of+gray"}
    # multimodal should not be (much) worse than either single modality
    assert res["of+gray"]["rank1_subseq"] >= 0.5


@pytest.mark.slow
def test_encode_mirror_doubles(trained):
    ds, model, state, _ = trained
    codes, labels, vids, cams = encode_dataset(
        model, state.params, ds, ("of", "gray"), typecode=3, batch_size=32,
        mirror=True)
    assert codes.shape[0] == 2 * len(ds)
    assert labels.shape[0] == 2 * len(ds)


@pytest.mark.slow
def test_gallery_cache_roundtrip(tmp_path, trained):
    ds, model, state, _ = trained
    ecfg = EvalConfig(batch_size=32)
    path = str(tmp_path / "gal.npz")
    g1 = encode_set(model, state.params, ds, ("of", "gray"), ecfg,
                    cache_path=path)
    g2 = encode_set(model, state.params, ds, ("of", "gray"), ecfg,
                    cache_path=path)
    np.testing.assert_array_equal(g1.codes, g2.codes)


def test_casenet_c_code_tap_eval():
    """Eval through the 'code' tap (typecode!=1,3) on a casenet-C model."""
    from ugaitnet_tpu.eval.encode import encode_dataset as enc
    ds = make_synthetic_dataset(num_subjects=3, videos_per_subject=2,
                                subseqs_per_video=2, seed=9)
    mcfg = ModelConfig(
        branches=(BranchConfig(kind="gaitset", modality="of",
                               gaitset_channels=(4, 4, 8), part_dim=8),
                  BranchConfig(kind="gaitset", modality="gray",
                               gaitset_channels=(4, 4, 8), part_dim=8)),
        merge="max", nclasses=3, extra_dense=(16,))
    model = UGaitNet(mcfg)
    from ugaitnet_tpu.models.network import init_params
    params = init_params(model, jax.random.PRNGKey(0))
    codes, labels, _, _ = enc(model, params, ds, ("of", "gray"), typecode=2,
                              batch_size=8)
    # code tap: (B, P, extra_dense) flattened
    assert codes.shape == (len(ds), 62 * 16)


@pytest.mark.slow
def test_encode_dataset_mesh_matches_single_device(trained):
    """Data-parallel gallery encoding over the 8-device mesh must match the
    single-device path. Not bit-exact: with l2_mode="reference" the
    signature L2 reduces over the (sharded) batch axis and GSPMD
    reassociates that reduction — measured maxerr ~1.5e-7 fp32. Exercises
    the trailing-partial-batch padding path (72 samples, bs=16)."""
    from ugaitnet_tpu.parallel.sharding import make_mesh
    ds, model, state, _ = trained
    want = encode_dataset(model, state.params, ds, ("of", "gray"),
                          typecode=3, batch_size=16)
    mesh = make_mesh(8)
    got = encode_dataset(model, state.params, ds, ("of", "gray"),
                         typecode=3, batch_size=16, mesh=mesh)
    np.testing.assert_allclose(got[0], want[0], atol=1e-5)
    for a, b in zip(got[1:], want[1:]):   # labels/vids/cams exact
        np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_encode_dataset_mesh_rejects_indivisible_batch(trained):
    from ugaitnet_tpu.parallel.sharding import make_mesh
    ds, model, state, _ = trained
    with pytest.raises(ValueError, match="not divisible"):
        encode_dataset(model, state.params, ds, ("of", "gray"),
                       typecode=3, batch_size=12, mesh=make_mesh(8))


def test_knn_sharded_gallery_matches_single_device():
    from ugaitnet_tpu.ops.knn import knn_predict_sharded
    from ugaitnet_tpu.parallel.sharding import make_mesh
    rng = np.random.RandomState(1)
    gal = rng.randn(101, 16).astype(np.float32)   # odd size -> padding path
    labs = rng.randint(10, 60, 101)
    probes = rng.randn(17, 16).astype(np.float32)
    want = knn_predict(probes, gal, labs, k=3)
    mesh = make_mesh(8)
    got = knn_predict_sharded(probes, gal, labs, mesh, k=3)
    np.testing.assert_array_equal(got, want)


@pytest.mark.slow
def test_encode_tail_batch_padding_is_exact(trained):
    """The padded trailing batch must produce the same codes as encoding
    those samples alone: padded rows carry use_flags==0, so under the
    default l2_mode="reference" batch-axis signature L2 they contribute
    nothing to the column norms (duplicate-row padding skewed every real
    tail code — round-3 review finding)."""
    ds, model, state, _ = trained
    assert model.config.l2_mode == "reference"
    n = len(ds)
    bs = 8
    tail = n % bs if n % bs else 3   # force a partial tail via indices
    nn_ = n if n % bs else n - (bs - 3)
    idx = np.arange(nn_)
    codes, _, _, _ = encode_dataset(model, state.params, ds,
                                    ("of", "gray"), batch_size=bs,
                                    indices=idx)
    # ground truth: the tail samples encoded alone at their true size
    tail_idx = idx[nn_ - tail:]
    want, _, _, _ = encode_dataset(model, state.params, ds,
                                   ("of", "gray"), batch_size=tail,
                                   indices=tail_idx)
    np.testing.assert_allclose(codes[nn_ - tail:], want, rtol=0, atol=0)


def test_verification_eer_tiny_split_uses_available_negatives():
    """2 classes x 2 samples: the complement (2) is smaller than the
    default negs_per_label (3); the old >= gate built ZERO negative
    pairs and reported nan for a perfectly defined EER."""
    codes = np.array([[0.0, 0], [0.1, 0], [5.0, 5], [5.1, 5]], np.float32)
    out = verification_eer(codes, np.array([0, 0, 1, 1]))
    assert np.isfinite(out["eer"])
    assert out["eer"] == 0.0          # separable clusters
    assert 0.0 < out["chance"] < 1.0  # both pair kinds present


def test_merge_codes_per_video_matches_reference_loop():
    """Vectorized reduceat merge == the per-video mask loop, mean and
    max pooling, including majority-vote labels."""
    from ugaitnet_tpu.eval.protocol import _merge_codes_per_video
    rng = np.random.RandomState(0)
    n = 57
    es = EncodedSet(codes=rng.randn(n, 5).astype(np.float32),
                    labels=rng.randint(0, 4, n),
                    video_ids=rng.randint(100, 112, n),
                    cams=np.zeros(n, np.int32))
    for use_avg in (True, False):
        codes, labels = _merge_codes_per_video(es, use_avg)
        uvids = np.unique(es.video_ids)
        assert codes.shape == (len(uvids), 5)
        # int count division must not promote the merged gallery to f64
        # (2x memory on the 7x --allcombos stack, f64 kNN distances)
        assert codes.dtype == np.float32
        for i, v in enumerate(uvids):
            sel = es.video_ids == v
            c = es.codes[sel]
            want = c.mean(axis=0) if use_avg else c.max(axis=0)
            # reduceat sums sequentially, np.mean pairwise: order-of-
            # summation noise at f32 — tolerance, not exactness
            np.testing.assert_allclose(codes[i], want, rtol=1e-5,
                                       atol=1e-6)
            labs, cnt = np.unique(es.labels[sel], return_counts=True)
            assert labels[i] == labs[np.argmax(cnt)]


@pytest.mark.slow
def test_all_combos_memo_rekeys_on_config_change(trained):
    """A gallery memo built under use_avg=True must NOT be served to a
    use_avg=False call (mean- vs max-pooled merged codes)."""
    ds, model, state, _ = trained
    cfg = EvalConfig(knn=1, batch_size=12)
    memo = {}
    eval_all_combos(model, state.params, ds, ds, ("of", "gray"), cfg,
                    use_avg=True, gallery_memo=memo)
    k1 = memo["key"]
    merged1 = memo["merged"][0].copy()
    eval_all_combos(model, state.params, ds, ds, ("of", "gray"), cfg,
                    use_avg=False, gallery_memo=memo)
    assert memo["key"] != k1
    assert not np.allclose(memo["merged"][0], merged1)


@pytest.mark.slow
def test_encode_dataset_empty_selection_raises(trained):
    ds, model, state, _ = trained
    with pytest.raises(ValueError, match="no samples"):
        encode_dataset(model, state.params, ds, ("of", "gray"),
                       indices=np.array([], np.int64))
