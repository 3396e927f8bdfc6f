"""int8 gallery distances: parity with the fp32 kNN path.

The pod-scale serving lane int8 was re-aimed at (VERDICT r3 #10): the
identify distance matmul is gallery-bandwidth-bound at large G, where
int8 quarters the bytes and doubles the MXU rate (the conv encode lane
stays bf16 — measured slower in rounds 1+2, CLAUDE.md).  These tests pin
numerical behavior; benchmarks/proto_int8_gallery.py measures the speed.
"""

import numpy as np
import jax.numpy as jnp

from ugaitnet_tpu.ops.knn import (pairwise_l2, pairwise_l2_int8,
                                  quantize_gallery)


def _clustered_codes(n, d, c, rng, spread=0.05):
    centers = rng.randn(c, d).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    lab = rng.randint(0, c, n)
    codes = centers[lab] + spread * rng.randn(n, d).astype(np.float32)
    codes /= np.linalg.norm(codes, axis=1, keepdims=True)
    return codes.astype(np.float32), lab


def test_int8_distance_close_and_top1_parity():
    rng = np.random.RandomState(0)
    gal, glab = _clustered_codes(512, 128, 16, rng)
    probes, _ = _clustered_codes(64, 128, 16, rng)

    q, scale, g2 = quantize_gallery(gal)
    d2_ref = np.asarray(pairwise_l2(jnp.asarray(probes), jnp.asarray(gal)))
    d2_i8 = np.asarray(pairwise_l2_int8(
        jnp.asarray(probes), jnp.asarray(q), jnp.asarray(scale),
        jnp.asarray(g2)))
    # normalized codes: distances in [0, 4]; int8 cross-term error ~1e-2
    assert np.max(np.abs(d2_ref - d2_i8)) < 5e-2
    # nearest neighbor: identical unless the f32 top-2 are tied within the
    # int8 error bound (same-cluster rows can be ~equidistant; which of a
    # near-tie wins is not a contract int8 can honor)
    i_ref, i_i8 = np.argmin(d2_ref, 1), np.argmin(d2_i8, 1)
    rows = np.arange(len(i_ref))
    gap = d2_ref[rows, i_i8] - d2_ref[rows, i_ref]
    assert np.all((i_ref == i_i8) | (gap < 1e-2))
    # the predicted LABEL matches wherever the f32 decision itself is not
    # a sub-int8-resolution coin flip (gap below the measured cross-term
    # error, ~7e-3 on unit codes, means f32 itself would flip under any
    # epsilon perturbation — not a contract int8 can honor); at most one
    # probe of this fixed draw sits on such a boundary
    assert np.sum(glab[i_ref] != glab[i_i8]) <= 1


def test_quantize_roundtrip_properties():
    rng = np.random.RandomState(1)
    codes = rng.randn(100, 32).astype(np.float32)
    q, scale, g2 = quantize_gallery(codes)
    assert q.dtype == np.int8
    assert scale.shape == (100,)
    assert np.max(np.abs(q)) <= 127
    np.testing.assert_allclose(g2, np.sum(codes ** 2, 1), rtol=1e-6)
    np.testing.assert_allclose(q.astype(np.float32) * scale[:, None], codes,
                               atol=np.max(scale) * 0.5 + 1e-7)


def test_quantize_outlier_row_isolated():
    """Per-row scales (ADVICE r4): one 1000x-norm gallery row must not
    degrade the int8 resolution of the other rows, and one huge-norm probe
    must not degrade the other probes in the bucket."""
    rng = np.random.RandomState(2)
    gal = rng.randn(64, 32).astype(np.float32)
    gal /= np.linalg.norm(gal, axis=1, keepdims=True)
    gal[0] *= 1000.0  # outlier row
    q, scale, g2 = quantize_gallery(gal)
    # non-outlier rows keep full int8 range despite the outlier
    assert np.max(np.abs(q[1:])) == 127
    probes = rng.randn(8, 32).astype(np.float32)
    probes /= np.linalg.norm(probes, axis=1, keepdims=True)
    probes[0] *= 1000.0  # outlier probe
    d2_ref = np.asarray(pairwise_l2(jnp.asarray(probes), jnp.asarray(gal)))
    d2_i8 = np.asarray(pairwise_l2_int8(
        jnp.asarray(probes), jnp.asarray(q), jnp.asarray(scale),
        jnp.asarray(g2)))
    # unit-norm probes x unit-norm gallery rows: errors stay at int8
    # resolution even with the outliers present
    sub = d2_i8[1:, 1:] - d2_ref[1:, 1:]
    assert np.max(np.abs(sub)) < 5e-2
    np.testing.assert_array_equal(np.argmin(d2_ref[1:], 1),
                                  np.argmin(d2_i8[1:], 1))


def test_quantize_empty_gallery():
    q, scale, g2 = quantize_gallery(np.zeros((0, 16), np.float32))
    assert q.shape == (0, 16) and scale.shape == (0,) and g2.shape == (0,)


def test_service_int8_gallery_end_to_end():
    import jax
    from ugaitnet_tpu.core.config import BranchConfig, ModelConfig
    from ugaitnet_tpu.data.synthetic import make_synthetic_dataset
    from ugaitnet_tpu.eval.serving import SignatureService
    from ugaitnet_tpu.models.network import UGaitNet, init_params

    mcfg = ModelConfig(
        branches=(BranchConfig(kind="gaitset", modality="of",
                               gaitset_channels=(4, 4, 8), part_dim=8),
                  BranchConfig(kind="gaitset", modality="gray",
                               gaitset_channels=(4, 4, 8), part_dim=8)),
        merge="sign_max", nclasses=0)
    model = UGaitNet(mcfg)
    params = init_params(model, jax.random.PRNGKey(0), batch=2)
    ds = make_synthetic_dataset(num_subjects=4, videos_per_subject=2,
                                subseqs_per_video=2)

    f32 = SignatureService(model, params, ("of", "gray"), knn=1,
                           buckets=(8,))
    i8 = SignatureService(model, params, ("of", "gray"), knn=1,
                          buckets=(8,), gallery_dtype="int8")
    f32.build_gallery(ds, batch_size=8)
    i8.build_gallery(ds, batch_size=8)
    raw = {"raw_of": ds.modalities["of"].volumes[:8],
           "raw_gray": ds.modalities["gray"].volumes[:8]}
    lab_f, d_f = f32.identify_raw(raw)
    lab_q, d_q = i8.identify_raw(raw)
    np.testing.assert_array_equal(lab_f, lab_q)
    # signature codes here have norm ~sqrt(62 parts) ~ 8, so neighbor
    # distances are O(10); the int8 cross-term error lands ~1% of that
    np.testing.assert_allclose(d_f, d_q, atol=0.25)
