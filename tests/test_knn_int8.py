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
        jnp.asarray(probes), jnp.asarray(q), jnp.float32(scale),
        jnp.asarray(g2)))
    # normalized codes: distances in [0, 4]; int8 cross-term error ~1e-2
    assert np.max(np.abs(d2_ref - d2_i8)) < 5e-2
    # nearest neighbor identical for every probe
    np.testing.assert_array_equal(np.argmin(d2_ref, 1), np.argmin(d2_i8, 1))
    # ... and therefore the predicted label
    np.testing.assert_array_equal(glab[np.argmin(d2_ref, 1)],
                                  glab[np.argmin(d2_i8, 1)])


def test_quantize_roundtrip_properties():
    rng = np.random.RandomState(1)
    codes = rng.randn(100, 32).astype(np.float32)
    q, scale, g2 = quantize_gallery(codes)
    assert q.dtype == np.int8
    assert np.max(np.abs(q)) <= 127
    np.testing.assert_allclose(g2, np.sum(codes ** 2, 1), rtol=1e-6)
    np.testing.assert_allclose(q.astype(np.float32) * scale, codes,
                               atol=scale * 0.5 + 1e-7)


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
