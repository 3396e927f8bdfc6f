"""Gating / merge / signature ops vs numpy oracles (reference semantics)."""

import numpy as np
import jax.numpy as jnp

from ugaitnet_tpu.ops import fusion as F


def test_gate_zeroes_missing():
    e = np.ones((4, 3), np.float32)
    u = np.array([1.0, 0.0, 1.0, 0.0])
    out = np.asarray(F.gate(jnp.asarray(e), jnp.asarray(u)))
    np.testing.assert_allclose(out[1], 0.0)
    np.testing.assert_allclose(out[0], 1.0)


def test_gate_rank3_broadcasts_over_parts():
    e = np.random.RandomState(0).randn(4, 5, 3).astype(np.float32)
    u = np.array([1.0, 0.0, 1.0, 0.0])
    out = np.asarray(F.gate(jnp.asarray(e), jnp.asarray(u)))
    np.testing.assert_allclose(out[1], 0.0)
    np.testing.assert_allclose(out[2], e[2])


def test_sign_max_matches_reference_lambda():
    """Oracle = the reference sign_max (argmax of |stacked|, first wins ties)
    re-derived in numpy (mains/mj_trainUWYHGaitNet_DataGen_CasiaB.py:169-178)."""
    rng = np.random.RandomState(1)
    a = rng.randn(6, 7).astype(np.float32)
    b = rng.randn(6, 7).astype(np.float32)
    stacked = np.stack([a, b]).reshape(2, -1)
    pick = np.argmax(np.abs(stacked), axis=0)
    want = stacked[pick, np.arange(stacked.shape[1])].reshape(a.shape)
    got = np.asarray(F.merge_sign_max([jnp.asarray(a), jnp.asarray(b)]))
    np.testing.assert_allclose(got, want)


def test_sign_max_tie_prefers_first_input():
    a = np.array([[1.0, -2.0]], np.float32)
    b = np.array([[-1.0, 2.0]], np.float32)  # same magnitudes
    got = np.asarray(F.merge_sign_max([jnp.asarray(a), jnp.asarray(b)]))
    np.testing.assert_allclose(got, a)


def test_sign_max_three_inputs():
    rng = np.random.RandomState(2)
    xs = [rng.randn(3, 4).astype(np.float32) for _ in range(3)]
    stacked = np.stack(xs).reshape(3, -1)
    pick = np.argmax(np.abs(stacked), axis=0)
    want = stacked[pick, np.arange(stacked.shape[1])].reshape(xs[0].shape)
    got = np.asarray(F.merge_sign_max([jnp.asarray(x) for x in xs]))
    np.testing.assert_allclose(got, want)


def test_l2_normalize_matches_tf_semantics():
    x = np.array([[3.0, 4.0], [0.0, 0.0]], np.float32)
    out = np.asarray(F.l2_normalize(jnp.asarray(x), axis=1))
    np.testing.assert_allclose(out[0], [0.6, 0.8], rtol=1e-6)
    # tf.l2_normalize of the zero vector is 0 (max(eps) guard), not NaN
    np.testing.assert_allclose(out[1], [0.0, 0.0])


def test_signature_reference_mode_normalizes_batch_axis():
    """Reference quirk parity: for rank-3 gaitset signatures the reference
    normalizes tf axis=1 == batch (nets/mj_uwyhNets_ba.py:817). Our layout is
    batch-major (B, P, D) so that's axis 0."""
    rng = np.random.RandomState(3)
    x = rng.randn(4, 5, 6).astype(np.float32)
    got = np.asarray(F.signature(jnp.asarray(x), l2_mode="reference"))
    norms = np.linalg.norm(got, axis=0)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-5)
    # feature mode normalizes each per-part vector instead
    got_f = np.asarray(F.signature(jnp.asarray(x), l2_mode="feature"))
    np.testing.assert_allclose(np.linalg.norm(got_f, axis=-1), 1.0, rtol=1e-5)


def test_fuse_missing_modality_keeps_present_one():
    rng = np.random.RandomState(4)
    e1 = np.abs(rng.randn(3, 8)).astype(np.float32)
    e2 = np.abs(rng.randn(3, 8)).astype(np.float32)
    u1 = np.array([1.0, 1.0, 0.0])
    u2 = np.array([1.0, 0.0, 1.0])
    out = np.asarray(F.fuse([jnp.asarray(e1), jnp.asarray(e2)],
                            [jnp.asarray(u1), jnp.asarray(u2)], merge="max"))
    # sample 1: only e1 present -> signature is normalized e1
    np.testing.assert_allclose(out[1], e1[1] / np.linalg.norm(e1[1]),
                               rtol=1e-5)
    # sample 2: only e2 present
    np.testing.assert_allclose(out[2], e2[2] / np.linalg.norm(e2[2]),
                               rtol=1e-5)
