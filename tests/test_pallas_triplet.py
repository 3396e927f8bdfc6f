"""Pallas triplet kernel vs the XLA reference implementation (values+grads).

Runs in Pallas interpreter mode on the CPU test mesh; the same kernels
compile for TPU (exercised by bench/integration on hardware).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ugaitnet_tpu.ops.triplet import batch_all_triplet_loss
from ugaitnet_tpu.ops.pallas.triplet_kernel import (
    batch_all_triplet_loss_pallas)


@pytest.mark.parametrize("parts,b,d", [(1, 12, 8), (5, 12, 16), (62, 8, 16)])
def test_forward_matches_xla(parts, b, d):
    rng = np.random.RandomState(0)
    emb = rng.randn(b, parts, d).astype(np.float32)
    labels = np.repeat(np.arange(b // 4), 4)[:b].astype(np.int32)
    want = float(batch_all_triplet_loss(jnp.asarray(emb), jnp.asarray(labels),
                                        margin=0.2))
    got = float(batch_all_triplet_loss_pallas(
        jnp.asarray(emb), jnp.asarray(labels), margin=0.2, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_forward_rank2():
    rng = np.random.RandomState(1)
    emb = rng.randn(10, 8).astype(np.float32)
    labels = np.repeat(np.arange(5), 2).astype(np.int32)
    want = float(batch_all_triplet_loss(jnp.asarray(emb), jnp.asarray(labels)))
    got = float(batch_all_triplet_loss_pallas(jnp.asarray(emb),
                                              jnp.asarray(labels),
                                              interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_gradients_match_xla():
    rng = np.random.RandomState(2)
    b, parts, d = 12, 3, 8
    emb = rng.randn(b, parts, d).astype(np.float32)
    labels = np.repeat(np.arange(3), 4).astype(np.int32)

    g_ref = jax.grad(lambda e: batch_all_triplet_loss(
        e, jnp.asarray(labels), margin=0.2))(jnp.asarray(emb))
    g_pal = jax.grad(lambda e: batch_all_triplet_loss_pallas(
        e, jnp.asarray(labels), margin=0.2, interpret=True))(jnp.asarray(emb))
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                               rtol=2e-4, atol=2e-5)


def test_degenerate_batches_no_nan():
    rng = np.random.RandomState(3)
    emb = jnp.asarray(rng.randn(6, 2, 8).astype(np.float32))
    for labels in (np.zeros(6), np.arange(6)):
        val = float(batch_all_triplet_loss_pallas(
            emb, jnp.asarray(labels.astype(np.int32)), interpret=True))
        assert val == 0.0
        g = jax.grad(lambda e: batch_all_triplet_loss_pallas(
            e, jnp.asarray(labels.astype(np.int32)), interpret=True))(emb)
        assert np.isfinite(np.asarray(g)).all()


def test_gridded_kernel_past_128():
    """The gridded kernel (one grid step per anchor block,
    grid_variant=True — not the default dispatch, which routes B > 128
    to the measured-faster XLA form): value and gradient must match the
    XLA formulation."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from ugaitnet_tpu.ops.pallas.triplet_kernel import (
        batch_all_triplet_loss_pallas)
    from ugaitnet_tpu.ops.triplet import batch_all_triplet_loss

    rng = np.random.RandomState(0)
    # one batch past 128 with value+grad (interpreter is slow on the
    # 1-core host; B=256 parity is additionally driven on real TPU by
    # the verify script / integration runs)
    b = 160
    emb = jnp.asarray(rng.randn(b, 2, 32).astype(np.float32))
    labels = jnp.asarray((np.arange(b) % 10).astype(np.int32))
    v1 = float(batch_all_triplet_loss(emb, labels, 0.2))
    v2 = float(batch_all_triplet_loss_pallas(emb, labels, 0.2,
                                             interpret=True,
                                             grid_variant=True))
    np.testing.assert_allclose(v1, v2, rtol=1e-6)
    g1 = jax.grad(lambda e: batch_all_triplet_loss(e, labels, 0.2))(emb)
    g2 = jax.grad(lambda e: batch_all_triplet_loss_pallas(
        e, labels, 0.2, interpret=True, grid_variant=True))(emb)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=2e-5)


@pytest.mark.slow
def test_very_large_batch_falls_back_to_xla():
    """B > MAX_GRID_B routes to the XLA formulation with identical values
    (no pallas involved, so it runs anywhere without interpret)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from ugaitnet_tpu.ops.pallas.triplet_kernel import (
        MAX_GRID_B, batch_all_triplet_loss_pallas)
    from ugaitnet_tpu.ops.triplet import batch_all_triplet_loss

    b = MAX_GRID_B + 24
    rng = np.random.RandomState(0)
    emb = jnp.asarray(rng.randn(b, 1, 8).astype(np.float32))
    labels = jnp.asarray((np.arange(b) % 10).astype(np.int32))
    v1 = float(batch_all_triplet_loss(emb, labels, 0.2))
    v2 = float(batch_all_triplet_loss_pallas(emb, labels, 0.2))
    assert v1 == v2
