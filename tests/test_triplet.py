"""Batch-all / semi-hard / hard triplet losses vs small numpy oracles.

The oracles re-derive the reference algorithms
(/root/reference/nets/triplet_loss_all.py, tfa semantics) directly in numpy,
including the boolean-mask path that assumes balanced batches.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from ugaitnet_tpu.ops.triplet import (
    batch_all_triplet_loss,
    contrastive_aux_loss,
    hard_triplet_loss,
    pairwise_dist,
    semi_hard_triplet_loss,
)


def np_pairwise(x):
    sq = np.sum(x * x, axis=1)
    d2 = sq[:, None] + sq[None, :] - 2 * x @ x.T
    d2 = np.maximum(d2, 0.0)
    mask = d2 <= 0
    d = np.sqrt(d2 + mask * 1e-16)
    return d * (~mask)


def oracle_batch_all(emb_parts, labels, margin):
    """Literal re-derivation of the reference loss on (P, B, D)."""
    p, b, _ = emb_parts.shape
    per_part = []
    same = labels[:, None] == labels[None, :]
    diff = ~same
    for i in range(p):
        d = np_pairwise(emb_parts[i])
        losses = []
        for a in range(b):
            hp = d[a][same[a]]          # includes a==a, like the reference
            hn = d[a][diff[a]]
            t = np.maximum(margin + hp[:, None] - hn[None, :], 0.0)
            losses.append(t.reshape(-1))
        t = np.concatenate(losses)
        num = (t > 0).sum()
        per_part.append(t.sum() / num if num > 0 else 0.0)
    return float(np.mean(per_part))


def test_pairwise_dist_matches_numpy():
    rng = np.random.RandomState(0)
    x = rng.randn(7, 5).astype(np.float32)
    got = np.asarray(pairwise_dist(jnp.asarray(x)))
    np.testing.assert_allclose(got, np_pairwise(x), rtol=1e-5, atol=1e-5)
    # fp32 rounding can leave tiny positive self-distances (the reference's
    # tf implementation behaves identically); they must stay negligible.
    assert np.all(np.diag(got) < 5e-3)


@pytest.mark.parametrize("parts,b,d", [(1, 12, 8), (5, 12, 8), (62, 8, 4)])
def test_batch_all_matches_oracle(parts, b, d):
    rng = np.random.RandomState(1)
    emb = rng.randn(parts, b, d).astype(np.float32)
    labels = np.repeat(np.arange(b // 4), 4)[:b]
    got = float(batch_all_triplet_loss(
        jnp.asarray(np.transpose(emb, (1, 0, 2))), jnp.asarray(labels),
        margin=0.2))
    want = oracle_batch_all(emb, labels, 0.2)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_batch_all_rank2_equals_single_part():
    rng = np.random.RandomState(2)
    emb = rng.randn(10, 6).astype(np.float32)
    labels = np.repeat([0, 1, 2, 3, 4], 2)
    got2 = float(batch_all_triplet_loss(jnp.asarray(emb), jnp.asarray(labels)))
    got3 = float(batch_all_triplet_loss(jnp.asarray(emb[:, None, :]),
                                        jnp.asarray(labels)))
    np.testing.assert_allclose(got2, got3, rtol=1e-6)


def test_batch_all_zero_when_trivially_satisfied():
    # Two far-apart tight clusters, margin tiny -> no active triplets -> 0.
    emb = np.concatenate([np.zeros((4, 3)), 100 + np.zeros((4, 3))]).astype(
        np.float32)
    labels = np.array([0] * 4 + [1] * 4)
    got = float(batch_all_triplet_loss(jnp.asarray(emb), jnp.asarray(labels),
                                       margin=0.1))
    assert got == 0.0


def oracle_semi_hard(emb, labels, margin):
    b = len(labels)
    d = np_pairwise(emb)
    adj = labels[:, None] == labels[None, :]
    loss, cnt = 0.0, 0
    for a in range(b):
        for p_ in range(b):
            if a == p_ or not adj[a, p_]:
                continue
            negs = d[a][~adj[a]]
            outside = negs[negs > d[a, p_]]
            an = outside.min() if len(outside) else negs.max()
            loss += max(margin + d[a, p_] - an, 0.0)
            cnt += 1
    return loss / max(cnt, 1)


def test_semi_hard_matches_oracle():
    rng = np.random.RandomState(3)
    emb = rng.randn(12, 6).astype(np.float32)
    labels = np.repeat(np.arange(3), 4)
    got = float(semi_hard_triplet_loss(jnp.asarray(emb), jnp.asarray(labels),
                                       margin=1.0))
    np.testing.assert_allclose(got, oracle_semi_hard(emb, labels, 1.0),
                               rtol=1e-5)


def test_hard_matches_oracle():
    rng = np.random.RandomState(4)
    emb = rng.randn(12, 6).astype(np.float32)
    labels = np.repeat(np.arange(3), 4)
    d = np_pairwise(emb)
    adj = labels[:, None] == labels[None, :]
    per_anchor = []
    for a in range(12):
        pos = d[a][adj[a] & (np.arange(12) != a)].max()
        neg = d[a][~adj[a]].min()
        per_anchor.append(max(pos - neg + 1.0, 0.0))
    got = float(hard_triplet_loss(jnp.asarray(emb), jnp.asarray(labels),
                                  margin=1.0))
    np.testing.assert_allclose(got, np.mean(per_anchor), rtol=1e-5)


def test_contrastive_aux_strips_label_code():
    rng = np.random.RandomState(5)
    emb = rng.randn(8, 4).astype(np.float32)
    # labels with x100 camera code: 101, 102 -> class 1; 201.. -> class 2
    labels = np.array([101, 102, 103, 104, 201, 202, 203, 204])
    got = float(contrastive_aux_loss(jnp.asarray(emb), jnp.asarray(labels)))
    same = float(contrastive_aux_loss(jnp.asarray(emb),
                                      jnp.asarray(labels // 100 * 100)))
    np.testing.assert_allclose(got, same, rtol=1e-6)
    assert got > 0


def test_semi_hard_degenerate_all_same_label_finite():
    """All-same-label batch: tfa's _masked_maximum falls back to the row
    min (0), giving mean(max(margin + d_ap, 0)) — NOT ~1e30 from a -inf
    sentinel (one such tail batch would poison the epoch-mean loss)."""
    rng = np.random.RandomState(6)
    emb = rng.randn(6, 4).astype(np.float32)
    labels = np.zeros(6, np.int32)
    got = float(semi_hard_triplet_loss(jnp.asarray(emb),
                                       jnp.asarray(labels), margin=1.0))
    d = np_pairwise(emb)
    want = np.mean([max(1.0 + d[a, p], 0.0)
                    for a in range(6) for p in range(6) if a != p])
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_hard_degenerate_singleton_class_matches_tfa():
    """An anchor with no positive degrades to hard_pos = row min (0), so
    it still contributes max(margin - nearest_neg, 0) like tfa — the old
    -inf sentinel silently zeroed it."""
    rng = np.random.RandomState(7)
    emb = (0.05 * rng.randn(5, 4)).astype(np.float32)  # all dists < margin
    labels = np.array([0, 0, 1, 1, 2], np.int32)       # label 2: singleton
    got = float(hard_triplet_loss(jnp.asarray(emb), jnp.asarray(labels),
                                  margin=1.0))
    d = np_pairwise(emb)
    adj = labels[:, None] == labels[None, :]
    per_anchor = []
    for a in range(5):
        pos_mask = adj[a] & (np.arange(5) != a)
        pos = d[a][pos_mask].max() if pos_mask.any() else d[a].min()
        neg = d[a][~adj[a]].min()
        per_anchor.append(max(pos - neg + 1.0, 0.0))
    np.testing.assert_allclose(got, np.mean(per_anchor), rtol=1e-5)
