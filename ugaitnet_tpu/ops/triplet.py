"""Triplet losses over gait signatures.

Reimplements, with static shapes and XLA-friendly masking, the semantics of:
  - batch-all triplet over (parts, batch, dim) part embeddings
    (`triplet_loss` + `batch_dist`, /root/reference/nets/triplet_loss_all.py:8-77)
  - semi-hard triplet (tfa.losses.TripletSemiHardLoss, used by the
    BothDatasets nets, /root/reference/nets/mj_uwyhNets_bothDatasets.py:696,715)
  - hard triplet (tfa.TripletHardLoss via `compile_hard`,
    /root/reference/nets/mj_uwyhNets_ba.py:1301-1306)

Design notes (TPU-first):
  * The reference uses `tf.boolean_mask` + dynamic reshape, which assumes a
    class-balanced batch and would force dynamic shapes under jit. We use the
    mathematically identical masked dense form: the (B, B, B) triplet tensor
    per part, masked by validity, summed and divided by the positive-triplet
    count. No dynamic shapes, everything fuses.
  * Parts are processed with `lax.map` in chunks so peak memory stays at
    O(chunk * B^3) instead of O(P * B^3); each chunk is one fused
    matmul + VPU reduction block.
  * Embeddings arrive batch-major (B, P, D) (see ops/fusion.py); labels (B,).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def pairwise_dist(x: jax.Array, squared: bool = False) -> jax.Array:
    """Euclidean distance matrix with the reference's zero-guard.

    x: (..., B, D) -> (..., B, B). Matches `batch_dist`
    (/root/reference/nets/triplet_loss_all.py:70-77): clamp negatives to 0,
    add 1e-16 under the sqrt exactly where dist<=0, then zero those entries.
    """
    x = x.astype(jnp.float32)
    sq = jnp.sum(jnp.square(x), axis=-1)
    dot = jnp.matmul(x, jnp.swapaxes(x, -1, -2), preferred_element_type=jnp.float32)
    d2 = sq[..., :, None] + sq[..., None, :] - 2.0 * dot
    d2 = jnp.maximum(d2, 0.0)
    if squared:
        return d2
    zero = d2 <= 0.0
    d = jnp.sqrt(d2 + jnp.where(zero, 1e-16, 0.0))
    return jnp.where(zero, 0.0, d)


def _as_parts_major(embeddings: jax.Array) -> jax.Array:
    """(B, D) -> (1, B, D); (B, P, D) -> (P, B, D)."""
    if embeddings.ndim == 2:
        return embeddings[None]
    return jnp.transpose(embeddings, (1, 0, 2))


def batch_all_triplet_loss(embeddings: jax.Array, labels: jax.Array,
                           margin: float = 0.2, part_chunk: int = 8) -> jax.Array:
    """Batch-all triplet loss, reference semantics.

    embeddings: (B, D) or batch-major parts (B, P, D).
    labels: (B,) integer class ids.

    Per part: mean over *active* triplets (those with positive loss) of
    max(margin + d(a,p) - d(a,n), 0), where (a,p) ranges over all same-label
    pairs (including a==p, as the reference's hp_mask does) and (a,n) over all
    different-label pairs; parts with no active triplet contribute 0; final
    loss is the mean over parts (/root/reference/nets/triplet_loss_all.py:40-61).
    """
    emb = _as_parts_major(embeddings).astype(jnp.float32)
    labels = labels.reshape(-1)
    same = labels[:, None] == labels[None, :]   # includes the diagonal
    diff = jnp.logical_not(same)
    valid = same[:, :, None] & diff[:, None, :]  # (B, B, B) anchor/pos/neg

    p, b, d = emb.shape
    pad = (-p) % part_chunk
    if pad:
        emb = jnp.concatenate([emb, jnp.zeros((pad, b, d), emb.dtype)], axis=0)
    groups = emb.reshape(-1, part_chunk, b, d)

    def per_chunk(e):
        dist = pairwise_dist(e)                       # (chunk, B, B)
        t = margin + dist[:, :, :, None] - dist[:, :, None, :]
        t = jnp.maximum(t, 0.0) * valid[None].astype(t.dtype)
        s = jnp.sum(t, axis=(1, 2, 3))
        n = jnp.sum((t > 0.0).astype(jnp.float32), axis=(1, 2, 3))
        return jnp.where(n > 0.0, s / jnp.maximum(n, 1.0), 0.0)

    per_part = jax.lax.map(per_chunk, groups).reshape(-1)[:p]
    return jnp.mean(per_part)


def semi_hard_triplet_loss(embeddings: jax.Array, labels: jax.Array,
                           margin: float = 1.0) -> jax.Array:
    """tfa.losses.TripletSemiHardLoss parity (L2, non-squared distances).

    For each anchor-positive pair: negative = min over negatives farther than
    the positive ("outside"), else the farthest negative ("inside"); loss is
    mean over off-diagonal positive pairs of max(margin + d_ap - d_an, 0).
    Generalized to parts by averaging the per-part loss.
    """
    emb = _as_parts_major(embeddings).astype(jnp.float32)
    labels = labels.reshape(-1)
    b = labels.shape[0]
    adjacency = labels[:, None] == labels[None, :]
    adjacency_not = jnp.logical_not(adjacency)
    big = jnp.float32(1e30)

    def per_part(e):
        pdist = pairwise_dist(e)  # (B, B)
        # mask[a, p, n]: n is negative for a AND d(a,n) > d(a,p)
        mask = adjacency_not[:, None, :] & (pdist[:, None, :] > pdist[:, :, None])
        # min over qualifying negatives; +inf where none
        neg_outside = jnp.min(jnp.where(mask, pdist[:, None, :], big), axis=2)
        has_outside = jnp.any(mask, axis=2)
        # farthest negative per anchor as fallback — tfa's _masked_maximum
        # form: row-min + max((d - row_min) * mask).  On a batch with NO
        # negative for an anchor it degrades to the row min (0), keeping
        # the loss finite where a -inf sentinel would blow it up to ~1e30
        # and poison the epoch mean / plateau monitor.
        amin = jnp.min(pdist, axis=1)
        neg_inside = (jnp.max((pdist - amin[:, None])
                              * adjacency_not.astype(pdist.dtype), axis=1)
                      + amin)
        semi_hard = jnp.where(has_outside, neg_outside, neg_inside[:, None])
        loss_mat = margin + pdist - semi_hard
        mask_pos = adjacency & ~jnp.eye(b, dtype=bool)
        num_pos = jnp.maximum(jnp.sum(mask_pos.astype(jnp.float32)), 1e-16)
        return jnp.sum(jnp.maximum(loss_mat * mask_pos.astype(jnp.float32), 0.0)) / num_pos

    return jnp.mean(jax.vmap(per_part)(emb))


def hard_triplet_loss(embeddings: jax.Array, labels: jax.Array,
                      margin: float = 1.0, soft: bool = False) -> jax.Array:
    """tfa.losses.TripletHardLoss parity: hardest positive vs hardest negative
    per anchor, mean over anchors."""
    emb = _as_parts_major(embeddings).astype(jnp.float32)
    labels = labels.reshape(-1)
    b = labels.shape[0]
    adjacency = labels[:, None] == labels[None, :]
    adjacency_not = jnp.logical_not(adjacency)

    def per_part(e):
        pdist = pairwise_dist(e)
        mask_pos = adjacency & ~jnp.eye(b, dtype=bool)
        # tfa's _masked_maximum/_masked_minimum forms, NOT +/-inf
        # sentinels: an anchor with no positive degrades to the row min
        # (0) and one with no negative to the row max, exactly like
        # tfa.losses.triplet_hard_loss on the same degenerate batch —
        # sentinels would silently zero those anchors' contributions.
        amin = jnp.min(pdist, axis=1, keepdims=True)
        hard_pos = (jnp.max((pdist - amin) * mask_pos.astype(pdist.dtype),
                            axis=1) + amin[:, 0])
        amax = jnp.max(pdist, axis=1, keepdims=True)
        hard_neg = (jnp.min((pdist - amax)
                            * adjacency_not.astype(pdist.dtype), axis=1)
                    + amax[:, 0])
        if soft:
            return jnp.mean(jnp.log1p(jnp.exp(hard_pos - hard_neg)))
        return jnp.mean(jnp.maximum(hard_pos - hard_neg + margin, 0.0))

    return jnp.mean(jax.vmap(per_part)(emb))


def contrastive_aux_loss(embeddings: jax.Array, labels: jax.Array) -> jax.Array:
    """Aux "contrastive" loss parity (/root/reference/nets/aux_loss.py:78-135):
    mean anchor-positive distance over valid triplets. Labels carry a x100
    camera/condition code that is stripped (`labels // 100`, :101).
    """
    emb = embeddings.astype(jnp.float32)
    if emb.ndim == 3:  # (B, P, D) -> flatten parts: aux loss is per-sample
        emb = emb.reshape(emb.shape[0], -1)
    labels = labels.reshape(-1) // 100
    b = labels.shape[0]
    pdist = pairwise_dist(emb)

    eye = jnp.eye(b, dtype=bool)
    neq = ~eye
    distinct = neq[:, :, None] & neq[:, None, :] & neq[None, :, :]
    label_eq = labels[:, None] == labels[None, :]
    valid = distinct & label_eq[:, :, None] & ~label_eq[:, None, :]

    t = pdist[:, :, None] * valid.astype(jnp.float32)
    t = jnp.maximum(t, 0.0)
    num_pos = jnp.sum((t > 1e-16).astype(jnp.float32))
    return jnp.sum(t) / (num_pos + 1e-16)


def make_triplet_loss(kind: str = "batch_all", margin: float = 0.2):
    if kind == "batch_all":
        # On TPU the pallas kernel's fwd+grad beats the chunked XLA path
        # (~2.1 vs ~2.3 ms at the flagship (62, 120, 256), v5e) so it is
        # the training default there; elsewhere (CPU tests, GPU) the XLA
        # formulation wins (the kernel would run interpreted).
        if jax.default_backend() == "tpu":
            from ugaitnet_tpu.ops.pallas.triplet_kernel import (
                batch_all_triplet_loss_pallas)
            return functools.partial(batch_all_triplet_loss_pallas,
                                     margin=margin)
        return functools.partial(batch_all_triplet_loss, margin=margin)
    if kind == "batch_all_xla":
        return functools.partial(batch_all_triplet_loss, margin=margin)
    if kind == "batch_all_pallas":
        from ugaitnet_tpu.ops.pallas.triplet_kernel import (
            batch_all_triplet_loss_pallas)
        return functools.partial(batch_all_triplet_loss_pallas, margin=margin)
    if kind == "semi_hard":
        return functools.partial(semi_hard_triplet_loss, margin=margin)
    if kind == "hard":
        return functools.partial(hard_triplet_loss, margin=margin)
    raise ValueError(f"unknown triplet kind: {kind}")
