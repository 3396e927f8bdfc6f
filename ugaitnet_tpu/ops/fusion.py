"""Modality gating and fusion ops.

Reference behavior being reproduced (never translated literally):
  - gating: multiply a branch embedding by its binary presence flag
    (`mj_tensor_times_scalar`, /root/reference/nets/mj_uwyhNets_ba.py:51-54).
  - fusion: element-wise Maximum / Average / sign_max across gated branch
    embeddings (`fMerge(name="fusion")`, mj_uwyhNets_ba.py:814;
    `sign_max`, mains/mj_trainUWYHGaitNet_DataGen_CasiaB.py:169-178).
  - signature: L2-normalization of the fused embedding
    (mj_uwyhNets_ba.py:817).

Layout note (TPU-first design): branch embeddings here are batch-major —
(B, D) for dense branches and (B, P, D) for GaitSet part embeddings — so
that every op is a big VPU-friendly elementwise or a single MXU matmul.
The reference keeps gaitset embeddings parts-major (P, B, D); we only
transpose at the loss/eval boundary where parity requires it.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def gate(embedding: jax.Array, use_flag: jax.Array) -> jax.Array:
    """Multiply per-sample embeddings by a binary presence flag.

    embedding: (B, D) or (B, P, D); use_flag: (B,) or (B, 1) of {0., 1.}.
    """
    flag = use_flag.reshape(use_flag.shape[0], *([1] * (embedding.ndim - 1)))
    return embedding * flag.astype(embedding.dtype)


def merge_max(embeddings: Sequence[jax.Array]) -> jax.Array:
    out = embeddings[0]
    for e in embeddings[1:]:
        out = jnp.maximum(out, e)
    return out


def merge_average(embeddings: Sequence[jax.Array]) -> jax.Array:
    return sum(embeddings) / float(len(embeddings))


def merge_sign_max(embeddings: Sequence[jax.Array]) -> jax.Array:
    """Signed max: element-wise pick the value of largest magnitude.

    Matches the reference lambda (argmax over |stacked|, first index wins
    ties — mains/mj_trainUWYHGaitNet_DataGen_CasiaB.py:169-178) without any
    gather: a fori chain of `where(|best| >= |x|)` keeps the earliest
    maximal entry exactly like tf.argmax does, and lowers to pure VPU
    selects instead of a gather_nd.
    """
    best = embeddings[0]
    for e in embeddings[1:]:
        keep = jnp.abs(best) >= jnp.abs(e)
        best = jnp.where(keep, best, e)
    return best


MERGES = {
    "max": merge_max,
    "maximum": merge_max,
    "average": merge_average,
    "sign_max": merge_sign_max,
}


def l2_normalize(x: jax.Array, axis: int, eps: float = 1e-12) -> jax.Array:
    """tf.math.l2_normalize parity: x / sqrt(max(sum(x^2), eps))."""
    sq = jnp.sum(jnp.square(x), axis=axis, keepdims=True)
    return x * jax.lax.rsqrt(jnp.maximum(sq, eps))


def signature(fused: jax.Array, l2_mode: str = "reference") -> jax.Array:
    """L2-normalize the fused embedding into the gait signature.

    fused: (B, D) or (B, P, D) batch-major.

    l2_mode:
      "reference" — reproduce tf.math.l2_normalize(x, axis=1) applied to the
        reference's layouts: axis 1 is the feature axis for (B, D) nets but
        the *batch* axis for the parts-major (P, B, D) gaitset signature
        (/root/reference/nets/mj_uwyhNets_ba.py:817). In our batch-major
        (B, P, D) layout that means normalizing over axis 0.
      "feature" — always normalize the per-sample feature vector(s).
    """
    if fused.ndim == 2:
        return l2_normalize(fused, axis=1)
    if l2_mode == "reference":
        return l2_normalize(fused, axis=0)
    return l2_normalize(fused, axis=-1)


def fuse(embeddings: Sequence[jax.Array], use_flags: Sequence[jax.Array],
         merge: str = "max", norm_before_merge: bool = False,
         l2_mode: str = "reference") -> jax.Array:
    """gate -> (optional per-branch L2) -> merge -> signature L2-norm."""
    gated = []
    for e, u in zip(embeddings, use_flags):
        if norm_before_merge:
            e = l2_normalize(e, axis=-1)
        gated.append(gate(e, u))
    fused = MERGES[merge](gated)
    return signature(fused, l2_mode=l2_mode)
