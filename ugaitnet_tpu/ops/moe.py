"""Mixture-of-experts part projection: top-1 token-choice routing.

Beyond-reference capability (the reference's per-part MatMul projection,
/root/reference/nets/mj_uwyhNets_ba.py:23-48, is a fixed part->weight
assignment).  The MoE head replaces the 62 per-part matrices with E shared
expert matrices and a learned router over (batch, part) tokens — Switch
Transformer-style top-1 routing with a static capacity, so every shape is
known at trace time and the whole dispatch/compute/combine is three einsums
the MXU can run at full tilt:

  dispatch  (N,E,Cap) x (N,C)  -> (E,Cap,C)   tokens to expert slots
  expert    (E,Cap,C) x (E,C,D)-> (E,Cap,D)   one batched matmul, E-sharded
                                              under expert parallelism
  combine   (N,E,Cap) x (E,Cap,D)-> (N,D)     gated scatter back

Under expert parallelism (parallel/expert.py) the E axis of `expert_w` and
of the dispatched activations is sharded over the mesh's "expert" axis;
GSPMD lowers the dispatch/combine einsums to the all_to_all exchange.

Routing follows the Switch formulation (load-balance auxiliary loss
``E * sum_e f_e * p_e``); tokens past an expert's capacity are dropped
(their output row is 0), which is exact-shape-static and standard practice.
Router math runs in float32 regardless of the compute dtype.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def moe_capacity(num_tokens: int, num_experts: int,
                 capacity_factor: float) -> int:
    """Static per-expert slot count (>=1)."""
    return max(1, int(num_tokens * capacity_factor / num_experts + 0.999999))


def moe_project(tokens: jax.Array, router_w: jax.Array, expert_w: jax.Array,
                capacity: int) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Route (N, C) tokens through E experts of shape (C, D).

    Returns (out (N, D), aux_loss scalar, kept (N,) 0/1 mask).
    Dropped (over-capacity) tokens produce a zero output row.
    """
    n, c = tokens.shape
    e = router_w.shape[-1]

    logits = tokens.astype(jnp.float32) @ router_w.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)               # (N, E)
    gate = jnp.max(probs, axis=-1)                        # (N,)
    expert_oh = jax.nn.one_hot(jnp.argmax(probs, axis=-1), e,
                               dtype=jnp.float32)         # (N, E)

    # Switch load-balance loss: fraction of tokens routed to e times the
    # mean router probability of e, scaled by E (==1 at perfect balance).
    frac = jnp.mean(expert_oh, axis=0)
    mean_p = jnp.mean(probs, axis=0)
    aux = e * jnp.sum(frac * mean_p)

    # Position of each token within its expert's queue (1-based), then
    # drop anything past the static capacity.
    pos = jnp.cumsum(expert_oh, axis=0) * expert_oh       # (N, E)
    kept_oh = expert_oh * (pos <= capacity)               # (N, E)
    kept = jnp.sum(kept_oh, axis=-1)                      # (N,) 0/1
    slot = jnp.sum(pos * kept_oh, axis=-1) - 1.0          # (N,) slot or -1
    slot_oh = jax.nn.one_hot(slot.astype(jnp.int32), capacity,
                             dtype=jnp.float32) * kept[:, None]

    dispatch = kept_oh[:, :, None] * slot_oh[:, None, :]  # (N, E, Cap)
    dtype = expert_w.dtype
    xe = jnp.einsum("nec,nd->ecd", dispatch.astype(dtype),
                    tokens.astype(dtype))                 # (E, Cap, C)
    ye = jnp.einsum("ecd,edf->ecf", xe, expert_w,
                    preferred_element_type=jnp.float32)   # (E, Cap, D)
    combine = dispatch * gate[:, None, None]              # (N, E, Cap)
    out = jnp.einsum("nec,ecf->nf", combine.astype(jnp.float32), ye)
    return out, aux, kept
