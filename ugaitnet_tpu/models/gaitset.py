"""GaitSet-style set-pooling branch with horizontal pyramid pooling.

Flax re-design of `UWYHSemiNet.build_gaitset_branch`
(/root/reference/nets/mj_uwyhNets_ba.py:419-484):

  frame stream (a):  per-frame 2D convs (TimeDistributed in Keras). On TPU
      the volume stays 5D (B, T, H, W, C) and every "2D" conv runs as an
      NDHWC conv with a unit time-window (kernel (1, k, k)) — identical
      math per frame, but XLA keeps B(=128) in the lane dim and T as an
      ordinary major dim, so the set pooling below is a lane-preserving
      reduction.  (The earlier (B*T)-fold put the folded dim in lanes and
      XLA inserted a 2.4 ms relayout copy per stage per branch before each
      set pool — profiled on v5e, B=128; the 5D form measures conv speeds
      equal or better: 91 vs 60 TF on the 32x32x64 conv.)
  set stream (b):    max over time ("set pooling") at three depths, with
      residual adds from the frame stream.
  HPP:               horizontal pyramid pooling with bins (1,2,4,8,16) over
      both streams — each bin is a strip of rows of the 16x16 map, reduced by
      mean+max (mj_uwyhNets_ba.py:467-478). 2*31 = 62 parts of 128 dims.
  part projection:   trainable (62, 128, 256) tensor applied per part — the
      reference's custom MatMul layer (:23-48) — implemented as a single
      batched einsum so all 62 projections are one MXU call.

Output is batch-major (B, 62, 256); the reference keeps (62, B, 256) and we
transpose only where parity requires (see ops/fusion.signature).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

from ugaitnet_tpu.ops.pooling import max_pool_2x2

glorot = nn.initializers.glorot_uniform()


def _conv5d(x, w, dtype):
    return lax.conv_general_dilated(
        x, w[None], (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=dtype)


def _conv4d_folded(x, w, dtype):
    b, t, h, ww, c = x.shape
    y = lax.conv_general_dilated(
        x.reshape(b * t, h, ww, c), w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=dtype)
    return y.reshape(b, t, h, ww, -1)


class FrameConv(nn.Module):
    """Per-frame conv on a 5D (B, T, H, W, C) volume via NDHWC with a unit
    time window.  The kernel param keeps the 2D (k, k, ci, co) shape so
    checkpoints / Keras imports are identical to an nn.Conv.

    On TPU both forward and backward run through the 5D NDHWC conv (keeps
    B in lanes, set pooling layout-preserving — see module docstring).  A
    mixed-layout custom VJP (filter gradient through the folded 4D conv,
    which is 3-4x faster standalone) was tried and REVERTED: inside the
    full train jit the b-minor->default relayouts at the 4D boundary cost
    more than the wgrad saved (108 -> 188 ms/step measured on v5e).  On
    CPU everything folds to 4D (XLA:CPU lowers NDHWC poorly; >2x slower
    test suite)."""
    features: int
    kernel: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k = self.kernel
        w = self.param("kernel", glorot, (k, k, x.shape[-1], self.features),
                       jnp.float32)
        x = x.astype(self.dtype)
        w = w.astype(self.dtype)
        if jax.default_backend() != "tpu":
            return _conv4d_folded(x, w, self.dtype)
        return _conv5d(x, w, self.dtype)


def _set_max(a: jax.Array, seq_axis: str = "") -> jax.Array:
    """Set pooling: max over the time axis of (B, T, H, W, C) -> (B, H, W, C).

    T is a major (non-lane) dim in the 5D layout, so this reduce is
    layout-preserving.  -jnp.inf must be a python scalar literal so jax
    selects the differentiable reduce_window_max primitive.

    seq_axis: sequence-parallel mesh axis (parallel/sequence.py). Under
    shard_map the T dim holds only this shard's frames; the global set max
    is the max over shards of the local max — recovered with a
    differentiable all_gather (its VJP routes cotangents back to the
    owning shard; lax.pmax has no batching/differentiation rule) + a tiny
    (B, n_shards, H, W, C) max."""
    t = a.shape[1]
    if jax.default_backend() == "tpu":
        out = lax.reduce_window(
            a, -jnp.inf, lax.max,
            (1, t, 1, 1, 1), (1, t, 1, 1, 1), "VALID")
        out = jnp.squeeze(out, axis=1)
    else:
        # XLA:CPU's SelectAndScatter backward is a scalar loop (16x the
        # jnp.max form, see ops/pooling.py); values are identical
        out = jnp.max(a, axis=1)
    if seq_axis:
        out = jnp.max(lax.all_gather(out, seq_axis, axis=1), axis=1)
    return out


class GaitSetBranch(nn.Module):
    channels: Tuple[int, int, int] = (32, 64, 128)
    hpp_bins: Sequence[int] = (1, 2, 4, 8, 16)
    part_dim: int = 256
    leaky_alpha: float = 0.3
    pad: int = 2          # ZeroPadding2D(2): 60 -> 64 so pools/bins divide
    dtype: jnp.dtype = jnp.float32
    # sequence-parallel axis: set pools close over this shard_map axis
    # (ModelConfig.seq_axis -> parallel/sequence.py); "" = single program
    seq_axis: str = ""
    # MoE part projection (beyond reference, ops/moe.py): E > 0 swaps the
    # fixed per-part MatMul for E shared experts + a learned top-1 router
    # over (batch, part) tokens; the Switch load-balance loss is sown into
    # the "moe" collection (collected by train_step.compute_losses).
    moe_experts: int = 0
    moe_capacity_factor: float = 1.25

    def _conv(self, f: int, k: int, name: str):
        return FrameConv(f, k, dtype=self.dtype, name=name)

    def _bconv(self, f: int, k: int, name: str):
        return nn.Conv(f, (k, k), padding="SAME", use_bias=False,
                       kernel_init=glorot, dtype=self.dtype, name=name)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        """x: (B, T, H, W, C) -> (B, num_parts, part_dim)."""
        # lrelu as max(x, a*x) — EXACT for 0<=a<1 and, unlike
        # nn.leaky_relu's select form, keeps XLA from materializing a
        # packed u32 sign-bitmask of the whole 64x64 volume to feed the
        # next conv's fusion (profiled at 1.1 ms/branch of pure HBM
        # traffic in the round-3 embed trace)
        alpha = self.leaky_alpha
        lrelu = lambda v: jnp.maximum(v, alpha * v)
        b, t, h, w, c = x.shape
        c1, c2, c3 = self.channels

        # cast to the compute dtype BEFORE padding: the convs cast anyway,
        # and padding fp32 then casting doubles the pad's HBM traffic
        x = x.astype(self.dtype)
        x = jnp.pad(x, ((0, 0), (0, 0), (self.pad, self.pad),
                        (self.pad, self.pad), (0, 0)))

        # Throughout the frame stream, lrelu is applied AFTER max-pool /
        # set-pool instead of before (the reference order). Exact by
        # monotonicity: max(f(x_i)) == f(max(x_i)) for the non-decreasing
        # rounded leaky-relu, and it runs the activation on 4x (pool) /
        # 25x (set pool) less data.

        pool = max_pool_2x2  # backend-aware: ops/pooling.py

        # --- frame stream, stage 1 (TimeDistributed == unit-T NDHWC convs)
        a = lrelu(self._conv(c1, 5, "a_conv1")(x))
        a = self._conv(c1, 3, "a_conv2")(a)
        a = lrelu(pool(a))                                     # (B, T, 32, 32, c1)

        # --- set stream, stage 1
        sb = _set_max(a, self.seq_axis)                        # set pool
        sb = lrelu(self._bconv(c2, 3, "b_conv1")(sb))
        sb = self._bconv(c2, 3, "b_conv2")(sb)
        sb = lrelu(max_pool_2x2(sb))                           # (B, 16, 16, c2)

        # --- frame stream, stage 2
        a = lrelu(self._conv(c2, 3, "a_conv3")(a))
        a = self._conv(c2, 3, "a_conv4")(a)
        a = lrelu(pool(a))                                     # (B, T, 16, 16, c2)

        sb = sb + _set_max(a, self.seq_axis)                   # residual add
        sb = lrelu(self._bconv(c3, 3, "b_conv3")(sb))
        sb = lrelu(self._bconv(c3, 3, "b_conv4")(sb))          # (B, 16, 16, c3)

        # --- frame stream, stage 3 + final set pool
        a = lrelu(self._conv(c3, 3, "a_conv5")(a))
        a = self._conv(c3, 3, "a_conv6")(a)
        sa = lrelu(_set_max(a, self.seq_axis))                 # (B, 16, 16, c3)

        sb = sb + sa

        # --- HPP on both streams, interleaved (a_bin, b_bin) per bin size
        # exactly like the reference's feature list (mj_uwyhNets_ba.py:468-480).
        feats = []
        for nb in self.hpp_bins:
            feats.append(_hpp(sa, nb))
            feats.append(_hpp(sb, nb))
        parts = jnp.concatenate(feats, axis=1)                  # (B, 62, c3)

        if self.moe_experts > 0:
            # --- MoE part projection: (batch, part) tokens route top-1
            # over E shared expert matrices (ops/moe.py).  Static capacity
            # keeps every shape trace-time constant; under expert
            # parallelism the E axis is mesh-sharded (parallel/expert.py).
            from ugaitnet_tpu.ops.moe import moe_capacity, moe_project
            p, cdim = parts.shape[1], parts.shape[2]
            cap = moe_capacity(b * p, self.moe_experts,
                               self.moe_capacity_factor)
            router_w = self.param("router", glorot,
                                  (cdim, self.moe_experts), jnp.float32)
            expert_w = self.param(
                "expert_proj", glorot,
                (self.moe_experts, cdim, self.part_dim), jnp.float32)
            out, aux, _ = moe_project(
                parts.reshape(b * p, cdim), router_w,
                expert_w.astype(self.dtype), cap)
            if not self.is_initializing():
                # no-op unless the caller passes mutable=["moe"]
                self.sow("moe", "aux", aux)
            return out.reshape(b, p, self.part_dim).astype(jnp.float32)

        # --- per-part projection: one einsum over all parts (MatMul parity).
        kernel = self.param(
            "part_proj", glorot,
            (parts.shape[1], parts.shape[2], self.part_dim), jnp.float32)
        out = jnp.einsum("bpc,pcd->bpd", parts.astype(self.dtype),
                         kernel.astype(self.dtype),
                         preferred_element_type=jnp.float32)
        return out.astype(jnp.float32)


def _hpp(fmap: jax.Array, num_bin: int) -> jax.Array:
    """One pyramid level: (B, H, W, C) -> (B, num_bin, C), mean+max per strip.

    The reference reshapes the (H, W) grid row-major into `num_bin` strips
    and reduces over everything inside a strip (mj_uwyhNets_ba.py:473-478).
    """
    b, h, w, c = fmap.shape
    strips = fmap.reshape(b, num_bin, (h * w) // num_bin, c)
    return jnp.mean(strips, axis=2) + jnp.max(strips, axis=2)
