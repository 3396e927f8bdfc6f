"""Pallas TPU kernel for the batch-all triplet loss.

The XLA formulation (ops/triplet.py) materializes a (chunk, B, B, B) triplet
tensor in HBM per part-chunk; this kernel keeps everything in VMEM: one grid
program per part computes the pairwise-distance matrix with an MXU matmul
and reduces the masked triplet hinge on the fly over statically-unrolled
anchor blocks, writing back only a per-part (sum, count) pair — O(P*B*D)
HBM traffic instead of O(P*B^3).

Each anchor block's (A, B, B) triplet tensor is laid out 2D — rows (a, k),
lanes j (_block_2d) — because mosaic relayouts lane-resident vectors badly
when broadcast along a new minor dim (the rank-3 d_a[:, :, None] form cost
~2x vs XLA).  With that layout the kernel's fwd+grad beats the chunked XLA
path at the flagship (62, 120, 256) on v5e (~2.1 vs ~2.3 ms), and it is
the TPU training default (ops/triplet.py:make_triplet_loss).

Backward is a second kernel with the analytic gradient:
  t[i,j,k] = margin + d[i,j] - d[i,k],  active = valid & t > 0
  dL/dd[i,m] = #active(i, j=m, ·) - #active(i, ·, k=m)      (per part, scaled
               by upstream/count_p/P)
  dL/dx = (diag(rowsum W) - W) @ x with W[i,j] = (g[i,j]+g[j,i])/d[i,j]

Both kernels mask padded batch rows (labels are padded with -1); batches
up to 128 run the single-instance kernels (padded to 128).  For larger
batches GRIDDED variants exist — grid = (parts, anchor blocks) so each
step's (A*bp, bp) tensors fit scoped VMEM at any bp <= MAX_GRID_B, the
backward emitting per-row distance gradients that an XLA epilogue
symmetrizes (O(B^2 D)) — but they measured SLOWER than the XLA chunked
formulation on v5e (B=256: 19.5 vs 18.2 ms; B=384: 75.0 vs 69.5 ms
fwd+grad), so the default dispatch routes B > 128 to XLA; the gridded
path stays available via grid_variant=True (see
batch_all_triplet_loss_pallas for the measured retirement note).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _guarded_dist(d2):
    """sqrt with the zero-distance guard — single-sourced so the epsilon
    and the zero handling can never drift between kernel variants."""
    d2 = jnp.maximum(d2, 0.0)
    zero = d2 <= 0.0
    return jnp.where(zero, 0.0, jnp.sqrt(d2 + jnp.where(zero, 1e-16, 0.0)))


def _dist_and_masks(emb, labels, bp):
    """Shared: guarded pairwise distances + validity masks in VMEM."""
    x = emb.astype(jnp.float32)
    sq = jnp.sum(x * x, axis=1)
    dot = jnp.dot(x, x.T, preferred_element_type=jnp.float32)
    dist = _guarded_dist(sq[:, None] + sq[None, :] - 2.0 * dot)

    # masks as float32 throughout — mosaic only supports minor-dim
    # broadcasts on 32-bit types, so no bool[:, None] anywhere.
    lab2 = labels.reshape(bp, 1).astype(jnp.int32)
    labr = labels.reshape(1, bp).astype(jnp.int32)
    validf = ((lab2 >= 0) & (labr >= 0)).astype(jnp.float32)
    eq = (lab2 == labr).astype(jnp.float32)
    same = eq * validf
    diff = (1.0 - eq) * validf
    return dist, same, diff


# Anchor-block sizes for the single-instance (bp=128) kernels: the 2D
# block tensors are (A*bp, bp) fp32, and with the statically unrolled
# block loop mosaic's scoped-vmem accounting keeps several blocks'
# intermediates live — at bp=256 the unrolled backward peaks at ~58M vs
# the 16M limit even with tiny blocks.  Batches above 128 instead run the
# GRIDDED variant below (one grid step per anchor block, nothing
# unrolled), up to MAX_GRID_B; only beyond that do they fall back to the
# XLA formulation.
FWD_BLOCK = 32
BWD_BLOCK = 16
# Hardware-validated upper bound: at bp=512 one grid step's (1024, 512)
# fp32 intermediates sit right at the 16M scoped-vmem budget, and Mosaic
# accepts it — fwd/grad parity vs XLA measured on v5e at B=384 AND B=512
# (maxerr 3.5e-7 / 2.2e-7).  Raising this further needs a re-run of that
# probe on hardware first (interpret mode does not check VMEM).
MAX_GRID_B = 512


def _grid_ablock(bp: int) -> int:
    """Anchor rows per grid step: keeps the ~8 live (A*bp, bp) fp32
    intermediates of one step within the 16M scoped-vmem budget.  Always
    <= 8 for bp > 128 — the gridded backward pads its rows into an
    (8, bp) output tile (Mosaic sublane tiling)."""
    a = max(1, 1024 // bp)
    while bp % a:
        a -= 1
    assert a <= 8, (bp, a)
    return a


def _k_onehot(a: int, bp: int):
    """K1[(a,k), m] = 1.0 iff m == k — constant, hoisted out of the block
    loop by the compiler."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (a * bp, bp), 1)
    row_k = jax.lax.broadcasted_iota(jnp.int32, (a * bp, bp), 0) % bp
    return (lane == row_k).astype(jnp.float32)


def _block_2d(d_a, pos, neg, margin, bp, k1):
    """The (A, B, B) triplet tensor of one anchor block laid out 2D:
    rows (a, k), lanes j.  Mosaic relayouts lane-resident vectors badly
    when broadcast along a NEW minor dim (the old rank-3 d_a[:, :, None]
    form cost ~2x vs XLA), and rejects (A, B)->(A*B, 1) reshapes outright
    (lane->sublane shape cast); the per-row d[a,k] / neg[a,k] columns are
    instead extracted by a one-hot mask multiply + lane-sum, which stays
    in the native 2D layout."""
    a = d_a.shape[0]
    rep_d = jnp.broadcast_to(d_a[:, None, :], (a, bp, bp)).reshape(a * bp, bp)
    rep_p = jnp.broadcast_to(pos[:, None, :], (a, bp, bp)).reshape(a * bp, bp)
    rep_n = jnp.broadcast_to(neg[:, None, :], (a, bp, bp)).reshape(a * bp, bp)
    col_d = jnp.sum(rep_d * k1, axis=1, keepdims=True)     # d[a,k] per row
    col_n = jnp.sum(rep_n * k1, axis=1, keepdims=True)     # neg[a,k] per row
    # t2[(a,k), j] = margin + d[a,j] - d[a,k]
    t2 = margin + rep_d - col_d
    act = rep_p * col_n * (t2 > 0.0).astype(jnp.float32)
    return t2, act


def _o_mat(a_blk, bp):
    """O[a, (a2,k)] = 1 iff a2 == a: block row-sum as one MXU matmul
    (summing act over k for fixed (a, j) — a cross-sublane segmented
    reduction the VPU has no cheap form for)."""
    o_cols = jax.lax.broadcasted_iota(
        jnp.int32, (a_blk, a_blk * bp), 1) // bp
    o_rows = jax.lax.broadcasted_iota(
        jnp.int32, (a_blk, a_blk * bp), 0)
    return (o_cols == o_rows).astype(jnp.float32)


def _gdist_rows(act, o_mat, k1):
    """Distance-gradient rows of one anchor block (shared by the unrolled
    and gridded backward kernels):
      g[a, m] = #act(a, j=m, ·) - #act(a, ·, k=m)  =  term1 - term2.
    term2's row-sums rs[(a,k)] unflatten to (A, B) without the lane->
    sublane reshape mosaic rejects: broadcast rs over lanes, mask to the
    k-th lane, and let the block-row one-hot matmul collect them."""
    term1 = jnp.dot(o_mat, act, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)        # (A, B)
    rs = jnp.sum(act, axis=1, keepdims=True)                    # ((A*B), 1)
    term2 = jnp.dot(o_mat, rs * k1, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)        # (A, B)
    return term1 - term2


def _fwd_kernel(margin_ref, labels_ref, emb_ref, out_ref):
    bp = emb_ref.shape[0]
    margin = margin_ref[0]
    dist, same, diff = _dist_and_masks(emb_ref[...], labels_ref[...], bp)

    a_blk = FWD_BLOCK
    k1 = _k_onehot(a_blk, bp)

    # bp is padded to a multiple of 128, so a_blk (a power of two <= 32)
    # divides it; padded anchors have label -1 and contribute nothing
    # (their pos/neg masks are zero).  The block count is STATIC, so a
    # python loop gives static row slices — no one-hot selection matmuls.
    s = jnp.float32(0.0)
    c = jnp.float32(0.0)
    for blk in range(bp // a_blk):
        i0, i1 = blk * a_blk, (blk + 1) * a_blk
        t2, act = _block_2d(dist[i0:i1], same[i0:i1], diff[i0:i1],
                            margin, bp, k1)
        s = s + jnp.sum(t2 * act)
        c = c + jnp.sum(act)
    # (8, 128) output tile per part: row 0 lane 0 = sum, row 1 lane 0 = count
    # (TPU blocked outputs must fill a full (8, 128) fp32 tile).
    rows = jnp.concatenate([jnp.full((1, 128), s, jnp.float32),
                            jnp.full((1, 128), c, jnp.float32),
                            jnp.zeros((6, 128), jnp.float32)], axis=0)
    out_ref[...] = rows


def _bwd_kernel(margin_ref, scale_ref, labels_ref, emb_ref, grad_ref):
    bp = emb_ref.shape[0]
    margin = margin_ref[0]
    scale = scale_ref[pl.program_id(0)]   # upstream/(count_p*P), 0 if cnt==0
    x = emb_ref[...].astype(jnp.float32)
    dist, same, diff = _dist_and_masks(x, labels_ref[...], bp)

    a_blk = BWD_BLOCK
    o_mat = _o_mat(a_blk, bp)
    k1 = _k_onehot(a_blk, bp)

    # static block loop (see _fwd_kernel): rows come from static slices
    # and the per-block gradient rows concatenate back in order.
    g_blocks = []
    for blk in range(bp // a_blk):
        i0, i1 = blk * a_blk, (blk + 1) * a_blk
        _, act = _block_2d(dist[i0:i1], same[i0:i1], diff[i0:i1],
                           margin, bp, k1)                  # ((A*B), B)
        g_blocks.append(_gdist_rows(act, o_mat, k1))

    g_dist = jnp.concatenate(g_blocks, axis=0) * scale

    inv_d = jnp.where(dist > 0.0, 1.0 / jnp.where(dist > 0.0, dist, 1.0),
                      0.0)
    w = (g_dist + g_dist.T) * inv_d
    row = jnp.sum(w, axis=1, keepdims=True)
    grad_ref[...] = row * x - jnp.dot(w, x,
                                      preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------
# Gridded (bp > 128) variant: grid = (parts, anchor blocks).  Each grid
# step handles ONE anchor block — the (A*bp, bp) tensors exist once per
# step instead of once per unrolled block, so VMEM stays flat in bp.
# The backward emits per-anchor-row distance-gradients g_dist (p, bp, bp)
# to HBM; the O(B^2 D) symmetrize + matmul finish runs in XLA
# (_grid_bwd_finish) — the kernel only keeps the O(B^3) triplet part.
#
# Mosaic imposes block-shape tiling the interpreter does not (round-3
# hardware finding): rank-1 blocks must be full-array or a multiple of
# 128, and 2D+ blocks need sublane dims that are multiples of 8 — an
# (a_blk,) anchor-label block or an (a_blk, dp) anchor-row block with
# a_blk in {2, 4} is rejected outright.  The kernels therefore take only
# FULL operands (labels (bp,), emb part (bp, dp)) and extract the anchor
# block in-kernel with a one-hot selector matmul driven by
# pl.program_id(1) (Precision.HIGHEST — the same exact-selection pattern
# o_mat already relies on); the backward writes its a_blk gradient rows
# into an 8-row-padded (8, bp) output tile.


def _anchor_select(a_blk, bp, j):
    """sel[a, m] = 1.0 iff m == j*a_blk + a (fp32 one-hot selector)."""
    cols = jax.lax.broadcasted_iota(jnp.int32, (a_blk, bp), 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (a_blk, bp), 0)
    return (cols == j * a_blk + rows).astype(jnp.float32)


def _rect_dist_and_masks(sel, x, labels, a_blk, bp):
    """Anchor-rows-vs-all distances + validity masks, anchors selected
    in-kernel: xa = sel @ x, la = sel @ labels.  Label compares run in
    fp32 (ids are small ints, exact)."""
    x = x.astype(jnp.float32)
    xa = jnp.dot(sel, x, preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)
    sqa = jnp.sum(xa * xa, axis=1)
    sq = jnp.sum(x * x, axis=1)
    dot = jnp.dot(xa, x.T, preferred_element_type=jnp.float32)
    dist = _guarded_dist(sqa[:, None] + sq[None, :] - 2.0 * dot)
    labf = labels.reshape(bp, 1).astype(jnp.float32)
    la = jnp.dot(sel, labf, preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)      # (a_blk, 1)
    lr = labels.reshape(1, bp).astype(jnp.float32)
    validf = ((la >= 0.0) & (lr >= 0.0)).astype(jnp.float32)
    eq = (la == lr).astype(jnp.float32)
    return dist, eq * validf, (1.0 - eq) * validf


def _fwd_kernel_grid(a_blk, margin_ref, labels_ref, emb_ref, out_ref):
    bp = emb_ref.shape[0]
    margin = margin_ref[0]
    sel = _anchor_select(a_blk, bp, pl.program_id(1))
    dist, pos, neg = _rect_dist_and_masks(
        sel, emb_ref[...], labels_ref[...], a_blk, bp)
    k1 = _k_onehot(a_blk, bp)
    t2, act = _block_2d(dist, pos, neg, margin, bp, k1)
    s = jnp.sum(t2 * act)
    c = jnp.sum(act)
    rows = jnp.concatenate([jnp.full((1, 128), s, jnp.float32),
                            jnp.full((1, 128), c, jnp.float32),
                            jnp.zeros((6, 128), jnp.float32)], axis=0)
    out_ref[...] = rows


def _bwd_kernel_grid(a_blk, margin_ref, labels_ref, emb_ref, gd_ref):
    """Writes UNSCALED g_dist rows for this anchor block:
    g[a, m] = #act(a, j=m, .) - #act(a, ., k=m) — padded to 8 rows."""
    bp = emb_ref.shape[0]
    margin = margin_ref[0]
    sel = _anchor_select(a_blk, bp, pl.program_id(1))
    dist, pos, neg = _rect_dist_and_masks(
        sel, emb_ref[...], labels_ref[...], a_blk, bp)
    k1 = _k_onehot(a_blk, bp)
    _, act = _block_2d(dist, pos, neg, margin, bp, k1)
    g_rows = _gdist_rows(act, _o_mat(a_blk, bp), k1)
    gd_ref[...] = jnp.concatenate(
        [g_rows, jnp.zeros((8 - a_blk, bp), jnp.float32)], axis=0)


def _grid_specs(grid, bp, dp, out_block):
    return pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),             # margin
            pl.BlockSpec(memory_space=pltpu.VMEM),             # labels (Bp,)
            pl.BlockSpec((None, bp, dp), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),             # emb part
        ],
        out_specs=out_block,
    )


def _triplet_fwd_call_grid(emb_pbd, labels, margin, interpret):
    p, b, d = emb_pbd.shape
    bp, dp = _round_up(b, 128), _round_up(d, 128)
    a_blk = _grid_ablock(bp)
    nblk = bp // a_blk
    emb, lab = _pad(emb_pbd, labels, bp, dp)
    spec = _grid_specs(
        (p, nblk), bp, dp,
        pl.BlockSpec((None, None, 8, 128), lambda i, j: (i, j, 0, 0),
                     memory_space=pltpu.VMEM))
    out = pl.pallas_call(
        functools.partial(_fwd_kernel_grid, a_blk), grid_spec=spec,
        out_shape=jax.ShapeDtypeStruct((p, nblk, 8, 128), jnp.float32),
        interpret=interpret,
    )(jnp.asarray([margin], jnp.float32), lab, emb)
    return jnp.sum(out[:, :, 0, 0], axis=1), jnp.sum(out[:, :, 1, 0], axis=1)


def _grid_bwd_finish(emb, g_dist_rows, scale):
    """XLA finish: scale, symmetrize, and apply the distance chain rule.
    O(P B^2 D) matmuls — tiny next to the kernel's O(B^3) part."""
    x = emb.astype(jnp.float32)                       # (p, bp, dp)
    g_dist = g_dist_rows * scale[:, None, None]
    sq = jnp.sum(x * x, axis=2)
    dot = jnp.einsum("pbd,pcd->pbc", x, x, preferred_element_type=jnp.float32)
    d2 = jnp.maximum(sq[:, :, None] + sq[:, None, :] - 2.0 * dot, 0.0)
    dist = jnp.sqrt(jnp.where(d2 > 0, d2, 1.0)) * (d2 > 0)
    inv_d = jnp.where(dist > 0, 1.0 / jnp.where(dist > 0, dist, 1.0), 0.0)
    w = (g_dist + jnp.swapaxes(g_dist, 1, 2)) * inv_d
    row = jnp.sum(w, axis=2, keepdims=True)
    return row * x - jnp.einsum("pbc,pcd->pbd", w, x,
                                preferred_element_type=jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _triplet_pallas_grid(emb_pbd, labels, margin: float, interpret: bool):
    per_sum, per_cnt = _triplet_fwd_call_grid(emb_pbd, labels, margin,
                                              interpret)
    return _combine(per_sum, per_cnt)


def _triplet_grid_vjp_fwd(emb_pbd, labels, margin, interpret):
    per_sum, per_cnt = _triplet_fwd_call_grid(emb_pbd, labels, margin,
                                              interpret)
    return _combine(per_sum, per_cnt), (emb_pbd, labels, per_cnt)


def _triplet_grid_vjp_bwd(margin, interpret, res, g):
    emb_pbd, labels, per_cnt = res
    p, b, d = emb_pbd.shape
    bp, dp = _round_up(b, 128), _round_up(d, 128)
    a_blk = _grid_ablock(bp)
    nblk = bp // a_blk
    emb, lab = _pad(emb_pbd, labels, bp, dp)
    scale = jnp.where(per_cnt > 0, g / (jnp.maximum(per_cnt, 1.0) * p), 0.0)
    spec = _grid_specs(
        (p, nblk), bp, dp,
        pl.BlockSpec((None, None, 8, bp), lambda i, j: (i, j, 0, 0),
                     memory_space=pltpu.VMEM))
    g_tiles = pl.pallas_call(
        functools.partial(_bwd_kernel_grid, a_blk), grid_spec=spec,
        out_shape=jax.ShapeDtypeStruct((p, nblk, 8, bp), jnp.float32),
        interpret=interpret,
    )(jnp.asarray([margin], jnp.float32), lab, emb)
    # un-pad the 8-row tiles back to the (p, bp, bp) row-gradient matrix
    g_rows = g_tiles[:, :, :a_blk, :].reshape(p, bp, bp)
    grad = _grid_bwd_finish(emb, g_rows, scale.astype(jnp.float32))
    return grad[:, :b, :d].astype(emb_pbd.dtype), None


_triplet_pallas_grid.defvjp(_triplet_grid_vjp_fwd, _triplet_grid_vjp_bwd)


def _pad(emb_pbd, labels, bp, dp):
    p, b, d = emb_pbd.shape
    emb = jnp.zeros((p, bp, dp), jnp.float32).at[:, :b, :d].set(
        emb_pbd.astype(jnp.float32))
    lab = jnp.full((bp,), -1, jnp.int32).at[:b].set(
        labels.reshape(-1).astype(jnp.int32))
    return emb, lab


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _triplet_pallas(emb_pbd, labels, margin: float, interpret: bool):
    per_sum, per_cnt = _triplet_fwd_call(emb_pbd, labels, margin, interpret)
    return _combine(per_sum, per_cnt)


def _combine(per_sum, per_cnt):
    per_part = jnp.where(per_cnt > 0, per_sum / jnp.maximum(per_cnt, 1.0),
                         0.0)
    return jnp.mean(per_part)


def _triplet_fwd_call(emb_pbd, labels, margin, interpret):
    p, b, d = emb_pbd.shape
    bp, dp = _round_up(b, 128), _round_up(d, 128)
    emb, lab = _pad(emb_pbd, labels, bp, dp)
    out_shape = jax.ShapeDtypeStruct((p, 8, 128), jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(p,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),            # margin (1,)
            pl.BlockSpec(memory_space=pltpu.VMEM),            # labels (Bp,)
            pl.BlockSpec((None, bp, dp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),            # emb part
        ],
        out_specs=pl.BlockSpec((None, 8, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        _fwd_kernel, grid_spec=grid_spec, out_shape=out_shape,
        interpret=interpret,
    )(jnp.asarray([margin], jnp.float32), lab, emb)
    return out[:, 0, 0], out[:, 1, 0]


def _triplet_vjp_fwd(emb_pbd, labels, margin, interpret):
    per_sum, per_cnt = _triplet_fwd_call(emb_pbd, labels, margin, interpret)
    return _combine(per_sum, per_cnt), (emb_pbd, labels, per_cnt)


def _triplet_vjp_bwd(margin, interpret, res, g):
    emb_pbd, labels, per_cnt = res
    p, b, d = emb_pbd.shape
    bp, dp = _round_up(b, 128), _round_up(d, 128)
    emb, lab = _pad(emb_pbd, labels, bp, dp)
    scale = jnp.where(per_cnt > 0, g / (jnp.maximum(per_cnt, 1.0) * p), 0.0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(p,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),             # margin
            pl.BlockSpec(memory_space=pltpu.SMEM),             # scale (P,)
            pl.BlockSpec(memory_space=pltpu.VMEM),             # labels
            pl.BlockSpec((None, bp, dp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, bp, dp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    grad = pl.pallas_call(
        _bwd_kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((p, bp, dp), jnp.float32),
        interpret=interpret,
    )(jnp.asarray([margin], jnp.float32), scale.astype(jnp.float32), lab,
      emb)
    return grad[:, :b, :d].astype(emb_pbd.dtype), None


_triplet_pallas.defvjp(_triplet_vjp_fwd, _triplet_vjp_bwd)


def batch_all_triplet_loss_pallas(embeddings: jax.Array, labels: jax.Array,
                                  margin: float = 0.2,
                                  interpret: bool = False,
                                  grid_variant: bool = False) -> jax.Array:
    """Drop-in replacement for ops.triplet.batch_all_triplet_loss.

    embeddings: (B, D) or batch-major (B, P, D); labels (B,).
    interpret=True runs the kernels in the Pallas interpreter (CPU tests).
    Batches up to 128 run the single-instance kernels (they beat XLA at
    the flagship shape: 2.1 vs 2.3 ms fwd+grad at (62, 120, 256) on
    v5e).  Larger batches run the XLA formulation: the gridded
    anchor-block variant (`grid_variant=True`) is exact-parity on
    hardware but measured SLOWER than XLA's chunked form there —
    B=256: 19.5 vs 18.2 ms, B=384: 75.0 vs 69.5 ms fwd+grad on v5e
    (round 3).  The O(B^3) HBM traffic the kernel avoids is evidently
    not the binding constraint at these sizes; XLA's fusions stream it
    at full bandwidth while the kernel pays VPU-bound block reductions.
    Kept (with tests) as the measured record + a ready fallback if the
    balance shifts on other hardware.
    """
    if embeddings.shape[0] > 128 and not (grid_variant
                                          and embeddings.shape[0]
                                          <= MAX_GRID_B):
        # route to XLA before the part-major transpose below — the XLA
        # form takes the batch-major layout directly
        from ugaitnet_tpu.ops.triplet import batch_all_triplet_loss
        return batch_all_triplet_loss(embeddings, labels, margin)
    if embeddings.ndim == 2:
        emb = embeddings[None]
    else:
        emb = jnp.transpose(embeddings, (1, 0, 2))
    if embeddings.shape[0] > 128:
        return _triplet_pallas_grid(emb, labels, float(margin), interpret)
    return _triplet_pallas(emb, labels, float(margin), interpret)
