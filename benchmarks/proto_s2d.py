"""Prototype: stage-1 convs in 2x2 space-to-depth (s2d) form.

Motivation (round-3 trace, /tmp/train_trace): conv1's weight gradient runs
at 3-6.5 TF (6.0 ms per branch of the 108 ms step) because Ci<=2 starves
XLA's NDHWC filter-grad emitter; conv1 forward is similarly K=50-bound
(17-33 TF).  A 5x5 conv on (64,64,ci) is EXACTLY a 3x3 conv on the 2x2
space-to-depth layout (32,32,4ci) -> (32,32,4co): every product x*w is
preserved, only re-indexed.  That rewrites conv1 as (3,3,8,128) — the
shape class where XLA's conv AND filter-grad emitters run at 150-190 TF —
for 1.44x dense FLOPs (the phase-shifted kernel w2 is 69% dense).

Variants measured on the real stage-1 chain (pad -> conv1 -> lrelu ->
conv2 -> pool -> lrelu), fwd and fwd+wgrad:
  V0: current 5D unit-time NDHWC (models/gaitset.py FrameConv)
  VA: conv1 in s2d + depth-to-space, conv2/pool unchanged
  VB: conv1 AND conv2 in s2d (conv2 becomes (3,3,128,128), 25% dense =
      4x FLOPs), 2x2 maxpool == free max over the 4 phase channels, no
      d2s ever materialized
Plus isolated conv1-wgrad timings for each form.

Run: python benchmarks/proto_s2d.py

RESULT (v5e, 2026-08-17): numerics exact (maxerr = bf16 reorder noise)
but RETIRED — XLA's conv emitter keys on ci, not co: the (3,3,8,128)
conv measures 10.4 TF standalone (not the hoped 150+), s2d costs 2.0 ms
and d2s 7.9 ms, and the chains measure fwd V0 6.2 / VA 10.0 / VB 10.2 ms,
fwd+wgrad 23.4 / 25.8 / 37.0 ms.  Full analysis: benchmarks/BUDGET.md.
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax import lax


def timeit(f, *args, n=20):
    def sync(v):
        leaves = jax.tree_util.tree_leaves(v)
        float(jnp.sum(leaves[0].astype(jnp.float32).ravel()[:8]))
    sync(f(*args))
    t0 = time.perf_counter()
    for _ in range(n - 1):
        f(*args)
    sync(f(*args))
    return (time.perf_counter() - t0) / n


# ---------------------------------------------------------------- helpers
def conv5d(x, w):
    return lax.conv_general_dilated(
        x, w[None], (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.bfloat16)


def conv5d_valid(x, w):
    return lax.conv_general_dilated(
        x, w[None], (1, 1, 1), "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.bfloat16)


def lrelu(v):
    return jnp.maximum(v, 0.3 * v)


def pool(v):
    return lax.reduce_window(v, -jnp.inf, lax.max, (1, 1, 2, 2, 1),
                             (1, 1, 2, 2, 1), "VALID")


def s2d(x):
    """(B,T,2H,2W,C) -> (B,T,H,W,4C), phase-major channels (qh,qw,c)."""
    b, t, h2, w2, c = x.shape
    x = x.reshape(b, t, h2 // 2, 2, w2 // 2, 2, c)
    x = jnp.transpose(x, (0, 1, 2, 4, 3, 5, 6))
    return x.reshape(b, t, h2 // 2, w2 // 2, 4 * c)


def d2s(y):
    """(B,T,H,W,4C) phase-major (ph,pw,c) -> (B,T,2H,2W,C)."""
    b, t, h, w, c4 = y.shape
    c = c4 // 4
    y = y.reshape(b, t, h, w, 2, 2, c)
    y = jnp.transpose(y, (0, 1, 2, 4, 3, 5, 6))
    return y.reshape(b, t, 2 * h, 2 * w, c)


def _phase_maps(k):
    """Index map for the s2d kernel: I[dh, q, p] = tap index or k (pad slot).

    s2d with SAME-style explicit pre-pad: source row 2(i+dh)+q - shift must
    equal 2i+p + (ky - off) ... for k=5 (off=0, input pre-padded by 2):
    tap = 2dh + q - p;   for k=3 (pad 1 folded into s2d pad): tap =
    2dh + q - p - 1.  Entries outside [0,k) point at the zero pad slot k.
    """
    off = 1 if k == 3 else 0
    idx = np.full((3, 2, 2), k, np.int32)
    for dh in range(3):
        for q in range(2):
            for p in range(2):
                t = 2 * dh + q - p - off
                if 0 <= t < k:
                    idx[dh, q, p] = t
    return jnp.asarray(idx)


def assemble_w2(w, k):
    """(k,k,ci,co) -> s2d kernel (3,3,4ci,4co), phase-major both sides.

    w2[dh,dw,(qh,qw,ci),(ph,pw,co)] = w[Ih[dh,qh,ph], Iw[dw,qw,pw], ci, co]
    (zero where the index map points at the pad slot).  Differentiable:
    the take's VJP is a scatter-add back onto the (k,k,ci,co) param.
    """
    ih = _phase_maps(k)
    ci, co = w.shape[2], w.shape[3]
    wp = jnp.pad(w, ((0, 1), (0, 1), (0, 0), (0, 0)))      # pad slot = k
    # gather: result [dh,qh,ph, dw,qw,pw, ci, co]
    g = wp[ih[:, :, :, None, None, None], ih[None, None, None, :, :, :]]
    # -> [dh, dw, qh, qw, ci, ph, pw, co]
    g = jnp.transpose(g, (0, 3, 1, 4, 6, 2, 5, 7))
    return g.reshape(3, 3, 4 * ci, 4 * co)


# ---------------------------------------------------------------- variants
def stage1_v0(x, w1, w2):
    xp = jnp.pad(x, ((0, 0), (0, 0), (2, 2), (2, 2), (0, 0)))
    a = lrelu(conv5d(xp, w1))
    a = conv5d(a, w2)
    return lrelu(pool(a))


def stage1_va(x, w1, w2):
    # conv1 in s2d: explicit SAME pad 2 (60+2pad+2same = 68), s2d -> 34x34,
    # 3x3 VALID -> 32x32x128 == 64x64x32
    xp = jnp.pad(x, ((0, 0), (0, 0), (4, 4), (4, 4), (0, 0)))
    y2 = conv5d_valid(s2d(xp), assemble_w2(w1, 5))
    a = lrelu(d2s(y2))
    a = conv5d(a, w2)
    return lrelu(pool(a))


def stage1_vb(x, w1, w2):
    xp = jnp.pad(x, ((0, 0), (0, 0), (4, 4), (4, 4), (0, 0)))
    y2 = lrelu(conv5d_valid(s2d(xp), assemble_w2(w1, 5)))   # (.,32,32,128)
    # conv2 in s2d: SAME pad 1 on the 64-grid == pad 1 on the s2d grid
    # with the tap offset folded into the index map (see _phase_maps)
    y2p = jnp.pad(y2, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)))
    z2 = conv5d_valid(y2p, assemble_w2(w2, 3))              # (.,32,32,128)
    # 2x2 spatial pool == max over the 4 phase channels: exact, no d2s
    b, t, h, w, _ = z2.shape
    z = jnp.max(z2.reshape(b, t, h, w, 4, 32), axis=4)
    return lrelu(z)


# ---------------------------------------------------------------- bench
def run(ci, name, B=120, T=25):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, T, 60, 60, ci).astype(np.float32)
                    ).astype(jnp.bfloat16)
    w1 = jnp.asarray((rng.randn(5, 5, ci, 32) * .1).astype(np.float32))
    w2 = jnp.asarray((rng.randn(3, 3, 32, 32) * .1).astype(np.float32))
    w1b, w2b = w1.astype(jnp.bfloat16), w2.astype(jnp.bfloat16)

    fns = {"V0": stage1_v0, "VA": stage1_va, "VB": stage1_vb}
    outs = {}
    print(f"--- {name} branch (ci={ci}, B={B}, T={T}) ---")
    for tag, fn in fns.items():
        f = jax.jit(fn)
        outs[tag] = f(x, w1b, w2b)
        t = timeit(f, x, w1b, w2b)
        print(f"  {tag} fwd       : {t*1e3:7.2f} ms")
    for tag in ("VA", "VB"):
        err = float(jnp.max(jnp.abs(outs[tag].astype(jnp.float32)
                                    - outs["V0"].astype(jnp.float32))))
        print(f"  {tag} vs V0 maxerr: {err:.3e}")

    # fwd + weight gradients (the train-step shape of the problem)
    for tag, fn in fns.items():
        def loss(ws, fn=fn):
            return jnp.sum(fn(x, ws[0].astype(jnp.bfloat16),
                              ws[1].astype(jnp.bfloat16))
                           .astype(jnp.float32))
        g = jax.jit(jax.grad(loss))
        gv = g((w1, w2))
        t = timeit(g, (w1, w2))
        print(f"  {tag} fwd+wgrad : {t*1e3:7.2f} ms   "
              f"|dw1|={float(jnp.sum(jnp.abs(gv[0]))):.1f}")
    return outs


def main():
    try:
        from ugaitnet_tpu.core.runtime import setup_compilation_cache
        setup_compilation_cache()
    except Exception:
        pass
    print("device:", jax.devices()[0])
    run(2, "of")
    run(1, "gray")


if __name__ == "__main__":
    main()
