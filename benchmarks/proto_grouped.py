"""Measure: can grouped convs merge the two branches' same-shape convs?

The two gaitset branches run IDENTICAL conv shapes from stage 2 on
(separate weights).  XLA's v5e conv rate keys on out-channel count
(BUDGET.md ladder: 32ch@64^2 74 TF, 64ch@32^2 150 TF ...), so merging the
branches into ONE conv could lift the rate — IF the emitter runs a
feature_group_count=2 conv at the doubled-width rate rather than
decomposing per group.

Variants per stage shape (all exact, per-branch weights preserved):
  sep : two separate convs (today)                 — 2F flops total
  grp : one conv, channels concat, fgc=2           — 2F flops total
  bgrp: one conv, batch concat, batch_group=2      — 2F flops total
  blk : block-diagonal dense filter                — 4F flops (rate must
        exceed 2x the sep rate to win; round-2 predicted wash)

Measured on v5e via device-side fori_loop (50 iters, carry-chained so
nothing hoists), bf16.
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def timed(fn, *args, iters=50, trials=3):
    @jax.jit
    def loop(*a):
        def body(i, c):
            x = a[0] + c.astype(a[0].dtype) * jnp.bfloat16(1e-30)
            return jnp.sum(fn(x, *a[1:])).astype(jnp.float32)
        return lax.fori_loop(0, iters, body, jnp.float32(0))
    float(loop(*args))
    best = 1e9
    for _ in range(trials):
        t0 = time.perf_counter()
        float(loop(*args))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def conv5d(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.bfloat16)


def conv5d_g(x, w, g):
    return lax.conv_general_dilated(
        x, w, (1, 1, 1), "SAME", feature_group_count=g,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.bfloat16)


def conv5d_bg(x, w, g):
    return lax.conv_general_dilated(
        x, w, (1, 1, 1), "SAME", batch_group_count=g,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.bfloat16)


def main():
    from ugaitnet_tpu.core.runtime import setup_compilation_cache
    setup_compilation_cache()
    rng = np.random.RandomState(0)
    B, T = 128, 25
    k = 3
    # (name, spatial, cin, cout) — the branch stage shapes from BUDGET.md
    stages = [("conv2 64^2 32->32", 64, 32, 32),
              ("conv3 32^2 32->64", 32, 32, 64),
              ("conv4 32^2 64->64", 32, 64, 64),
              ("conv5 16^2 64->128", 16, 64, 128),
              ("conv6 16^2 128->128", 16, 128, 128)]
    for name, s, ci, co in stages:
        x1 = jnp.asarray(rng.randn(B, T, s, s, ci), jnp.bfloat16)
        x2 = jnp.asarray(rng.randn(B, T, s, s, ci), jnp.bfloat16)
        w1 = jnp.asarray(rng.randn(1, k, k, ci, co) * 0.05, jnp.bfloat16)
        w2 = jnp.asarray(rng.randn(1, k, k, ci, co) * 0.05, jnp.bfloat16)
        F = 2 * B * T * s * s * k * k * ci * co * 2  # both branches, MAC=2

        dt_sep = timed(lambda x, w, v: conv5d(x, w) + conv5d(x, v),
                       x1, w1, w2)  # same input twice: isolates conv rate
        xc = jnp.concatenate([x1, x2], axis=-1)
        wg = jnp.concatenate([w1, w2], axis=-1)  # (1,k,k,ci,2co), fgc=2
        dt_grp = timed(lambda x, w: conv5d_g(x, w, 2), xc, wg)
        xb = jnp.concatenate([x1, x2], axis=0)
        dt_bgrp = timed(lambda x, w: conv5d_bg(x, w, 2), xb, wg)
        # block-diag dense: (1,k,k,2ci,2co), zero off-diagonal
        wb = jnp.zeros((1, k, k, 2 * ci, 2 * co), jnp.bfloat16)
        wb = wb.at[..., :ci, :co].set(w1).at[..., ci:, co:].set(w2)
        dt_blk = timed(lambda x, w: conv5d(x, w), xc, wb)

        def tf(dt, flops=F):
            return flops / dt / 1e12
        print(f"{name}: sep {dt_sep*1e3:6.2f} ms ({tf(dt_sep):5.1f} TF) | "
              f"grp {dt_grp*1e3:6.2f} ({tf(dt_grp):5.1f}) | "
              f"bgrp {dt_bgrp*1e3:6.2f} ({tf(dt_bgrp):5.1f}) | "
              f"blk {dt_blk*1e3:6.2f} ({tf(dt_blk, 2*F):5.1f} dense TF, "
              f"useful {tf(dt_blk):5.1f})", flush=True)


if __name__ == "__main__":
    main()
