"""Prototype the fused pool+lrelu+setmax "stage tail" pallas kernel.

Consumes the conv output in XLA's b-minor layout via a free bitcast
(transpose (B,T,H,W,C)->(T,H,W,C,B) + reshape), emits BOTH the per-frame
pooled/activated stream and the set-pooled (max over T) map, reading the
big tensor exactly once.

Run: python benchmarks/proto_tail.py
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(f, *args, n=30):
    def sync(v):
        if isinstance(v, tuple):
            v = v[0]
        float(jnp.sum(v.astype(jnp.float32)[:1, :1]))
    sync(f(*args))
    t0 = time.perf_counter()
    for _ in range(n - 1):
        f(*args)
    sync(f(*args))
    return (time.perf_counter() - t0) / n


def _tail_kernel(x_ref, o1_ref, o2_ref, *, ih: int, w: int, c: int,
                 alpha: float):
    """x block: (ih*w*c, B) rows=(i,j,ch); pool 2x2 + lrelu -> o1;
    running max into o2 (revisited across the t grid dim)."""
    t = pl.program_id(1)
    b = x_ref.shape[-1]
    rc = w * c
    # slice-wise over i-row pairs keeps the VMEM value stack ~rc-sized so
    # the input block can be several MB (mosaic charges whole-block values
    # against the 16M scoped-vmem limit otherwise)
    for ip in range(ih // 2):
        row = jnp.maximum(x_ref[(2 * ip) * rc:(2 * ip + 1) * rc, :],
                          x_ref[(2 * ip + 1) * rc:(2 * ip + 2) * rc, :])
        v = row.reshape(w // 2, 2, c, b)
        pooled = jnp.max(v, axis=1).reshape(rc // 2, b)
        # lrelu as max(x, a*x) (a<1): avoids bf16 compares, which mosaic
        # rejects in packed (8,128,2) vectors
        act = jnp.maximum(pooled, alpha * pooled)
        sl = slice(ip * (rc // 2), (ip + 1) * (rc // 2))
        o1_ref[sl, :] = act

        @pl.when(t == 0)
        def _():
            o2_ref[sl, :] = act

        @pl.when(t > 0)
        def _():
            o2_ref[sl, :] = jnp.maximum(o2_ref[sl, :], act)


def tail(y, ih=4, alpha=0.3):
    """y: (B, T, H, W, C) -> (pooled (B,T,H/2,W/2,C), setmax (B,H/2,W/2,C))."""
    b, t, h, w, c = y.shape
    yt = jnp.transpose(y, (1, 2, 3, 4, 0)).reshape(t * h * w * c, b)
    nchunk = h // ih
    blk = ih * w * c
    oblk = blk // 4
    o1, o2 = pl.pallas_call(
        functools.partial(_tail_kernel, ih=ih, w=w, c=c, alpha=alpha),
        grid=(nchunk, t),
        in_specs=[pl.BlockSpec((blk, b), lambda ic, tt: (tt * nchunk + ic, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((oblk, b), lambda ic, tt: (tt * nchunk + ic, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((oblk, b), lambda ic, tt: (ic, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((t * h * w * c // 4, b), jnp.bfloat16),
            jax.ShapeDtypeStruct((h * w * c // 4, b), jnp.bfloat16),
        ),
    )(yt)
    pooled = jnp.transpose(
        o1.reshape(t, h // 2, w // 2, c, b), (4, 0, 1, 2, 3))
    setm = jnp.transpose(o2.reshape(h // 2, w // 2, c, b), (3, 0, 1, 2))
    return pooled, setm


def xla_chain(y, alpha=0.3):
    import flax.linen as nn
    from jax import lax
    a = nn.max_pool(y, (1, 2, 2), strides=(1, 2, 2))
    a = nn.leaky_relu(a, negative_slope=alpha)
    t = a.shape[1]
    sb = jnp.squeeze(lax.reduce_window(a, -jnp.inf, lax.max,
                                       (1, t, 1, 1, 1), (1, t, 1, 1, 1),
                                       "VALID"), 1)
    return a, sb


def main():
    try:
        from ugaitnet_tpu.core.runtime import setup_compilation_cache
        setup_compilation_cache()
    except Exception:
        pass
    B, T = 128, 25
    for (h, c, ih) in ((64, 32, 8), (32, 64, 8), (16, 128, 8)):
        y = jax.random.normal(jax.random.PRNGKey(0), (B, T, h, h, c),
                              jnp.bfloat16)
        fp = jax.jit(functools.partial(tail, ih=ih))
        fx = jax.jit(xla_chain)
        p1, s1 = fp(y)
        p2, s2 = fx(y)
        e1 = float(jnp.max(jnp.abs(p1.astype(jnp.float32)
                                   - p2.astype(jnp.float32))))
        e2 = float(jnp.max(jnp.abs(s1.astype(jnp.float32)
                                   - s2.astype(jnp.float32))))
        tp = timeit(fp, y)
        tx = timeit(fx, y)
        gb = y.size * 2 * 1.3 / 1e9
        print(f"H={h} C={c}: pallas {tp*1e3:6.2f} ms ({gb/tp:4.0f} GB/s)  "
              f"xla {tx*1e3:6.2f} ms   err {e1:.1e}/{e2:.1e}")


if __name__ == "__main__":
    main()
