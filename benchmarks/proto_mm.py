"""E1: pallas pure-matmul dense ceiling at conv-like shapes.
E2: is transpose (B,T,H,W,C)->(T,H,W,C,B) a free bitcast into pallas?

Run: python benchmarks/proto_mm.py
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
        float(jnp.sum(v[:1, :1].astype(jnp.float32)))
    sync(f(*args))
    t0 = time.perf_counter()
    for _ in range(n - 1):
        f(*args)
    sync(f(*args))
    return (time.perf_counter() - t0) / n


# ---------------------------------------------------------------- E1
def _mm_kernel(x_ref, w_ref, o_ref, nk: int):
    acc = jnp.zeros((o_ref.shape[0], 128), jnp.float32)
    for k in range(nk):
        acc += jnp.dot(x_ref[:, k * 128:(k + 1) * 128], w_ref[k],
                       preferred_element_type=jnp.float32)
    o_ref[...] = acc.astype(jnp.bfloat16)


def e1(rng):
    for (mt, kk) in ((512, 1152), (1024, 1152), (2048, 1152), (1024, 576),
                     (1024, 2304), (4096, 1152)):
        m = 256 * 1024 // mt * mt  # ~256k rows total
        key = jax.random.PRNGKey(0)
        x = (jax.random.normal(key, (m, kk), jnp.bfloat16) * 0.1)
        w = (jax.random.normal(key, (kk // 128, 128, 128), jnp.bfloat16)
             * 0.1)
        f = jax.jit(functools.partial(_mm_call, mt=mt, kk=kk))
        t = timeit(f, x, w)
        fl = 2 * m * kk * 128
        print(f"E1 M-tile {mt} K {kk}: {t*1e3:6.2f} ms  {fl/t/1e12:5.1f} TF")


def _mm_call(x, w, mt, kk):
    m = x.shape[0]
    return pl.pallas_call(
        functools.partial(_mm_kernel, nk=kk // 128),
        grid=(m // mt,),
        in_specs=[
            pl.BlockSpec((mt, kk), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kk // 128, 128, 128), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((mt, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, 128), jnp.bfloat16),
    )(x, w)


# ---------------------------------------------------------------- E2
def _copy_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...] * 2.0


def e2(rng):
    B, T = 128, 25
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, 32, 32, 32),
                          jnp.bfloat16) * 0.1

    def with_transpose(v):
        vt = jnp.transpose(v, (1, 2, 3, 4, 0))      # (T,H,W,C,B) b-minor
        flat = vt.reshape(T * 32 * 32 * 32, B)
        blk = 4096
        out = pl.pallas_call(
            _copy_kernel,
            grid=(T * 32 * 32 * 32 // blk,),
            in_specs=[pl.BlockSpec((blk, B), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((blk, B), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((T * 32 * 32 * 32, B),
                                           jnp.bfloat16),
        )(flat)
        return out

    def xla_only(v):
        return v * 2.0

    t1 = timeit(jax.jit(with_transpose), x)
    t2 = timeit(jax.jit(xla_only), x)
    sz = x.size * 2 * 2 / 1e9
    print(f"E2 transpose+pallas x2: {t1*1e3:6.2f} ms ({sz/t1:5.0f} GB/s)  "
          f"xla x2: {t2*1e3:6.2f} ms ({sz/t2:5.0f} GB/s)")


if __name__ == "__main__":
    try:
        from ugaitnet_tpu.core.runtime import setup_compilation_cache
        setup_compilation_cache()
    except Exception:
        pass
    rng = np.random.RandomState(0)
    import os
    if os.environ.get("E2_ONLY"):
        e2(rng)
    else:
        e1(rng)
        e2(rng)
