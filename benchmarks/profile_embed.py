"""Stage-wise profile of the flagship preprocess+embed path on the TPU.

Times each piece of the GaitSetBranch forward (at real flagship shapes,
B=128, T=25, both branches folded where relevant) as a standalone jitted
function, so we know exactly where the 37 ms batch budget goes before
writing any kernel.  Run: python benchmarks/profile_embed.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax import lax


def timeit(f, *args, n=30):
    def sync(v):
        if isinstance(v, (tuple, list)):
            v = v[0]
        float(jnp.sum(v.astype(jnp.float32)))

    sync(f(*args))
    t0 = time.perf_counter()
    for _ in range(n - 1):
        f(*args)
    sync(f(*args))
    return (time.perf_counter() - t0) / n


def conv(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.bfloat16)


def main():
    try:
        from ugaitnet_tpu.core.runtime import setup_compilation_cache
        setup_compilation_cache()
    except Exception:
        pass

    rng = np.random.RandomState(0)
    B, T = 128, 25
    M = B * T  # 3200 frames
    rows = []

    def bench(name, gflops, f, *args):
        t = timeit(jax.jit(f), *args)
        tf = gflops / t / 1e3
        rows.append((name, t * 1e3, tf))
        print(f"  {name:34s} {t*1e3:7.2f} ms  {tf:6.1f} TF")

    def arr(shape, dtype=jnp.bfloat16):
        return jnp.asarray((rng.randn(*shape) * 0.1).astype(np.float32)
                           ).astype(dtype)

    print(f"# flagship shapes, M={M} frames, both-branch cost = 2x unless noted")
    # stage 1 (per branch)
    x1 = arr((M, 64, 64, 2))
    w1 = arr((5, 5, 2, 32))
    bench("a_conv1 5x5 2->32 @64", 2 * M * 64 * 64 * 25 * 2 * 32 / 1e9,
          conv, x1, w1)
    a1 = arr((M, 64, 64, 32))
    w2 = arr((3, 3, 32, 32))
    bench("a_conv2 3x3 32->32 @64", 2 * M * 64 * 64 * 9 * 32 * 32 / 1e9,
          conv, a1, w2)
    bench("lrelu+maxpool @64->32 (32ch)", 0,
          lambda v: nn_pool(v), a1)
    # stage 2
    a2 = arr((M, 32, 32, 32))
    w3 = arr((3, 3, 32, 64))
    bench("a_conv3 3x3 32->64 @32", 2 * M * 32 * 32 * 9 * 32 * 64 / 1e9,
          conv, a2, w3)
    a3 = arr((M, 32, 32, 64))
    w4 = arr((3, 3, 64, 64))
    bench("a_conv4 3x3 64->64 @32", 2 * M * 32 * 32 * 9 * 64 * 64 / 1e9,
          conv, a3, w4)
    bench("lrelu+maxpool @32->16 (64ch)", 0, lambda v: nn_pool(v), a3)
    # stage 3
    a4 = arr((M, 16, 16, 64))
    w5 = arr((3, 3, 64, 128))
    bench("a_conv5 3x3 64->128 @16", 2 * M * 16 * 16 * 9 * 64 * 128 / 1e9,
          conv, a4, w5)
    a5 = arr((M, 16, 16, 128))
    w6 = arr((3, 3, 128, 128))
    bench("a_conv6 3x3 128->128 @16", 2 * M * 16 * 16 * 9 * 128 * 128 / 1e9,
          conv, a5, w6)
    # glue
    bench("setmax T=25 @32x32x32", 0,
          lambda v: lax.reduce_window(v, -jnp.inf, lax.max,
                                      (T, 1, 1, 1), (T, 1, 1, 1), "VALID"),
          a2)
    bench("setmax T=25 @16x16x128", 0,
          lambda v: lax.reduce_window(v, -jnp.inf, lax.max,
                                      (T, 1, 1, 1), (T, 1, 1, 1), "VALID"),
          a5)
    # preprocess-side: dequant int16 -> bf16 + pad
    raw = jnp.asarray(rng.randint(-3000, 3000, (B, 50, 60, 60)).astype(np.int16))
    def dequant_pad(r):
        v = r.astype(jnp.bfloat16) / 100.0
        v = v.reshape(B, 25, 2, 60, 60).transpose(0, 1, 3, 4, 2)
        return jnp.pad(v, ((0, 0), (0, 0), (2, 2), (2, 2), (0, 0)))
    bench("dequant+reshape+pad (of)", 0, dequant_pad, raw)

    # full branch + full embed for reference
    from ugaitnet_tpu.models.gaitset import GaitSetBranch
    gs = GaitSetBranch(dtype=jnp.bfloat16)
    xb = arr((B, T, 60, 60, 1), jnp.float32)
    p = gs.init(jax.random.PRNGKey(0), xb)
    bench("full gaitset branch (1ch)", 2 * 7.7 * B, gs.apply, p, xb)

    total_conv = sum(r[1] for r in rows if "conv" in r[0]) * 2
    print(f"\nsum of conv stages x2 branches: {total_conv:.1f} ms")


def nn_pool(v):
    import flax.linen as nn
    return nn.leaky_relu(
        nn.max_pool(v, (2, 2), strides=(2, 2)), negative_slope=0.3)


if __name__ == "__main__":
    main()
