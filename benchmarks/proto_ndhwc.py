"""Does an NDHWC conv with a unit depth-window run as fast as the folded
NHWC conv on TPU?  And does the 5D form kill the setmax relayout copies?

Run: python benchmarks/proto_ndhwc.py
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
        float(jnp.sum(v.astype(jnp.float32)[:1, :1]))
    sync(f(*args))
    t0 = time.perf_counter()
    for _ in range(n - 1):
        f(*args)
    sync(f(*args))
    return (time.perf_counter() - t0) / n


def main():
    try:
        from ugaitnet_tpu.core.runtime import setup_compilation_cache
        setup_compilation_cache()
    except Exception:
        pass
    rng = np.random.RandomState(0)
    B, T = 128, 25

    def conv2d(x, w):
        return lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16)

    def conv3d(x, w):
        return lax.conv_general_dilated(
            x, w[None], (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.bfloat16)

    for (hh, ci, co, k) in [(64, 32, 32, 3), (32, 32, 64, 3),
                            (32, 64, 64, 3), (16, 128, 128, 3),
                            (64, 2, 32, 5)]:
        x4 = jnp.asarray((rng.randn(B * T, hh, hh, ci) * .1)
                         .astype(np.float32)).astype(jnp.bfloat16)
        x5 = x4.reshape(B, T, hh, hh, ci)
        w = jnp.asarray((rng.randn(k, k, ci, co) * .1).astype(np.float32)
                        ).astype(jnp.bfloat16)
        fl = 2 * B * T * hh * hh * k * k * ci * co
        t2 = timeit(jax.jit(conv2d), x4, w)
        t3 = timeit(jax.jit(conv3d), x5, w)
        print(f"  {hh}x{hh} {ci}->{co} k{k}: 2d {t2*1e3:6.2f} ms "
              f"({fl/t2/1e12:5.1f} TF)   3d {t3*1e3:6.2f} ms "
              f"({fl/t3/1e12:5.1f} TF)")

    # fused mini-stage: conv + pool + setmax, 5D vs folded
    x5 = jnp.asarray((rng.randn(B, T, 64, 64, 32) * .1)
                     .astype(np.float32)).astype(jnp.bfloat16)
    w = jnp.asarray((rng.randn(3, 3, 32, 32) * .1).astype(np.float32)
                    ).astype(jnp.bfloat16)

    def stage5d(x, w):
        a = conv3d(x, w)
        a = lax.reduce_window(a, -jnp.inf, lax.max,
                              (1, 1, 2, 2, 1), (1, 1, 2, 2, 1), "VALID")
        sb = lax.reduce_window(a, -jnp.inf, lax.max,
                               (1, T, 1, 1, 1), (1, T, 1, 1, 1), "VALID")
        return jnp.squeeze(sb, 1) + 0.0 * a[:, 0]

    def stage4d(x, w):
        a = conv2d(x.reshape(B * T, 64, 64, 32), w)
        a = lax.reduce_window(a, -jnp.inf, lax.max,
                              (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
        sb = lax.reduce_window(a, -jnp.inf, lax.max,
                               (T, 1, 1, 1), (T, 1, 1, 1), "VALID")
        return sb + 0.0 * a[:B]

    t5 = timeit(jax.jit(stage5d), x5, w)
    t4 = timeit(jax.jit(stage4d), x5, w)
    print(f"  conv+pool+setmax: 5d {t5*1e3:6.2f} ms   4d-fold {t4*1e3:6.2f} ms")


if __name__ == "__main__":
    main()
