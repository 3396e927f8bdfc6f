"""Measure the int8 gallery-distance path at pod-scale gallery sizes.

The claim to validate (VERDICT r3 / CLAUDE.md int8 lane re-aim): at large
G the (B,D)x(D,G) identify matmul is gallery-READ bound, so int8 should
approach a 4x win (bytes) and additionally ride the doubled int8 MXU
rate, while fitting a 4x larger gallery per chip.  Encode stays bf16
(int8 convs measured slower in rounds 1+2).

Measures on v5e, B=128 probes, D=992 (flagship signature), G up to the
HBM limit: pairwise-distance-only time (sum-forced) and distance+top_k,
fp32 vs int8 gallery, device-side fori_loop (probes perturbed per
iteration so nothing hoists).

Measured (round 4, v5e, --quick):
  G=131072: f32 1.77 ms (293 GB/s, not yet read-bound) | i8 1.53 ms
  G=524288: f32 3.00 ms (694 GB/s = fusion ceiling)    | i8 2.06 ms
            -> int8 1.46x on distances, 1.27x incl. top-1; the margin
            grows with G as the fixed (B,G) epilogue amortizes.
Full sweep (G=2M) and the 8.4M capacity demo need a local TPU host:
the 8 GB H2D is ~2 min through this tunnel (timed out under the 580 s
bound).  Capacity win stands structurally: 8.3 GB int8 codes resident
vs 33 GB f32 for the same gallery.
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def timed(fn, *args, iters=20, trials=3):
    @jax.jit
    def loop(*a):
        def body(i, c):
            p = a[0] + c * jnp.float32(1e-30)
            return jnp.sum(fn(p, *a[1:])).astype(jnp.float32)
        return lax.fori_loop(0, iters, body, jnp.float32(0))
    float(loop(*args))
    best = 1e9
    for _ in range(trials):
        t0 = time.perf_counter()
        float(loop(*args))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    from ugaitnet_tpu.core.runtime import setup_compilation_cache
    setup_compilation_cache()
    from ugaitnet_tpu.ops.knn import pairwise_l2, pairwise_l2_int8

    B, D = 128, 992
    rng = np.random.RandomState(0)
    probes = jnp.asarray(rng.randn(B, D).astype(np.float32))

    def dist_f32(p, gal):
        return pairwise_l2(p, gal)

    def dist_i8(p, q, s, n2):
        return pairwise_l2_int8(p, q, s, n2)

    def top1_i8(p, q, s, n2):
        d2 = pairwise_l2_int8(p, q, s, n2)
        neg, idx = lax.top_k(-d2, 1)
        return neg

    # --quick: tunnel-feasible sizes (<=2 GB f32 transfers) that still sit
    # in the gallery-read-bound regime; full sweep needs a local TPU host
    # (G=2M is an 8 GB f32 H2D -- ~2 min through this tunnel).
    if "--capacity-only" in sys.argv:
        sweep_sizes = ()
    elif "--quick" in sys.argv:
        sweep_sizes = (131_072, 524_288)
    else:
        sweep_sizes = (262_144, 1_048_576, 2_097_152)
    gen = np.random.default_rng(0)
    for G in sweep_sizes:
        g = gen.standard_normal((G, D), dtype=np.float32)
        g /= np.linalg.norm(g, axis=1, keepdims=True)
        scale = float(np.max(np.abs(g))) / 127.0
        gi8 = jnp.asarray(np.clip(np.rint(g / scale), -127, 127)
                          .astype(np.int8))
        g2 = jnp.asarray(np.sum(g * g, 1).astype(np.float32))
        gf = jnp.asarray(g) if G <= 2_097_152 else None
        del g

        out = [f"G={G}:"]
        if gf is not None:
            dt = timed(dist_f32, probes, gf)
            gbs = (G * D * 4) / dt / 1e9
            out.append(f"f32 dist {dt*1e3:7.2f} ms ({gbs:5.0f} GB/s read)")
            def top1_f32(p, gal):
                d2 = pairwise_l2(p, gal)
                neg, idx = lax.top_k(-d2, 1)
                return neg
            dt_t = timed(top1_f32, probes, gf)
            out.append(f"+top1 {dt_t*1e3:7.2f}")
        dt = timed(dist_i8, probes, gi8, jnp.float32(scale), g2)
        gbs = (G * D) / dt / 1e9
        tops = 2 * B * D * G / dt / 1e12
        out.append(f"| i8 dist {dt*1e3:7.2f} ms ({gbs:5.0f} GB/s, "
                   f"{tops:5.1f} TOPS)")
        dt_t = timed(top1_i8, probes, gi8, jnp.float32(scale), g2)
        out.append(f"+top1 {dt_t*1e3:7.2f}")
        print(" ".join(out), flush=True)

    # capacity demo: a gallery only int8 can hold on one 16 GB chip
    # (f32 would need 33 GB for the codes alone).  Probes shrink to 32 so
    # the (P, G) distance matrix stays ~1 GB next to the 8 GB gallery.
    # Skipped under --quick: the 8.3 GB H2D alone is ~2 min through the
    # tunnel (timed out at 580 s under host-core contention, round 4).
    if "--quick" in sys.argv:
        return
    G = 8_388_608
    gi8 = jnp.asarray(rng.randint(-127, 128, (G, D), dtype=np.int8))
    g2 = jnp.asarray(np.full(G, float(D) * 0.33, np.float32))
    dt = timed(dist_i8, probes[:32], gi8, jnp.float32(0.01), g2, iters=5)
    print(f"G={G} (int8-only, {G*D/1e9:.1f} GB resident, 32 probes): "
          f"dist {dt*1e3:.2f} ms ({G*D/dt/1e9:.0f} GB/s)", flush=True)


if __name__ == "__main__":
    main()
