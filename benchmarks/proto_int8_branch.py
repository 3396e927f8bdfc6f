"""int8 vs float at the conv2d/conv3d branch shapes (ask r4 #7 evidence).

Two levels measured on one v5e chip (2026-08-19), and they DISAGREE — the
isolated-stack numbers are the trap, the encode-level numbers are the
verdict:

  isolated conv stacks (this file's stack2d/stack3d, naive bf16 baseline):
    conv2d-shaped stack (B=128, ci=2 conv1, filters 64/128/512/512):
        bf16 20.79 ms   int8 7.71 ms   -> int8 "2.70x"
    conv3d-shaped stack (B=16, ch 16/32/64):
        bf16 50.68 ms   int8 27.75 ms  -> int8 "1.83x"

  REAL encode paths (encode_mode(), ops/quantize.py vs the float model):
    conv2d 2-branch encode  B=32: f32 11.09 ms, int8 22.19 ms -> 0.50x
                            B=128: f32 14.71 ms, int8 24.86 ms -> 0.59x
    conv3d 2-branch encode  B=32: f32 33.09 ms, int8 49.78 ms -> 0.66x

Why the flip: the real branch conv1 consumes the (H, W, T*C) plane volume
(ci=25 gray / 50 of, not the proto's ci=2), and XLA's fused float pipeline
beats the int8 conv + dequant/requant chain end-to-end.  Same verdict
rounds 1+2 reached for the gaitset stream; the int8 branch paths stay as
parity-pinned capacity options (ops/quantize.py header).

Run on TPU: python benchmarks/proto_int8_branch.py [--encode]
"""

import sys
import time
from functools import partial

sys.path.insert(0, "..")

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=30):
    fn(*args)  # compile
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    _ = float(jnp.sum(r))  # force execution through the tunnel
    return (time.perf_counter() - t0) / iters * 1e3


def quant(a):
    s = jnp.max(jnp.abs(a)) / 127.0
    return jnp.clip(jnp.round(a / s), -127, 127).astype(jnp.int8)


def stack2d(x, ws, dtype):
    for w in ws:
        x = jax.lax.conv_general_dilated(
            x.astype(dtype), w.astype(dtype), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=(jnp.int32 if dtype == jnp.int8
                                    else jnp.float32))
        x = jnp.maximum(x, (0.3 * x.astype(jnp.float32)).astype(x.dtype))
        if x.shape[1] > 6:
            init = (jnp.iinfo(jnp.int32).min if x.dtype == jnp.int32
                    else -jnp.inf)
            x = jax.lax.reduce_window(x, init, jax.lax.max,
                                      (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
        x = x.astype(dtype) if dtype == jnp.int8 else x
    return x.astype(jnp.float32)


def stack3d(x, ws, dtype):
    for w in ws:
        x = jax.lax.conv_general_dilated(
            x.astype(dtype), w.astype(dtype), (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=(jnp.int32 if dtype == jnp.int8
                                    else jnp.float32))
        x = jnp.maximum(x, 0).astype(dtype if dtype == jnp.int8
                                     else x.dtype)
    return x.astype(jnp.float32)


def encode_mode():
    """Time the REAL int8 encode paths vs the float model (the honest
    comparison — see the header table)."""
    from ugaitnet_tpu.core.config import BranchConfig, ModelConfig
    from ugaitnet_tpu.models.network import UGaitNet, init_params
    from ugaitnet_tpu.ops.quantize import encode_int8, quantize_model_params

    rng = np.random.RandomState(0)
    for kind, B in (("conv2d", 32), ("conv2d", 128), ("conv3d", 32)):
        if kind == "conv2d":
            bc = lambda m: BranchConfig(
                kind="conv2d", modality=m, filters_numbers=(64, 128, 512,
                                                            512),
                filters_size=(7, 5, 3, 2), ndense_units=256,
                activation="leaky")
        else:
            bc = lambda m: BranchConfig(kind="conv3d", modality=m,
                                        ndense_units=256, activation="relu")
        mcfg = ModelConfig(branches=(bc("gray"), bc("depth")), merge="max",
                           nclasses=0, l2_mode="feature")
        model = UGaitNet(mcfg)
        params = init_params(model, jax.random.PRNGKey(0), batch=2)
        vols = [jnp.asarray(rng.randn(B, 25, 60, 60, 1)
                            .astype(np.float32) * .3) for _ in range(2)]
        flags = [jnp.ones(B), jnp.ones(B)]
        qp = quantize_model_params(params, mcfg, vols)
        t_q = timeit(jax.jit(lambda p, v, f: encode_int8(p, v, f, mcfg)),
                     qp, vols, flags, iters=10)
        t_f = timeit(jax.jit(lambda p, v, f: model.apply(
            p, list(v), f, train=False)["flatten"]), params, vols, flags,
            iters=10)
        print(f"{kind} encode B={B}: f32 {t_f:.2f} ms, int8 {t_q:.2f} ms "
              f"-> {t_f / t_q:.2f}x", flush=True)


def main():
    rng = np.random.RandomState(0)
    B = 128
    specs = [(7, 2, 64), (5, 64, 128), (3, 128, 512), (2, 512, 512)]
    ws = [jnp.asarray(rng.randn(k, k, ci, co).astype(np.float32) * 0.05)
          for k, ci, co in specs]
    x = jnp.asarray(rng.randn(B, 60, 60, 2).astype(np.float32) * 0.3)
    t_bf16 = timeit(jax.jit(partial(stack2d, ws=ws, dtype=jnp.bfloat16)), x)
    xi, wsi = quant(x), [quant(w) for w in ws]
    t_i8 = timeit(jax.jit(partial(stack2d, ws=wsi, dtype=jnp.int8)), xi)
    print(f"conv2d branch stack (B={B}, 60x60, filters 64/128/512/512): "
          f"bf16 {t_bf16:.2f} ms, int8 {t_i8:.2f} ms -> "
          f"{t_bf16 / t_i8:.2f}x", flush=True)

    B3 = 16
    specs3 = [(3, 1, 16), (3, 16, 32), (3, 32, 64)]
    ws3 = [jnp.asarray(rng.randn(k, k, k, ci, co).astype(np.float32) * 0.05)
           for k, ci, co in specs3]
    x3 = jnp.asarray(rng.randn(B3, 25, 60, 60, 1).astype(np.float32) * 0.3)
    t3_bf = timeit(jax.jit(partial(stack3d, ws=ws3, dtype=jnp.bfloat16)),
                   x3, iters=10)
    x3i, ws3i = quant(x3), [quant(w) for w in ws3]
    t3_i8 = timeit(jax.jit(partial(stack3d, ws=ws3i, dtype=jnp.int8)),
                   x3i, iters=10)
    print(f"conv3d branch stack (B={B3}, 25x60x60, ch 16/32/64): "
          f"bf16 {t3_bf:.2f} ms, int8 {t3_i8:.2f} ms -> "
          f"{t3_bf / t3_i8:.2f}x", flush=True)


if __name__ == "__main__":
    if "--encode" in sys.argv:
        encode_mode()
    else:
        main()
