"""Component micro-benchmarks (reproduces the round-1 measurements).

Run on the accelerator:  python benchmarks/bench_components.py [--quick]

Covers:
  - per-layer conv TFLOPS at the model's shapes (bf16)
  - gaitset branch forward throughput vs batch size
  - batch-all triplet loss: XLA chunked vs Pallas kernel (fwd + grad)
  - native vs numpy host gather
(end-to-end preprocess+embed lives in the repo-root bench.py; the int8 path
comparison in tests/test_quantize.py + CLAUDE.md notes)

Prints one human-readable line per measurement plus a final JSON summary.
"""

import argparse
import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timeit(f, n=20):
    """f() must return a jax scalar/array; fetch forces execution (the
    remote-tunnel backend's block_until_ready is unreliable)."""
    import jax.numpy as jnp

    def sync(v):
        float(jnp.sum(v.astype(jnp.float32)))

    sync(f())
    t0 = time.perf_counter()
    for _ in range(n - 1):
        f()
    sync(f())
    return (time.perf_counter() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    reps = 10 if args.quick else 30

    import jax
    import jax.numpy as jnp
    from jax import lax

    try:
        from ugaitnet_tpu.core.runtime import setup_compilation_cache
        setup_compilation_cache()
    except Exception:
        pass

    results = {}
    rng = np.random.RandomState(0)

    # --- conv sweep -------------------------------------------------------
    print("# conv layers (B*T = 3200 frames)")
    shapes = [(64, 2, 32, 5), (64, 32, 32, 3), (32, 32, 64, 3),
              (32, 64, 64, 3), (16, 64, 128, 3), (16, 128, 128, 3)]
    B = 3200

    def conv(x, w, pet=None):
        kw = {"preferred_element_type": pet} if pet else {}
        return lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), **kw)

    for (hh, ci, co, k) in shapes:
        x = jnp.asarray((rng.randn(B, hh, hh, ci) * .1).astype(np.float32)
                        ).astype(jnp.bfloat16)
        w = jnp.asarray((rng.randn(k, k, ci, co) * .1).astype(np.float32)
                        ).astype(jnp.bfloat16)
        # pass arrays as ARGUMENTS — closure-captured arrays become HLO
        # constants and blow up the remote compiler's request size
        f = jax.jit(conv)
        t = timeit(lambda: f(x, w), reps)
        fl = B * hh * hh * k * k * ci * co * 2
        name = f"conv_{hh}x{hh}_{ci}to{co}_k{k}"
        results[name] = {"ms": t * 1e3, "tflops": fl / t / 1e12}
        print(f"  {name}: {t*1e3:6.2f} ms = {fl/t/1e12:5.1f} TFLOPS")

    # --- branch forward vs batch -----------------------------------------
    print("# gaitset branch (bf16)")
    from ugaitnet_tpu.models.gaitset import GaitSetBranch
    gs = GaitSetBranch(dtype=jnp.bfloat16)
    for bb in ((64, 128) if args.quick else (64, 128, 256)):
        x = jnp.asarray(rng.randn(bb, 25, 60, 60, 1).astype(np.float32))
        p = gs.init(jax.random.PRNGKey(0), x)
        f = jax.jit(gs.apply)
        t = timeit(lambda: f(p, x), reps)
        results[f"branch_b{bb}"] = {"ms": t * 1e3, "clips_per_s": bb / t}
        print(f"  B={bb}: {t*1e3:6.2f} ms  {bb/t:7.0f} clips/s")

    # --- triplet losses ---------------------------------------------------
    print("# batch-all triplet (P=62, B=120, D=256)")
    from ugaitnet_tpu.ops.triplet import batch_all_triplet_loss
    from ugaitnet_tpu.ops.pallas.triplet_kernel import (
        batch_all_triplet_loss_pallas)
    emb = jnp.asarray(rng.randn(120, 62, 256).astype(np.float32))
    labels = jnp.asarray(np.repeat(np.arange(12), 10).astype(np.int32))
    for name, fn in (("xla", batch_all_triplet_loss),
                     ("pallas", batch_all_triplet_loss_pallas)):
        fwd = jax.jit(lambda e, fn=fn: fn(e, labels, 0.2))
        bwd = jax.jit(jax.grad(lambda e, fn=fn: fn(e, labels, 0.2)))
        tf_ = timeit(lambda: fwd(emb), reps)
        tb = timeit(lambda: jnp.sum(jnp.abs(bwd(emb))), reps)
        results[f"triplet_{name}"] = {"fwd_ms": tf_ * 1e3, "bwd_ms": tb * 1e3}
        print(f"  {name}: fwd {tf_*1e3:5.2f} ms  grad {tb*1e3:5.2f} ms")

    # --- triplet crossover: gridded pallas vs XLA past B=128 --------------
    # the XLA form materializes O(chunk*B^3) in HBM; the gridded kernel is
    # O(B*D) traffic + O(B^3) VMEM compute.  Measured round 3 (v5e,
    # fwd+grad): B=256 XLA 18.2 vs gridded 19.5 ms, B=384 XLA 69.5 vs
    # 75.0 — the kernel never crosses over, so the default dispatch
    # routes B > 128 to XLA (grid_variant=True forces the kernel).
    if not args.quick:
        print("# triplet crossover (P=62, D=256, B sweep)")
        for bb in (256, 384):
            embb = jnp.asarray(rng.randn(bb, 62, 256).astype(np.float32))
            labb = jnp.asarray(
                np.repeat(np.arange(bb // 8), 8).astype(np.int32))
            grid_fn = functools.partial(batch_all_triplet_loss_pallas,
                                        grid_variant=True)
            for name, fn in (("xla", batch_all_triplet_loss),
                             ("pallas_grid", grid_fn)):
                fwd = jax.jit(lambda e, fn=fn: fn(e, labb, 0.2))
                bwd = jax.jit(jax.grad(lambda e, fn=fn: fn(e, labb, 0.2)))
                tf_ = timeit(lambda: fwd(embb), reps)
                tb = timeit(lambda: jnp.sum(jnp.abs(bwd(embb))), reps)
                results[f"triplet_{name}_b{bb}"] = {
                    "fwd_ms": tf_ * 1e3, "bwd_ms": tb * 1e3}
                print(f"  B={bb} {name}: fwd {tf_*1e3:6.2f} ms"
                      f"  grad {tb*1e3:6.2f} ms")

    # --- flagship train step ---------------------------------------------
    print("# flagship train step (2-mod gaitset bf16, 120 samples)")
    from ugaitnet_tpu.core.config import (BranchConfig, ModelConfig,
                                          TrainConfig)
    from ugaitnet_tpu.models.network import UGaitNet, init_params
    from ugaitnet_tpu.train.train_step import (Batch, TrainState,
                                               make_optimizer,
                                               make_train_step)
    tmcfg = ModelConfig(
        branches=(BranchConfig(kind="gaitset", modality="of"),
                  BranchConfig(kind="gaitset", modality="gray")),
        merge="sign_max", nclasses=74, compute_dtype="bfloat16")
    ttcfg = TrainConfig()
    tmodel = UGaitNet(tmcfg)
    tparams = init_params(tmodel, jax.random.PRNGKey(0), batch=2)
    ttx = make_optimizer(ttcfg)
    tstate = TrainState(step=jnp.asarray(0, jnp.int32), params=tparams,
                        opt_state=ttx.init(tparams))
    tstep = make_train_step(tmodel, ttx, tmcfg, ttcfg)
    TB = 120
    tbatch = Batch(
        volumes=(jnp.asarray(rng.randn(TB, 25, 60, 60, 2)
                             .astype(np.float32)),
                 jnp.asarray(rng.randn(TB, 25, 60, 60, 1)
                             .astype(np.float32))),
        use_flags=(jnp.ones((TB,), jnp.float32),
                   jnp.ones((TB,), jnp.float32)),
        labels=jnp.asarray(np.repeat(np.arange(12), 10).astype(np.int32)))
    tkey = jax.random.PRNGKey(1)
    tstate, tm = tstep(tstate, tbatch, tkey)
    float(tm["loss"])
    t0 = time.perf_counter()
    for _ in range(reps):
        tstate, tm = tstep(tstate, tbatch, tkey)
    float(tm["loss"])
    tt = (time.perf_counter() - t0) / reps
    results["train_step"] = {"ms": tt * 1e3, "samples_per_s": TB / tt}
    print(f"  {tt*1e3:6.1f} ms  ({TB/tt:6.0f} samples/s)")

    # --- serving identify latency ----------------------------------------
    print("# serving identify_raw (flagship 2-mod, gallery 2k codes)")
    from ugaitnet_tpu.core.config import BranchConfig, ModelConfig
    from ugaitnet_tpu.eval.serving import SignatureService
    from ugaitnet_tpu.models.network import UGaitNet, init_params
    mcfg = ModelConfig(
        branches=(BranchConfig(kind="gaitset", modality="of"),
                  BranchConfig(kind="gaitset", modality="gray")),
        merge="sign_max", nclasses=0, compute_dtype="bfloat16")
    smodel = UGaitNet(mcfg)
    sparams = init_params(smodel, jax.random.PRNGKey(0))
    svc = SignatureService(smodel, sparams, ("of", "gray"),
                           buckets=(1, 8, 32))
    code_dim = mcfg.signature_parts * mcfg.signature_dim
    svc.set_gallery(rng.randn(2000, code_dim).astype(np.float32),
                    np.arange(2000) % 74)
    svc.warmup()
    # device-resident inputs: through the axon tunnel, host->device raw
    # transfer dominates wall time (~10 MB/s) and says nothing about the
    # framework — stage the padded raw once and time the jitted identify.
    for b in (1, 8, 32):
        padded = {
            "raw_of": jnp.asarray(np.asarray(
                rng.randint(-3000, 3000, (b, 50, 60, 60)), np.int16)),
            "raw_gray": jnp.asarray(np.asarray(
                rng.randint(0, 255, (b, 25, 60, 60)), np.uint8)),
            "present_of": jnp.ones((b,), jnp.float32),
            "present_gray": jnp.ones((b,), jnp.float32),
            "labels": jnp.zeros((b,), jnp.int32),
            "source": jnp.zeros((b,), jnp.int32),
        }

        def one(padded=padded):
            return svc._identify(svc.params, padded, svc._gallery_codes,
                                 svc._gallery_dense, svc._gallery_bias,
                                 svc._label_capacity, 3)

        def sync(r):
            float(r[1][0, 0])
        sync(one())
        t0 = time.perf_counter()
        n = reps
        for _ in range(n - 1):
            one()
        sync(one())   # one fetch: the tunnel RTT (~30 ms) would otherwise
        t = (time.perf_counter() - t0) / n   # dominate every sample
        results[f"identify_b{b}"] = {"ms": t * 1e3}
        print(f"  B={b:3d}: {t*1e3:6.2f} ms/query-batch "
              f"({b/t:6.0f} clips/s, device-resident input)")

    # --- host gather ------------------------------------------------------
    print("# host gather (128 x 360KB rows)")
    from ugaitnet_tpu.data.native import gather_rows, native_available
    src = rng.randint(-3000, 3000, (2000, 50, 60, 60)).astype(np.int16)
    idx = rng.randint(0, 2000, 128).astype(np.int64)

    def htime(f, n=30):
        f()
        t0 = time.perf_counter()
        for _ in range(n):
            f()
        return (time.perf_counter() - t0) / n
    tn = htime(lambda: gather_rows(src, idx))
    tnp = htime(lambda: src[idx])
    results["gather"] = {"native_ms": tn * 1e3, "numpy_ms": tnp * 1e3,
                         "native_available": native_available()}
    print(f"  native: {tn*1e3:.2f} ms  numpy: {tnp*1e3:.2f} ms")

    print(json.dumps(results, indent=2, default=float))


if __name__ == "__main__":
    main()
