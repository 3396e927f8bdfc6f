"""Benchmark: preprocess+embed throughput (clips/sec) on the flagship model.

Measures the full hot path a deployment cares about — raw quantized volumes
in HBM -> device-side dequant/normalize -> 2-branch gaitset forward ->
fused signature — on one chip, and compares against the MXU roofline for the
same FLOPs (BASELINE.md target: >=90% of roofline clips/sec; the reference
publishes no throughput numbers, SURVEY.md §6).

The timed iteration loop runs ON DEVICE (lax.fori_loop), so the number is
chip throughput, not host dispatch rate.  Round-4 finding
(benchmarks/proto_dispatch.py): through the remote-tunnel backend each
python-level call costs ~27 ms of RPC dispatch, which had silently become
the bottleneck of the old python-loop bench (~25 ms of device work per
batch).  On a normal TPU host dispatch is microseconds and the two loops
agree; on this one only the device-side loop measures the hardware.  Every
loop iteration XORs BOTH modality volumes with the iteration index — a real
data dependency per branch, so XLA cannot hoist any loop-invariant branch
compute out of the measured region (hoisting the un-perturbed gray branch
would otherwise fake a ~1.5x win).

Also reports (in "detail") the flagship TRAIN step: samples/sec for the
full fwd+bwd+adam update at B=120, nclasses=74 — the 110.8 ms / 1,083
samples/s number that previously lived only in CLAUDE.md prose, so a
backward/optimizer regression now moves a recorded artifact (VERDICT r3 #6).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "detail"}.
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp


def _flagship_embed_parts():
    from ugaitnet_tpu.core.config import BranchConfig, DataConfig, ModelConfig
    from ugaitnet_tpu.data.pipeline import preprocess_batch
    from ugaitnet_tpu.models.network import UGaitNet, init_params

    # bf16 compute for the MXU; params stay fp32.
    cfg = ModelConfig(
        branches=(BranchConfig(kind="gaitset", modality="of"),
                  BranchConfig(kind="gaitset", modality="gray")),
        merge="sign_max", nclasses=0, compute_dtype="bfloat16")
    model = UGaitNet(cfg)
    params = init_params(model, jax.random.PRNGKey(0), batch=2)

    B = 128
    rng = np.random.RandomState(0)
    raw = {
        "raw_of": jnp.asarray(
            rng.randint(-3000, 3000, (B, 50, 60, 60)).astype(np.int16)),
        "raw_gray": jnp.asarray(
            rng.randint(0, 255, (B, 25, 60, 60)).astype(np.uint8)),
        "present_of": jnp.ones((B,), jnp.float32),
        "present_gray": jnp.ones((B,), jnp.float32),
        "labels": jnp.zeros((B,), jnp.int32),
    }
    dcfg = DataConfig()

    def embed_sum(params, raw):
        vols, flags, _ = preprocess_batch(
            raw, jax.random.PRNGKey(0), ("of", "gray"), (2, 1),
            (100.0, 1.0), 2, 1, False, dcfg)
        out = model.apply(params, vols, flags, train=False)
        # scalar checksum: forces execution when fetched (block_until_ready
        # is unreliable through remote-tunnel backends) without paying an
        # 8 MB signature transfer per iteration.
        return jnp.sum(out["signature"])

    return model, params, raw, dcfg, embed_sum, B


EMBED_ITERS = 150  # amortizes the ~27 ms tunnel dispatch to <1% of a chunk

# Per-op composite speed-of-light for the B=128 embed exec, from
# benchmarks/BUDGET.md "End-to-end speed of light": sum of every op at its
# measured achievable rate/bandwidth with conv1 at its 839 MB output-write
# HBM floor.  The naive roofline (every FLOP at the 197 TF peak) is NOT
# the right ceiling for this model — its 32-wide convs cap at the 75 TF
# XLA's emitter reaches for co=32 and its pools are pure-bandwidth ops —
# so the bench also reports pct_of_floor against this number and FAILS
# (exit 1) if the measured step regresses >10% past it on TPU.
COMPOSITE_FLOOR_MS = 24.5


def bench_embed():
    model, params, raw, dcfg, embed_sum, B = _flagship_embed_parts()

    @jax.jit
    def embed_loop(params, raw):
        def body(i, acc):
            # XOR EVERY modality volume with the iteration index: a real
            # per-branch data dependency, so no branch is loop-invariant
            # and XLA's LICM cannot lift its compute out of the loop.
            r = dict(raw)
            r["raw_of"] = raw["raw_of"] ^ i.astype(jnp.int16)
            r["raw_gray"] = raw["raw_gray"] ^ i.astype(jnp.uint8)
            return acc + embed_sum(params, r)
        return jax.lax.fori_loop(0, EMBED_ITERS, body, jnp.float32(0.0))

    float(embed_loop(params, raw))  # compile + warmup

    # median of 4 chunks: the remote-tunnel backend has transient slow
    # windows (CLAUDE.md round-3 notes); the median rejects them.
    chunk_dts = []
    for _ in range(4):
        t0 = time.perf_counter()
        float(embed_loop(params, raw))
        chunk_dts.append(time.perf_counter() - t0)
    dt = float(np.median(chunk_dts)) / EMBED_ITERS
    clips_per_sec = B / dt

    # roofline: model FLOPs per clip / chip peak, from the single-call
    # program (identical HLO to rounds 1-3 -> persistent-cache hit; the
    # fori_loop program's cost_analysis does not scale by trip count).
    try:
        embed1 = jax.jit(embed_sum)
        cost = embed1.lower(params, raw).compile().cost_analysis()
        flops_batch = float(cost.get("flops", 0.0)) if cost else 0.0
    except Exception:
        flops_batch = 0.0
    peak = 197e12  # TPU v5e bf16 peak FLOP/s
    if flops_batch > 0:
        roofline_clips = peak / (flops_batch / B)
        vs_baseline = clips_per_sec / (0.9 * roofline_clips)
        mfu = flops_batch / dt / peak
    else:
        roofline_clips = 0.0
        vs_baseline = 0.0
        mfu = 0.0
    return {
        "clips_per_sec": clips_per_sec, "vs_baseline": vs_baseline,
        "batch": B, "iters_per_chunk": EMBED_ITERS,
        "ms_per_batch": dt * 1e3,
        "chunk_seconds": [round(c, 4) for c in chunk_dts],
        "model_flops_per_clip": flops_batch / B if flops_batch else None,
        "roofline_clips_per_sec": roofline_clips,
        # the self-explaining ceiling (VERDICT r4 weak #1): this model's
        # per-op speed-of-light composite and how close the run sits to it
        "composite_floor_ms": COMPOSITE_FLOOR_MS,
        "pct_of_floor": COMPOSITE_FLOOR_MS / (dt * 1e3),
        "mfu": mfu,
    }


TRAIN_ITERS = 30


def bench_train_step():
    """Flagship train step (fwd+bwd+adam, B=120, nclasses=74 — the
    benchmarks/step_opts.py configuration), iterated on device.  The state
    carry chains iterations naturally (params update every step), so
    nothing is hoistable."""
    from ugaitnet_tpu.core.config import BranchConfig, ModelConfig, TrainConfig
    from ugaitnet_tpu.models.network import UGaitNet, init_params
    from ugaitnet_tpu.train.train_step import (Batch, TrainState,
                                               make_optimizer,
                                               make_train_step_fn)

    cfg = ModelConfig(
        branches=(BranchConfig(kind="gaitset", modality="of"),
                  BranchConfig(kind="gaitset", modality="gray")),
        merge="sign_max", nclasses=74, compute_dtype="bfloat16")
    tcfg = TrainConfig()
    model = UGaitNet(cfg)
    params = init_params(model, jax.random.PRNGKey(0), batch=2)
    tx = make_optimizer(tcfg)
    state = TrainState(step=jnp.int32(0), params=params,
                       opt_state=tx.init(params))
    B = 120
    rng = np.random.RandomState(0)
    batch = Batch(
        volumes=(jnp.asarray(rng.randn(B, 25, 60, 60, 2).astype(np.float32)),
                 jnp.asarray(rng.randn(B, 25, 60, 60, 1).astype(np.float32))),
        use_flags=(jnp.ones((B,), jnp.float32),
                   jnp.ones((B,), jnp.float32)),
        labels=jnp.asarray(np.repeat(np.arange(12), 10).astype(np.int32)))
    step_fn = make_train_step_fn(model, tx, cfg, tcfg)

    @jax.jit
    def step_loop(state, batch, key):
        def body(i, st):
            st2, _ = step_fn(st, batch, jax.random.fold_in(key, i))
            return st2
        return jax.lax.fori_loop(0, TRAIN_ITERS, body, state)

    key = jax.random.PRNGKey(1)
    state = step_loop(state, batch, key)  # compile + warmup
    float(state.step)
    chunk_dts = []
    for _ in range(3):
        t0 = time.perf_counter()
        state = step_loop(state, batch, key)
        float(state.step)
        chunk_dts.append(time.perf_counter() - t0)
    dt = float(np.median(chunk_dts)) / TRAIN_ITERS
    # ~120 adam steps on N(0,1) data have run by now; a divergence would
    # silently shift the timing into a degenerate numeric regime (denormal
    # or inf arithmetic) — make it visible in the artifact (ADVICE r4).
    probe = state.params["params"]["branch_of"]["a_conv1"]["kernel"]
    params_finite = bool(jnp.isfinite(jnp.sum(probe)))
    assert params_finite, "train bench diverged: non-finite params after " \
                          "timed chunks — step time above is untrustworthy"
    return {"train_step_ms": dt * 1e3, "train_samples_per_sec": B / dt,
            "train_batch": B, "train_params_finite": params_finite,
            "train_chunk_seconds": [round(c, 4) for c in chunk_dts]}


def main():
    try:
        from ugaitnet_tpu.core.runtime import setup_compilation_cache
        setup_compilation_cache()
    except Exception:
        pass

    emb = bench_embed()
    try:
        train = bench_train_step()
    except Exception as e:  # never lose the primary metric to the secondary
        train = {"train_error": repr(e)[:200]}

    detail = {k: (round(v, 4) if isinstance(v, float) else v)
              for k, v in {**emb, **train}.items()
              if k not in ("clips_per_sec", "vs_baseline")}
    detail["device"] = str(jax.devices()[0])
    on_tpu = jax.devices()[0].platform not in ("cpu",)
    floor_ok = emb["ms_per_batch"] < 1.1 * COMPOSITE_FLOOR_MS
    detail["floor_ok"] = bool(floor_ok) if on_tpu else None
    print(json.dumps({
        "metric": "preprocess_embed_throughput",
        "value": round(emb["clips_per_sec"], 2),
        "unit": "clips/sec/chip",
        "vs_baseline": round(emb["vs_baseline"], 4),
        "detail": detail,
    }))
    if on_tpu and not floor_ok:
        # a >10% regression past the per-op composite floor is a real perf
        # bug, not drift — fail loudly (after printing the artifact line)
        import sys
        sys.exit(f"bench REGRESSION: {emb['ms_per_batch']:.2f} ms/batch "
                 f"vs composite floor {COMPOSITE_FLOOR_MS} ms "
                 f"(>1.1x; see benchmarks/BUDGET.md)")


if __name__ == "__main__":
    main()
