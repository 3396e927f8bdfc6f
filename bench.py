"""Benchmark: preprocess+embed throughput (clips/sec) on the flagship model.

Measures the full hot path a deployment cares about — raw quantized volumes
in HBM -> device-side dequant/normalize -> 2-branch gaitset forward ->
fused signature — on one chip, and compares against the MXU roofline for the
same FLOPs (BASELINE.md target: >=90% of roofline clips/sec; the reference
publishes no throughput numbers, SURVEY.md §6).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    try:
        from ugaitnet_tpu.core.runtime import setup_compilation_cache
        setup_compilation_cache()
    except Exception:
        pass
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

    @jax.jit
    def embed(params, raw):
        vols, flags, _ = preprocess_batch(
            raw, jax.random.PRNGKey(0), ("of", "gray"), (2, 1),
            (100.0, 1.0), 2, 1, False, dcfg)
        out = model.apply(params, vols, flags, train=False)
        # scalar checksum: forces execution when fetched (block_until_ready
        # is unreliable through remote-tunnel backends) without paying an
        # 8 MB signature transfer per iteration.
        return jnp.sum(out["signature"])

    float(embed(params, raw))  # compile + warmup

    # median of 5 chunks x 10 iters: the remote-tunnel backend has
    # transient 3x-slow windows (CLAUDE.md round-3 notes); a single
    # 50-iter window would record the stall as the round's number
    chunk_iters, chunks = 10, 5
    chunk_dts = []
    for _ in range(chunks):
        t0 = time.perf_counter()
        last = None
        for _ in range(chunk_iters):
            last = embed(params, raw)
        float(last)  # in-order device stream: last done => chunk done
        chunk_dts.append(time.perf_counter() - t0)
    dt = float(np.median(chunk_dts))
    iters = chunk_iters
    clips_per_sec = B * iters / dt

    # roofline: model FLOPs per clip / chip peak
    try:
        # embed is already jitted — re-wrapping would compile the whole
        # program a second time (on a cache miss that is ~10 min through
        # the tunnel)
        cost = embed.lower(params, raw).compile().cost_analysis()
        flops_batch = float(cost.get("flops", 0.0)) if cost else 0.0
    except Exception:
        flops_batch = 0.0
    peak = 197e12  # TPU v5e bf16 peak FLOP/s
    if flops_batch > 0:
        roofline_clips = peak / (flops_batch / B)
        vs_baseline = clips_per_sec / (0.9 * roofline_clips)
    else:
        roofline_clips = 0.0
        vs_baseline = 0.0

    print(json.dumps({
        "metric": "preprocess_embed_throughput",
        "value": round(clips_per_sec, 2),
        "unit": "clips/sec/chip",
        "vs_baseline": round(vs_baseline, 4),
        "detail": {
            "batch": B, "iters": iters, "seconds": round(dt, 4),
            "chunk_seconds": [round(c, 4) for c in chunk_dts],
            "model_flops_per_clip": flops_batch / B if flops_batch else None,
            "roofline_clips_per_sec": round(roofline_clips, 2),
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
