"""Opt-in TPU hardware integration tests.

The default suite pins JAX to the virtual CPU mesh (conftest.py); these
end-to-end checks run the real flagship-size model on the accelerator and
are enabled with UGAITNET_TPU_TESTS=1 (they take minutes of compile time on
a cold cache):

    UGAITNET_TPU_TESTS=1 python -m pytest tests/test_integration_tpu.py -q
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("UGAITNET_TPU_TESTS"),
    reason="set UGAITNET_TPU_TESTS=1 to run hardware integration tests")


def test_flagship_train_and_serve():
    import jax
    import jax.numpy as jnp
    from ugaitnet_tpu.core.config import (BranchConfig, DataConfig,
                                          ModelConfig, TrainConfig)
    from ugaitnet_tpu.core.runtime import setup_compilation_cache
    from ugaitnet_tpu.data.pipeline import GaitPipeline
    from ugaitnet_tpu.data.sampler import BalancedGaitSampler
    from ugaitnet_tpu.data.synthetic import make_synthetic_dataset
    from ugaitnet_tpu.eval.serving import SignatureService
    from ugaitnet_tpu.models.network import UGaitNet
    from ugaitnet_tpu.train.train_step import (Batch, init_state,
                                               make_optimizer,
                                               make_train_step)

    setup_compilation_cache()
    ds = make_synthetic_dataset(num_subjects=8, videos_per_subject=3,
                                subseqs_per_video=3)
    mcfg = ModelConfig(
        branches=(BranchConfig(kind="gaitset", modality="of"),
                  BranchConfig(kind="gaitset", modality="gray")),
        merge="sign_max", nclasses=8, compute_dtype="bfloat16")
    tcfg = TrainConfig(lr=3e-4, loss_weights=(1.0, 0.1))
    model = UGaitNet(mcfg)
    tx = make_optimizer(tcfg)
    state = init_state(model, tx, jax.random.PRNGKey(0))
    step = make_train_step(model, tx, mcfg, tcfg)
    pipe = GaitPipeline(ds, DataConfig(batch_size=16, expand_level=2),
                        ("of", "gray"), labmap=ds.label_map())
    sampler = BalancedGaitSampler(ds.labels, ds.gaits, 16, repetition=2)

    losses = []
    for i in range(6):
        vols, flags, labels = pipe.load(sampler.next_batch(),
                                        jax.random.PRNGKey(i))
        state, m = step(state, Batch(tuple(vols), tuple(flags), labels),
                        jax.random.PRNGKey(100 + i))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]

    svc = SignatureService(model, state.params, ("of", "gray"), knn=1,
                           buckets=(8, 32))
    svc.build_gallery(ds, batch_size=32, warmup=True)
    raw = {"raw_of": ds.modalities["of"].volumes[:8],
           "raw_gray": ds.modalities["gray"].volumes[:8]}
    # after warmup the FIRST query must already be steady-state: compare
    # cold-start (first) identify latency against the next queries
    import time
    t0 = time.perf_counter()
    labels, dists = svc.identify_raw(raw)
    first = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(3):
        svc.identify_raw(raw)
    steady = (time.perf_counter() - t0) / 3
    print(f"identify latency: first {first*1e3:.0f} ms, "
          f"steady {steady*1e3:.0f} ms")
    # generous bound: transient tunnel slowdowns (CLAUDE.md records
    # >10 s stalls on healthy runs) must not redden the run — only a
    # genuine compile should, and through the tunnel a compile takes
    # minutes, so a 60 s floor still separates the two cleanly
    assert first < max(20 * steady, 60.0), (
        f"cold-start identify {first:.2f}s vs steady {steady:.3f}s — "
        "warmup did not precompile the query bucket")
    np.testing.assert_array_equal(labels, ds.labels[:8])


def test_grid_triplet_kernel_to_max_b_on_hardware():
    """The gridded pallas triplet kernel up to MAX_GRID_B on the real
    accelerator.  Interpret mode does not check Mosaic block tiling or the
    scoped-vmem budget (round-3 hardware finding), and at bp=512 one grid
    step's intermediates sit right at the 16M limit — so the claim that
    grid_variant handles B<=MAX_GRID_B is only enforceable here."""
    import jax
    import jax.numpy as jnp
    from ugaitnet_tpu.ops.pallas.triplet_kernel import (
        MAX_GRID_B, batch_all_triplet_loss_pallas)
    from ugaitnet_tpu.ops.triplet import batch_all_triplet_loss

    rng = np.random.default_rng(0)
    for B in (256, MAX_GRID_B):
        emb = jnp.asarray(rng.normal(size=(B, 8, 256)), jnp.float32)
        labels = jnp.asarray(np.repeat(np.arange(B // 4), 4), jnp.int32)
        loss = lambda f: (lambda e: f(e, labels, 0.2))  # noqa: E731
        grid = lambda e, l, m: batch_all_triplet_loss_pallas(  # noqa: E731
            e, l, m, grid_variant=True)
        v_ref, g_ref = jax.jit(jax.value_and_grad(
            loss(batch_all_triplet_loss)))(emb)
        v_k, g_k = jax.jit(jax.value_and_grad(loss(grid)))(emb)
        assert abs(float(v_ref) - float(v_k)) < 1e-4, B
        assert float(jnp.max(jnp.abs(g_ref - g_k))) < 1e-5, B
