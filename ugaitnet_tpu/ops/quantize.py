"""Int8 quantized inference paths for every branch family.

Serving-oriented speedup (opt-in, never used in training). Design, driven by
measurement on v5e:

  * gaitset (below): frame stream int8-resident — a measured WASH vs bf16
    at its 32-128-channel shapes (kept as a validated option);
  * conv2d / conv3d branches (end of file): implemented + parity-pinned
    (cosine 0.9996+), but ALSO measured slower than the float path at the
    branches' real shapes on v5e — conv2d encode 0.50-0.59x (B=32/128),
    conv3d 0.66x (benchmarks/proto_int8_branch.py).  An isolated conv
    stack with 512-wide layers shows int8 ahead, but the branch's actual
    conv1 consumes T*C=25..50 input planes and the end-to-end encode loses
    it back.  Status: validated OPTIONAL paths (capacity/transport use
    cases), not a speed recommendation — revisit if libtpu int8 convs
    improve (same verdict as rounds 1+2 reached for gaitset).

GaitSet specifics:

  * conv weights: int8 with per-output-channel scales;
  * activations of the FRAME stream (the B*T-sized hot path) stay int8
    end-to-end between convs, with STATIC per-layer scales from a one-batch
    calibration pass — dynamic per-tensor quantization was measured 0.58x
    (the abs-max reduction + requant passes over ~GB intermediates cost more
    than the int8 MXU saves); static scales let XLA fuse the
    dequant->LeakyReLU->requant chain into the conv epilogue and halve the
    inter-conv HBM traffic vs bf16;
  * max-pooling and set-pooling run directly on int8 (max is exact under a
    single positive scale);
  * the set stream (batch-sized, cheap) and HPP/projection stay float.

Quality: per-sample signature cosine vs the fp32 path ~0.995+ on random
weights (pinned in tests on hardware).
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ugaitnet_tpu.core.config import BranchConfig, ModelConfig

_A_CONVS = [f"a_conv{i}" for i in range(1, 7)]
_B_CONVS = [f"b_conv{i}" for i in range(1, 5)]


def quantize_weight(w: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(..., cin, cout) conv kernel -> int8 weights + per-cout scales
    (reduces over every axis but the last; works for 2D and 3D kernels)."""
    w = w.astype(jnp.float32)
    s = jnp.max(jnp.abs(w), axis=tuple(range(w.ndim - 1))) / 127.0
    s = jnp.maximum(s, 1e-12)
    wq = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
    return wq, s


def _requant(y: jax.Array, s_out: jax.Array) -> jax.Array:
    return jnp.clip(jnp.round(y / s_out), -127, 127).astype(jnp.int8)


def _maxpool_i8(x: jax.Array) -> jax.Array:
    return lax.reduce_window(x, jnp.int8(jnp.iinfo(jnp.int8).min), lax.max,
                             (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def _lrelu(v: jax.Array, alpha: float) -> jax.Array:
    # max form, not select form: exact for 0 <= alpha < 1, and the select
    # makes XLA materialize a packed sign-bitmask of the whole volume to
    # feed the next fusion (~3.6 ms/exec measured on the fp32 path —
    # benchmarks/BUDGET.md, models/gaitset.py)
    return jnp.maximum(v, alpha * v)


def calibrate_branch(branch_params: Dict[str, Any], x: jax.Array,
                     cfg: BranchConfig) -> Dict[str, float]:
    """One fp32 forward over a calibration batch recording the abs-max of
    every frame-stream conv INPUT (post-lrelu/pool activations). Returns
    {conv_name: input_scale}."""
    alpha = cfg.leaky_alpha
    b, t, h, w, c = x.shape
    x = jnp.pad(x.astype(jnp.float32),
                ((0, 0), (0, 0), (2, 2), (2, 2), (0, 0)))
    h, w = h + 4, w + 4

    def conv(name, v):
        return lax.conv_general_dilated(
            v, branch_params[name]["kernel"].astype(jnp.float32),
            (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    scales: Dict[str, jax.Array] = {}

    def rec(name, v):
        scales[name] = jnp.maximum(jnp.max(jnp.abs(v)) / 127.0, 1e-12)
        return v

    a = x.reshape(b * t, h, w, c)
    a = _lrelu(conv("a_conv1", rec("a_conv1", a)), alpha)
    a = _lrelu(conv("a_conv2", rec("a_conv2", a)), alpha)
    a = lax.reduce_window(a, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                          "VALID")
    rec("a_conv3", a)
    a = _lrelu(conv("a_conv3", a), alpha)
    a = _lrelu(conv("a_conv4", rec("a_conv4", a)), alpha)
    a = lax.reduce_window(a, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                          "VALID")
    rec("a_conv5", a)
    a = _lrelu(conv("a_conv5", a), alpha)
    rec("a_conv6", a)
    return {k: float(v) for k, v in scales.items()}


def quantize_branch_params(branch_params: Dict[str, Any],
                           calib: Dict[str, float]) -> Dict[str, Any]:
    """Pre-quantize frame-stream conv kernels + attach static input scales;
    set-stream convs and the part projection stay float."""
    out: Dict[str, Any] = {}
    for name, mod in branch_params.items():
        if name in _A_CONVS:
            wq, s = quantize_weight(mod["kernel"])
            out[name] = {"kernel_q": wq, "w_scale": s,
                         "in_scale": jnp.float32(calib[name])}
        else:
            out[name] = mod
    return out


def gaitset_branch_int8(qparams: Dict[str, Any], x: jax.Array,
                        cfg: BranchConfig) -> jax.Array:
    """Quantized mirror of GaitSetBranch.__call__ (models/gaitset.py): the
    frame stream runs int8-resident; set stream/HPP/projection in float."""
    alpha = cfg.leaky_alpha
    b, t, h, w, c = x.shape
    x = jnp.pad(x.astype(jnp.float32),
                ((0, 0), (0, 0), (2, 2), (2, 2), (0, 0)))
    h, w = h + 4, w + 4

    def qconv(name, vq_or_f, quant_in: bool):
        m = qparams[name]
        s_in = m["in_scale"]
        vq = _requant(vq_or_f, s_in) if quant_in else vq_or_f
        y = lax.conv_general_dilated(
            vq, m["kernel_q"], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        return y.astype(jnp.float32) * (s_in * m["w_scale"]), vq

    def fconv(name, v):
        return lax.conv_general_dilated(
            v, qparams[name]["kernel"].astype(jnp.float32), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    a0 = x.reshape(b * t, h, w, c)
    y1, _ = qconv("a_conv1", a0, True)
    # requant directly in the conv epilogue: lrelu then scale to the next
    # conv's static input grid — stays fused, writes int8 to HBM
    a1q = _requant(_lrelu(y1, alpha), qparams["a_conv2"]["in_scale"])
    y2, _ = qconv("a_conv2", a1q, False)
    a2f = _lrelu(y2, alpha)
    a2q = _requant(a2f, qparams["a_conv3"]["in_scale"])
    a2q = _maxpool_i8(a2q)                       # int8 max-pool (exact)
    hw = h // 2
    c1 = a2q.shape[-1]
    s_a2 = qparams["a_conv3"]["in_scale"]

    # set stream stage 1 (float, batch-sized): set-pool over int8 then scale
    sb = jnp.max(a2q.reshape(b, t, hw, hw, c1), axis=1).astype(jnp.float32)
    sb = sb * s_a2
    sb = _lrelu(fconv("b_conv1", sb), alpha)
    sb = _lrelu(fconv("b_conv2", sb), alpha)
    sb = lax.reduce_window(sb, -jnp.inf, lax.max, (1, 2, 2, 1),
                           (1, 2, 2, 1), "VALID")

    y3, _ = qconv("a_conv3", a2q, False)
    a3q = _requant(_lrelu(y3, alpha), qparams["a_conv4"]["in_scale"])
    y4, _ = qconv("a_conv4", a3q, False)
    a4q = _requant(_lrelu(y4, alpha), qparams["a_conv5"]["in_scale"])
    a4q = _maxpool_i8(a4q)
    hw = hw // 2
    c2 = a4q.shape[-1]
    s_a4 = qparams["a_conv5"]["in_scale"]

    sb = sb + jnp.max(a4q.reshape(b, t, hw, hw, c2), axis=1
                      ).astype(jnp.float32) * s_a4
    sb = _lrelu(fconv("b_conv3", sb), alpha)
    sb = _lrelu(fconv("b_conv4", sb), alpha)

    y5, _ = qconv("a_conv5", a4q, False)
    a5q = _requant(_lrelu(y5, alpha), qparams["a_conv6"]["in_scale"])
    y6, _ = qconv("a_conv6", a5q, False)
    a6 = _lrelu(y6, alpha)
    c3 = a6.shape[-1]
    sa = jnp.max(a6.reshape(b, t, hw, hw, c3), axis=1)
    sb = sb + sa

    feats = []
    for nb in cfg.hpp_bins:
        for fmap in (sa, sb):
            strips = fmap.reshape(b, nb, (hw * hw) // nb, c3)
            feats.append(jnp.mean(strips, axis=2) + jnp.max(strips, axis=2))
    parts = jnp.concatenate(feats, axis=1)

    kernel = qparams["part_proj"].astype(jnp.bfloat16)
    out = jnp.einsum("bpc,pcd->bpd", parts.astype(jnp.bfloat16), kernel,
                     preferred_element_type=jnp.float32)
    return out.astype(jnp.float32)


# ---------------------------------------------------------------------
# conv2d / conv3d branch int8 paths (VERDICT r4 ask #7).
#
# Implemented + parity-pinned (tests/test_quantize.py, cosine 0.9996+ on
# CPU and TPU), closing the former NotImplementedError scope cliff.  Perf
# verdict from v5e measurement (benchmarks/proto_int8_branch.py,
# 2026-08-19): an ISOLATED 512-wide conv stack shows int8 ahead of a
# naive bf16 stack, but the real branches measured end-to-end LOSE —
# conv2d encode 0.50-0.59x vs the float model path (B=32/128), conv3d
# 0.66x (the branch conv1 eats T*C=25..50 input planes and XLA's f32/bf16
# fusions win the full pipeline).  Same conclusion rounds 1+2 reached for
# the gaitset stream: int8 convs on this hardware/model are a capacity
# option, not a speed one.
# ---------------------------------------------------------------------


def calibrate_conv2d_branch(branch_params: Dict[str, Any], x: jax.Array,
                            cfg: BranchConfig) -> Dict[str, float]:
    """fp32 forward over a calibration volume recording each conv INPUT
    abs-max.  x: (B, T, H, W, C) raw volume (reshaped to the branch's
    (B, H, W, T*C) planes here, mirroring models/network.py:branch_input).
    """
    from ugaitnet_tpu.models.branches import _act
    from ugaitnet_tpu.models.network import branch_input
    act = _act(cfg.activation, cfg.leaky_alpha)
    v = branch_input(cfg, x).astype(jnp.float32)
    n = len(cfg.filters_numbers)
    scales: Dict[str, float] = {}
    for i in range(n):
        scales[f"conv{i}"] = float(
            jnp.maximum(jnp.max(jnp.abs(v)) / 127.0, 1e-12))
        m = branch_params[f"conv{i}"]
        v = lax.conv_general_dilated(
            v, m["kernel"].astype(jnp.float32), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + m["bias"]
        v = act(v)
        if i != n - 1:
            v = lax.reduce_window(v, -jnp.inf, lax.max, (1, 2, 2, 1),
                                  (1, 2, 2, 1), "VALID")
    return scales


def conv2d_branch_int8(qparams: Dict[str, Any], x: jax.Array,
                       cfg: BranchConfig) -> jax.Array:
    """Quantized mirror of Conv2DBranch.__call__ (models/branches.py:38):
    int8-resident convs with static input scales + exact int8 max-pools
    (requant is monotone, so pool/requant commute); dense + code stay
    float (batch-sized, cheap); inference path, dropout off."""
    from ugaitnet_tpu.models.branches import _act
    from ugaitnet_tpu.models.network import branch_input
    act = _act(cfg.activation, cfg.leaky_alpha)
    v = branch_input(cfg, x).astype(jnp.float32)
    n = len(cfg.filters_numbers)
    q = _requant(v, qparams["conv0"]["in_scale"])
    y = None
    for i in range(n):
        m = qparams[f"conv{i}"]
        y = lax.conv_general_dilated(
            q, m["kernel_q"], (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        y = act(y.astype(jnp.float32) * (m["in_scale"] * m["w_scale"])
                + m["bias"])
        if i != n - 1:
            q = _maxpool_i8(_requant(y, qparams[f"conv{i+1}"]["in_scale"]))
    v = y.reshape(y.shape[0], -1)
    v = v @ qparams["dense"]["kernel"].astype(jnp.float32) \
        + qparams["dense"]["bias"]
    v = v @ qparams["code"]["kernel"].astype(jnp.float32) \
        + qparams["code"]["bias"]
    return v.astype(jnp.float32)


def calibrate_conv3d_branch(branch_params: Dict[str, Any], x: jax.Array,
                            cfg: BranchConfig) -> Dict[str, float]:
    """fp32 forward over a (B, T, H, W, C) volume recording each strided
    conv's INPUT abs-max (models/branches.py:CONV3D_SPEC)."""
    from ugaitnet_tpu.models.branches import CONV3D_SPEC, _act
    act = _act(cfg.activation, cfg.leaky_alpha)
    v = x.astype(jnp.float32)
    scales: Dict[str, float] = {}
    for i, (_, k, s) in enumerate(CONV3D_SPEC):
        scales[f"conv{i}"] = float(
            jnp.maximum(jnp.max(jnp.abs(v)) / 127.0, 1e-12))
        m = branch_params[f"conv{i}"]
        v = lax.conv_general_dilated(
            v, m["kernel"].astype(jnp.float32), s, "VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) + m["bias"]
        v = act(v)
    return scales


def conv3d_branch_int8(qparams: Dict[str, Any], x: jax.Array,
                       cfg: BranchConfig) -> jax.Array:
    """Quantized mirror of Conv3DBranch.__call__ (models/branches.py):
    the six strided VALID convs run int8-resident; the 1x1x1 code conv
    stays float."""
    from ugaitnet_tpu.models.branches import CONV3D_SPEC, _act
    act = _act(cfg.activation, cfg.leaky_alpha)
    q = _requant(x.astype(jnp.float32), qparams["conv0"]["in_scale"])
    y = None
    last = len(CONV3D_SPEC) - 1
    for i, (_, k, s) in enumerate(CONV3D_SPEC):
        m = qparams[f"conv{i}"]
        y = lax.conv_general_dilated(
            q, m["kernel_q"], s, "VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.int32)
        y = act(y.astype(jnp.float32) * (m["in_scale"] * m["w_scale"])
                + m["bias"])
        if i != last:
            q = _requant(y, qparams[f"conv{i+1}"]["in_scale"])
    m = qparams["code"]
    y = lax.conv_general_dilated(
        y, m["kernel"].astype(jnp.float32), (1, 1, 1), "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) + m["bias"]
    return y.reshape(y.shape[0], -1).astype(jnp.float32)


def quantize_model_params(params: Any, mcfg: ModelConfig,
                          calib_volumes: Sequence[jax.Array]
                          ) -> Dict[str, Any]:
    """Calibrate + quantize every branch of a UGaitNet params tree
    (gaitset frame stream, conv2d conv stack, conv3d conv stack — see the
    per-kind docstrings for what stays float).

    calib_volumes: one representative (B, T, H, W, C_i) batch per branch.
    """
    p = params["params"] if "params" in params else params
    out = dict(p)
    for i, bcfg in enumerate(mcfg.branches):
        key = f"branch_{bcfg.modality}"
        if bcfg.kind == "gaitset":
            calib = calibrate_branch(p[key], calib_volumes[i], bcfg)
            out[key] = quantize_branch_params(p[key], calib)
        elif bcfg.kind == "conv2d":
            calib = calibrate_conv2d_branch(p[key], calib_volumes[i], bcfg)
            out[key] = quantize_sequential_branch_params(p[key], calib)
        elif bcfg.kind == "conv3d":
            calib = calibrate_conv3d_branch(p[key], calib_volumes[i], bcfg)
            out[key] = quantize_sequential_branch_params(p[key], calib)
        else:
            raise ValueError(f"unknown branch kind {bcfg.kind!r}")
    return out


def quantize_sequential_branch_params(branch_params: Dict[str, Any],
                                      calib: Dict[str, float]
                                      ) -> Dict[str, Any]:
    """Pre-quantize the calibrated conv kernels of a conv2d/conv3d branch
    (biases stay f32, applied after dequant); dense/code stay float."""
    out: Dict[str, Any] = {}
    for name, mod in branch_params.items():
        if name in calib:
            wq, s = quantize_weight(mod["kernel"])
            out[name] = {"kernel_q": wq, "w_scale": s,
                         "in_scale": jnp.float32(calib[name]),
                         "bias": mod["bias"].astype(jnp.float32)}
        else:
            out[name] = mod
    return out


def encode_int8(qparams: Dict[str, Any], volumes: Sequence[jax.Array],
                use_flags: Sequence[jax.Array], mcfg: ModelConfig
                ) -> jax.Array:
    """Quantized flagship encode -> per-sample flattened signature (the
    typecode-3 embedding) with deterministic per-sample L2 normalization
    (serving semantics, see eval/serving.py)."""
    from ugaitnet_tpu.ops import fusion as F

    kind_fns = {"gaitset": gaitset_branch_int8,
                "conv2d": conv2d_branch_int8,
                "conv3d": conv3d_branch_int8}
    embeddings = []
    for i, bcfg in enumerate(mcfg.branches):
        e = kind_fns[bcfg.kind](qparams[f"branch_{bcfg.modality}"],
                                volumes[i], bcfg)
        embeddings.append(F.gate(e, use_flags[i]))
    fused = F.MERGES[mcfg.merge](embeddings)
    sig = F.signature(fused, l2_mode="feature")
    return sig.reshape(sig.shape[0], -1)
