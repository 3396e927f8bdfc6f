"""UGaitNet: multimodal gated-fusion gait network.

Flax re-design of `UWYHSemiNet.build` / `UWYHSemiNet3Mods.build` /
`UWYHSemiNet3Mods_Fran` and the BothDatasets family
(/root/reference/nets/mj_uwyhNets_ba.py:668-935,1003-1397,1401-1732;
/root/reference/nets/mj_uwyhNets_bothDatasets.py:274-1177) as ONE module
parameterized by `ModelConfig` — any number of branches (1/2/3 modalities),
any branch kind (conv2d / conv3d / gaitset), pluggable merge, optional extra
dense "code" head, classification head, and per-branch auxiliary heads.

Forward taps (dict outputs) mirror the reference layer names used by the
eval scripts' typecode map (mains/mj_testUWYHGaitNet_open_casiab.py:157-166):
  "signature" — L2-normalized fused embedding (typecode 1)
  "flatten"   — per-sample flattened signature (typecode 3, the flagship
                eval embedding: flatten(transpose(signature)))
  "code"      — extra dense tap (casenet C)
  "classprob" — softmax id head; "classprob_logits" for stable CE
  "branches"  — gated per-branch embeddings (aux heads, encode())
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ugaitnet_tpu.core.config import (
    FRAME_H, FRAME_W, NUM_FRAMES, BranchConfig, ModelConfig)
from ugaitnet_tpu.models.branches import (
    Conv2DBranch, Conv3DBranch, _act, glorot)
from ugaitnet_tpu.models.gaitset import GaitSetBranch
from ugaitnet_tpu.ops import fusion as F
from ugaitnet_tpu.ops.preprocess import frames_to_planes


def make_branch(cfg: BranchConfig, dtype, name: str,
                remat: bool = False, seq_axis: str = "") -> nn.Module:
    def cls(c):
        # ModelConfig.remat: recompute the branch's conv activations in
        # the backward pass instead of holding them — the (B,T,64,64,C)
        # frame-stream stages dominate train-step HBM.  Identical
        # numerics.  `train` (argnum 2, after self) must be static for
        # the `deterministic=` plumbing under the lifted transform.
        return nn.remat(c, static_argnums=(2,)) if remat else c

    if cfg.kind == "gaitset":
        return cls(GaitSetBranch)(
            channels=cfg.gaitset_channels,
            hpp_bins=cfg.hpp_bins, part_dim=cfg.part_dim,
            leaky_alpha=cfg.leaky_alpha, dtype=dtype, name=name,
            seq_axis=seq_axis, moe_experts=cfg.moe_experts,
            moe_capacity_factor=cfg.moe_capacity_factor)
    if seq_axis:
        # conv2d consumes the T*C plane stack densely and conv3d convolves
        # across time — neither is frame-separable, so a T-sharded volume
        # would silently compute on a fraction of the clip
        raise ValueError(
            f"sequence parallelism requires gaitset branches (set-pool "
            f"frame separability); branch kind {cfg.kind!r} is not")
    if cfg.kind == "conv2d":
        return cls(Conv2DBranch)(
            filters_numbers=cfg.filters_numbers,
            filters_size=cfg.filters_size,
            ndense_units=cfg.ndense_units,
            dropout=cfg.dropout, activation=cfg.activation,
            leaky_alpha=cfg.leaky_alpha, dtype=dtype, name=name)
    if cfg.kind == "conv3d":
        return cls(Conv3DBranch)(
            ndense_units=cfg.ndense_units,
            activation=cfg.activation,
            leaky_alpha=cfg.leaky_alpha, dtype=dtype, name=name)
    raise ValueError(f"unknown branch kind: {cfg.kind}")


def branch_input(bcfg: BranchConfig, volume: jax.Array) -> jax.Array:
    """Per-branch input adaptation (shared with parallel/pipeline.py's
    stage functions so the two forwards cannot drift)."""
    if bcfg.kind == "conv2d":
        # 2D branch consumes the (H, W, T*C) plane volume.
        return jnp.moveaxis(frames_to_planes(volume), -3, -1)
    return volume


def _head_forward(cfg: ModelConfig, embeddings: Sequence[jax.Array],
                  use_flags: Sequence[jax.Array],
                  train: bool) -> Dict[str, jax.Array]:
    """Everything after the branches: gating, merge, signature, extra
    dense, classification + aux heads.  Plain function so it binds
    submodules to whatever compact scope calls it — UGaitNet below (the
    single-program net) and UGaitHead (the pipeline-parallel head stage)
    produce IDENTICAL param subtrees and rng paths from this one body.
    """
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    batch = embeddings[0].shape[0]

    gated = []
    for e, u, bcfg in zip(embeddings, use_flags, cfg.branches):
        if bcfg.kind == "gaitset" and bcfg.flatten_output:
            # BothDatasets variant: per-sample flatten + L2
            # (mj_uwyhNets_bothDatasets.py:395-399)
            e = F.l2_normalize(e.reshape(e.shape[0], -1), axis=-1)
        if cfg.norm_before_merge:
            e = F.l2_normalize(e, axis=-1)
        gated.append(F.gate(e, u))

    if cfg.multimodal:
        fused = F.MERGES[cfg.merge](gated)
        sig = F.signature(fused, l2_mode=cfg.l2_mode)
    else:
        # reference quirk parity: the single-modality nets emit the raw
        # branch output as the signature with NO L2 normalization
        # (mj_uwyhNets_ba.py:890-907 — the comment says normalize, the
        # code doesn't).
        fused = gated[0]
        sig = fused

    out: Dict[str, jax.Array] = {"branches": gated, "fused": fused}
    head_in = sig
    if cfg.extra_dense:
        act = _act(cfg.branches[0].activation,
                   cfg.branches[0].leaky_alpha)
        if cfg.postriplet == 2:
            # Dense BEFORE the triplet tap; L2-normed output is "code".
            x = act(nn.Dense(cfg.extra_dense[0], kernel_init=glorot,
                             dtype=dtype, name="extra_dense")(fused))
            code = F.l2_normalize(x, axis=-1)
            out["code"] = code
            sig = code
            head_in = nn.Dropout(cfg.dropout_code,
                                 deterministic=not train,
                                 name="dropcode")(x)
        else:
            x = act(nn.Dense(cfg.extra_dense[0], kernel_init=glorot,
                             dtype=dtype, name="extra_dense")(sig))
            out["code"] = x
            head_in = nn.Dropout(cfg.dropout_code,
                                 deterministic=not train,
                                 name="dropcode")(x)

    out["signature"] = sig
    flat = head_in.reshape(batch, -1)
    # the reference's Flatten layer (the typecode-3 tap) sits on the
    # dropcode output when extra_dense is set, not on the signature
    # (mj_uwyhNets_ba.py: Flatten feeds classprob from the dropout)
    out["flatten"] = flat

    if cfg.nclasses > 0:
        logits = nn.Dense(cfg.nclasses, kernel_init=glorot, dtype=dtype,
                          name="classprob")(flat)
        logits = logits.astype(jnp.float32)
        out["classprob_logits"] = logits
        out["classprob"] = nn.softmax(logits)
        if cfg.aux_losses:
            aux_logits = []
            for i, g in enumerate(gated):
                gi = g.reshape(batch, -1)
                al = nn.Dense(cfg.nclasses, kernel_init=glorot,
                              dtype=dtype,
                              name=f"classprob_{cfg.branches[i].modality}"
                              )(gi).astype(jnp.float32)
                aux_logits.append(al)
            out["aux_logits"] = aux_logits
    return out


class UGaitNet(nn.Module):
    config: ModelConfig

    @nn.compact
    def __call__(self, volumes: Sequence[jax.Array],
                 use_flags: Optional[Sequence[jax.Array]] = None,
                 train: bool = False) -> Dict[str, jax.Array]:
        """volumes[i]: (B, T, H, W, C_i) frame-major volume for branch i.
        use_flags[i]: (B,) or (B,1) presence flags (None => all present).
        """
        cfg = self.config
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        batch = volumes[0].shape[0]
        if use_flags is None:
            use_flags = [jnp.ones((batch,), jnp.float32) for _ in cfg.branches]

        embeddings: List[jax.Array] = []
        for i, bcfg in enumerate(cfg.branches):
            branch = make_branch(bcfg, dtype, name=f"branch_{bcfg.modality}",
                                 remat=cfg.remat, seq_axis=cfg.seq_axis)
            x = branch_input(bcfg, volumes[i])
            e = branch(x, train)  # positional: remat's static_argnums=(2,)
            embeddings.append(e)

        return _head_forward(cfg, embeddings, use_flags, train)


class UGaitHead(nn.Module):
    """The post-branch stage as a standalone module (pipeline parallelism,
    parallel/pipeline.py): applied to raw branch embeddings, its param
    tree and dropout-rng paths are IDENTICAL to the corresponding
    top-level subtrees of a UGaitNet (both call _head_forward in their own
    root scope), so one checkpoint serves both execution modes —
    tests/test_pipeline.py pins the equivalence."""
    config: ModelConfig

    @nn.compact
    def __call__(self, embeddings: Sequence[jax.Array],
                 use_flags: Sequence[jax.Array],
                 train: bool = False) -> Dict[str, jax.Array]:
        return _head_forward(self.config, embeddings, use_flags, train)


def init_params(model: UGaitNet, rng: jax.Array, batch: int = 2):
    cfg = model.config
    volumes = []
    for b in cfg.branches:
        volumes.append(jnp.zeros(
            (batch, NUM_FRAMES, FRAME_H, FRAME_W, b.in_channels),
            jnp.float32))
    flags = [jnp.ones((batch,), jnp.float32) for _ in cfg.branches]
    params_rng, drop_rng = jax.random.split(rng)
    return model.init({"params": params_rng, "dropout": drop_rng},
                      volumes, flags, train=False)
