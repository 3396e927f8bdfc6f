"""Pipeline (branch-placement) parallelism: one device per modality branch.

The reference trains multimodal nets on one GPU (its only parallelism is
MirroredStrategy DP, mains/mj_trainUWYHGaitNet_DataGen_CasiaB.py:342-349).
This module is a TPU-native extension for the model-parallel regime that
actually fits this architecture: the per-modality branch trunks are
completely independent subgraphs (>95% of the step's FLOPs) joined only at
the tiny gating/merge/head stage, so the natural pipeline split is
*branch placement* — branch i's params and compute live on device i, the
head stage runs on device 0, and activations (a few MB of (B, 62, 256)
embeddings) flow point-to-point over ICI.  Not GPipe stage-chaining: a
stage split along depth would be 98/2 imbalanced here, while branch
placement runs the heavy trunks genuinely CONCURRENTLY (jax dispatch is
async — the host enqueues branch i's forward on device i and returns
immediately).

Schedule per step (all dispatches async, host never blocks):
  1. branch params + volumes -> device i;  e_i = branch_fwd_i()     [parallel]
  2. e_i -> device 0;  head value_and_grad: loss, head grads, de_i
     (includes the explicit L2 reg terms for ALL params, so branch
     kernels' reg-gradients come out of this stage too)
  3. de_i -> device i;  branch_bwd_i recomputes the branch forward and
     transposes it (rematerialized backward — GPipe does the same; the
     residuals never cross the jit boundary)                        [parallel]
  4. gradient trees summed (reg part + branch part), one optimizer
     update on device 0.

Numerics: identical operations to the single-device step — parity is
tested to the same tolerance as the TP/SP steps.  Per-branch dropout
would draw different streams than the monolithic model (flax folds rng
paths per module), so branch kinds with internal dropout (conv2d) are
rejected; head dropout (dropcode) matches exactly because UGaitHead's rng
paths equal UGaitNet's (models/network.py:_head_forward).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import optax

from ugaitnet_tpu.train.train_step import (
    Batch, TrainState, losses_from_outputs)


def _branch_keys(mcfg) -> list:
    return [f"branch_{b.modality}" for b in mcfg.branches]


def split_params(params, mcfg):
    """(branch_subtrees, head_subtree): disjoint top-level views of the
    usual UGaitNet param tree (one checkpoint serves both modes)."""
    p = params["params"]
    bkeys = _branch_keys(mcfg)
    branches = [p[k] for k in bkeys]
    head = {k: v for k, v in p.items() if k not in bkeys}
    return branches, head


def make_pipeline_train_step(model, tx, mcfg, tcfg,
                             devices: Optional[Sequence] = None):
    """(state, batch, key) -> (state, metrics), same contract as
    make_train_step; state/optimizer live on devices[0] = the head device,
    branch i's compute on devices[i % len(devices)]."""
    import jax.numpy as jnp

    from ugaitnet_tpu.models.network import (
        UGaitHead, branch_input, make_branch)
    from ugaitnet_tpu.parallel.sharding import _xla_triplet

    for b in mcfg.branches:
        if b.kind == "conv2d" and b.dropout > 0:
            raise ValueError(
                "pipeline parallelism cannot reproduce in-branch dropout "
                "streams (flax folds rngs per module path); set the "
                "conv2d branch dropout to 0 or train another way")
        if b.moe_experts > 0:
            raise ValueError(
                "pipeline parallelism does not collect the MoE "
                "load-balance aux loss from the trunk stages; train MoE "
                "models with the mesh steps (dp / parallel/expert.py)")
    tcfg = _xla_triplet(tcfg)  # Mosaic custom calls stay single-device
    devs = list(devices if devices is not None else jax.devices())
    if len(devs) < 2:
        raise ValueError("pipeline parallelism needs >= 2 devices")
    head_dev = devs[0]
    branch_dev = [devs[i % len(devs)] for i in range(len(mcfg.branches))]
    dtype = jnp.bfloat16 if mcfg.compute_dtype == "bfloat16" else jnp.float32

    head = UGaitHead(mcfg)
    branch_mods = [make_branch(b, dtype, name=f"branch_{b.modality}",
                               remat=mcfg.remat)
                   for b in mcfg.branches]

    def _fwd(i):
        bcfg = mcfg.branches[i]

        def f(bp, vol):
            return branch_mods[i].apply({"params": bp},
                                        branch_input(bcfg, vol), True)
        return jax.jit(f)

    def _bwd(i):
        bcfg = mcfg.branches[i]

        def f(bp, vol, de):
            # rematerialized transpose: re-run the forward under vjp and
            # pull the cotangent back to the branch params
            _, vjp = jax.vjp(
                lambda p: branch_mods[i].apply(
                    {"params": p}, branch_input(bcfg, vol), True), bp)
            return vjp(de)[0]
        return jax.jit(f)

    fwd = [_fwd(i) for i in range(len(mcfg.branches))]
    bwd = [_bwd(i) for i in range(len(mcfg.branches))]

    def _head_grad(params, embeddings, batch, key):
        def loss_fn(params, embeddings):
            bsub, hsub = split_params(params, mcfg)
            out = head.apply({"params": hsub}, list(embeddings),
                             list(batch.use_flags), train=True,
                             rngs={"dropout": key})
            # reg terms read the FULL param tree: branch kernels' L2
            # gradients flow from here (the only head->branch-param path)
            return losses_from_outputs(out, params, batch, mcfg, tcfg)
        (_, metrics), (g_params, g_emb) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(params, embeddings)
        return metrics, g_params, g_emb

    head_grad = jax.jit(_head_grad)

    def _apply(state, grads):
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(step=state.step + 1, params=params,
                          opt_state=opt_state)

    opt_apply = jax.jit(_apply, donate_argnums=(0,))
    bkeys = _branch_keys(mcfg)

    def step(state: TrainState, batch: Batch, key: jax.Array):
        key = jax.random.fold_in(key, state.step)
        bsub, _ = split_params(state.params, mcfg)
        # 1. trunk forwards, one per device, all enqueued before any waits
        bp, vols, embs = [], [], []
        for i, dev in enumerate(branch_dev):
            bp.append(jax.device_put(bsub[i], dev))
            vols.append(jax.device_put(batch.volumes[i], dev))
        for i, dev in enumerate(branch_dev):
            embs.append(fwd[i](bp[i], vols[i]))
        # 2. head fwd+bwd on the head device
        embs0 = [jax.device_put(e, head_dev) for e in embs]
        metrics, g_params, g_emb = head_grad(state.params, tuple(embs0),
                                             batch, key)
        # 3. trunk backwards, concurrent again
        g_branch = []
        for i, dev in enumerate(branch_dev):
            de = jax.device_put(g_emb[i], dev)
            g_branch.append(bwd[i](bp[i], vols[i], de))
        # 4. fold the branch cotangents into the reg-only entries and step
        gp = dict(g_params["params"])
        for i, k in enumerate(bkeys):
            reg_part = gp[k]
            moved = jax.device_put(g_branch[i], head_dev)
            gp[k] = jax.tree.map(lambda a, b: a + b, reg_part, moved)
        grads = dict(g_params)
        grads["params"] = gp
        return opt_apply(state, grads), metrics

    return step
