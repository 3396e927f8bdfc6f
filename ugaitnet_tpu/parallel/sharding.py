"""Device-mesh sharding for data-parallel training over ICI.

TPU-native replacement for the reference's optional single-host
tf.distribute.MirroredStrategy (the only parallelism the reference has,
/root/reference/mains/mj_trainUWYHGaitNet_DataGen_CasiaB.py:342-349; SURVEY.md
§2.5): a 1-D "data" mesh over all chips, parameters replicated, the batch
sharded on axis 0, and the whole train step jitted with GSPMD. XLA inserts
the collectives: gradient psum over ICI (the NCCL-all-reduce analogue) and —
because the batch-all triplet loss is written over the *global* batch — an
all-gather of the (B, P, D) signatures before mining, which is the
parity-preserving choice (global-batch mining == single-device semantics;
see SURVEY.md §2.5 note).

Multi-host pods need no code change: jax.devices() spans hosts and each host
feeds its local shard via make_array_from_process_local_data.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: int = 0, devices: Optional[Sequence] = None) -> Mesh:
    devs = list(devices if devices is not None else jax.devices())
    if n_devices and n_devices > 0:
        if n_devices > len(devs):
            raise ValueError(
                f"requested a {n_devices}-device mesh but only "
                f"{len(devs)} device(s) are available "
                f"({[str(d) for d in devs]}); a silent fallback would "
                "train with a different effective batch than sized for")
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Place every leaf of a Batch pytree with its axis-0 sharded over the
    data axis of the mesh."""
    n = mesh.shape[DATA_AXIS]
    leaves = jax.tree.leaves(batch)
    if leaves and leaves[0].shape[0] % n != 0:
        raise ValueError(
            f"global batch {leaves[0].shape[0]} not divisible by the "
            f"{n}-device data axis; pick batch_size*expand_level divisible "
            f"by the device count")
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def _xla_triplet(tcfg):
    """Sharded steps force the XLA batch-all formulation: the pallas
    kernel (the single-chip TPU default, ops/triplet.py) is a Mosaic
    custom-call that the GSPMD partitioner cannot shard — at best it
    forces replication, and partitioning behavior on a real multi-chip
    mesh is unverifiable from this single-chip environment.  The XLA form
    partitions cleanly and is what every mesh test validates."""
    import dataclasses
    if tcfg.triplet_kind in ("batch_all", "batch_all_pallas"):
        # an explicit "batch_all_pallas" must be rewritten too — it is the
        # same Mosaic custom call, just forced rather than dispatched
        return dataclasses.replace(tcfg, triplet_kind="batch_all_xla")
    return tcfg


def make_sharded_train_step(model, tx, mcfg, tcfg, mesh: Mesh):
    """GSPMD train step: state replicated, batch data-sharded. Identical
    numerics to the single-device step (global-batch triplet mining)."""
    from ugaitnet_tpu.train.train_step import TrainState, compute_losses
    import optax

    tcfg = _xla_triplet(tcfg)
    rep = replicated(mesh)
    data = batch_sharding(mesh)

    def step(state: TrainState, batch, key):
        def loss_fn(params):
            return compute_losses(model, params, batch,
                                  jax.random.fold_in(key, state.step),
                                  mcfg, tcfg, train=True)
        (_, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(step=state.step + 1, params=params,
                          opt_state=opt_state), metrics

    # Inputs arrive committed (state via replicate(), batch via
    # shard_batch()); pinning the outputs keeps the updated state replicated
    # so donation reuses its buffers across steps.
    return jax.jit(step, donate_argnums=(0,),
                   out_shardings=(rep, rep))


def make_local_loss(model, mcfg, tcfg, axis: str = DATA_AXIS):
    """Per-shard loss with explicit collectives: all_gather of the
    (b_local, P, D) signatures + labels over `axis` before batch-all mining
    (the parity-preserving choice — the gathered embeddings are ~4 MB,
    cheap on ICI), `pmean` of the local CE/aux terms over `axis`.  Shared
    by the shard_map DP step below and the sequence-parallel step
    (parallel/sequence.py); tcfg must already be through _xla_triplet."""
    import jax.numpy as jnp
    from ugaitnet_tpu.ops import losses as L
    from ugaitnet_tpu.ops.triplet import make_triplet_loss
    from ugaitnet_tpu.train.train_step import Batch

    triplet_fn = make_triplet_loss(tcfg.triplet_kind, tcfg.margin)

    def local_loss(params, batch: Batch, key):
        moe_aux = None
        if mcfg.has_moe:
            # Same collection plumbing as train_step.compute_losses: the
            # Switch routers sow their load-balance terms into "moe";
            # without mutable=["moe"] the sow is a silent no-op and the
            # router trains unbalanced (round-3 advisor finding).
            out, mvars = model.apply(params, list(batch.volumes),
                                     list(batch.use_flags), train=True,
                                     rngs={"dropout": key},
                                     mutable=["moe"])
            moe_aux = jnp.float32(0.0)
            for v in jax.tree_util.tree_leaves(mvars.get("moe", {})):
                moe_aux += jnp.sum(v)
            # Routing is per-shard (local tokens), so the aux term is a
            # per-shard quantity — average it over the data axis exactly
            # like the CE terms so the pmean'd gradient matches.
            moe_aux = jax.lax.pmean(moe_aux, axis)
        else:
            out = model.apply(params, list(batch.volumes),
                              list(batch.use_flags), train=True,
                              rngs={"dropout": key})
        sig = out["signature"]
        sig_g = jax.lax.all_gather(sig, axis, axis=0, tiled=True)
        labels_g = jax.lax.all_gather(batch.labels, axis, axis=0, tiled=True)
        lw = list(tcfg.loss_weights)
        total = jnp.float32(lw[0]) * triplet_fn(sig_g, labels_g)
        metrics = {}
        if mcfg.nclasses > 0 and not tcfg.only_triplet:
            onehot = jax.nn.one_hot(batch.labels, mcfg.nclasses)
            if tcfg.use_focal:
                l_id = L.sigmoid_focal_crossentropy(out["classprob"], onehot)
            else:
                l_id = L.softmax_crossentropy_logits(
                    out["classprob_logits"], onehot, tcfg.label_smoothing)
            l_id = jax.lax.pmean(l_id, axis)
            w_id = lw[1] if len(lw) > 1 else 1.0
            total = total + w_id * l_id
            metrics["id_ce"] = l_id
            metrics["acc"] = jax.lax.pmean(
                L.accuracy(out["classprob"], onehot), axis)
            if mcfg.aux_losses and "aux_logits" in out:
                # pad weights with the last value (mj_uwyhNets_ba.py:880-884)
                while len(lw) < 2 + len(out["aux_logits"]):
                    lw.append(lw[-1])
                for i, al in enumerate(out["aux_logits"]):
                    l_aux = jax.lax.pmean(L.softmax_crossentropy_logits(
                        al, onehot, tcfg.label_smoothing), axis)
                    metrics[f"aux_ce_{i}"] = l_aux
                    total = total + lw[2 + i] * l_aux
        # Explicit L2 terms (Keras kernel_regularizer parity) — params are
        # replicated so this needs no collective.
        from ugaitnet_tpu.train.train_step import l2_regularization
        reg = l2_regularization(params, mcfg)
        metrics["reg"] = reg
        total = total + reg
        if moe_aux is not None:
            metrics["moe_aux"] = moe_aux
            total = total + tcfg.moe_aux_weight * moe_aux
        metrics["loss"] = total
        return total, metrics

    return local_loss


def make_shardmap_train_step(model, tx, mcfg, tcfg, mesh: Mesh):
    """Explicit-collectives data-parallel step (shard_map).

    The GSPMD step above gives global-batch semantics (identical to single
    device). This variant spells the collectives out, SURVEY.md §2.5 style:
    per-shard forward + make_local_loss's all_gather mining, then `pmean`
    of gradients (the NCCL-all-reduce analogue).

    Semantics note: with ModelConfig.l2_mode="reference" the signature
    normalizes over the LOCAL batch axis here — exactly what the reference's
    MirroredStrategy replicas did — whereas the GSPMD step normalizes over
    the global batch (single-device semantics). With l2_mode="feature" the
    two are numerically identical (tested).
    """
    import optax
    from ugaitnet_tpu.train.train_step import Batch, TrainState

    tcfg = _xla_triplet(tcfg)
    axis = DATA_AXIS
    local_loss = make_local_loss(model, mcfg, tcfg, axis)

    def sharded_step(state: TrainState, batch: Batch, key: jax.Array):
        def per_shard(params, opt_state, step, batch):
            k = jax.random.fold_in(
                jax.random.fold_in(key, step),
                jax.lax.axis_index(axis))  # distinct dropout per shard
            (_, metrics), grads = jax.value_and_grad(
                local_loss, has_aux=True)(params, batch, k)
            grads = jax.lax.pmean(grads, axis)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, metrics

        fn = jax.shard_map(
            per_shard, mesh=mesh,
            in_specs=(P(), P(), P(), P(DATA_AXIS)),
            out_specs=(P(), P(), P()),
            check_vma=False)
        params, opt_state, metrics = fn(state.params, state.opt_state,
                                        state.step, batch)
        return TrainState(step=state.step + 1, params=params,
                          opt_state=opt_state), metrics

    return jax.jit(sharded_step, donate_argnums=(0,))


def shard_batch_multihost(batch: Any, mesh: Mesh) -> Any:
    """Multi-host pods: every process passes its *local* shard of the global
    batch (the DCN data-sharding path, SURVEY.md §5.8); jax assembles the
    global array across hosts. On a single host this equals shard_batch."""
    if jax.process_count() == 1:
        return shard_batch(batch, mesh)
    sh = batch_sharding(mesh)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
        batch)
