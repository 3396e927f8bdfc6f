"""Sequence parallelism: shard the gait set (time) axis across devices.

The reference processes every frame of a clip on one device (TimeDistributed
Keras branches, /root/reference/nets/mj_uwyhNets_ba.py:419-484); this module
is a TPU-native extension that splits the T frames of every clip over a
("data", "seq") mesh.  It works because the GaitSet trunk is *frame
separable*: every cross-frame interaction is a set max, and a global max
over T equals the max over devices of each device's local max.  Under
shard_map each device convolves only its T/sp frames; the three set pools
close over the mesh with one small differentiable all_gather each
(models/gaitset.py:_set_max — (B, sp, H, W, C) vs the (B, T, H, W, C)
activation it replaces), and everything after the pools (set stream, HPP,
heads, losses) is replicated compute on pooled maps.

What it buys: the frame-stream activations — the HBM peak of the train
step, (B, T, 64, 64, C) per stage — shrink by the seq factor, so clips
with many frames (or much larger batches) fit per chip without remat's
recompute cost.  Cost: the b-stream/head compute is duplicated sp times
(it is a few percent of the step) plus three ~(B, sp, 16..32^2, C)
gathers on ICI.

Gradient notes: params are replicated; each shard differentiates the SAME
global loss value (the set-pool all_gathers and the data-axis signature
gather make every shard's loss identical), and the collectives' transposes
(psum_scatter) already sum cross-shard cotangent contributions — so the
correct all-reduce is `pmean` over BOTH mesh axes, exactly like the pure-DP
shard_map step's pmean over "data" (verified to machine precision against
the single-device step in tests/test_sequence_parallel.py).

T need not divide the seq axis: shard_batch_sp pads the time axis by
REPEATING the last frame, which is exact for a max-pooled set (duplicate
set elements never change a max).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ugaitnet_tpu.parallel.sharding import (
    DATA_AXIS, _xla_triplet, make_local_loss)

SEQ_AXIS = "seq"


def make_mesh_dpsp(dp: int, sp: int,
                   devices: Optional[Sequence] = None) -> Mesh:
    """(dp x sp) ("data", "seq") mesh over the first dp*sp devices."""
    devs = list(devices if devices is not None else jax.devices())
    need = dp * sp
    if len(devs) < need:
        raise ValueError(f"need {need} devices for a ({dp},{sp}) mesh, "
                         f"have {len(devs)}")
    return Mesh(np.asarray(devs[:need]).reshape(dp, sp),
                (DATA_AXIS, SEQ_AXIS))


def pad_frames(volume: jax.Array, sp: int) -> jax.Array:
    """Pad (B, T, H, W, C) to T divisible by sp by repeating the last
    frame — exact under set-max pooling (a duplicated element never
    changes a max), NOT valid for mean-pooled set reductions."""
    t = volume.shape[1]
    pad = (-t) % sp
    if pad == 0:
        return volume
    rep = np.repeat(np.asarray(volume)[:, -1:], pad, axis=1)
    return np.concatenate([np.asarray(volume), rep], axis=1)


def shard_batch_sp(batch: Any, mesh: Mesh) -> Any:
    """Place a Batch on the ("data", "seq") mesh: volumes sharded
    (batch, time), flags/labels batch-sharded (replicated over seq)."""
    dp = mesh.shape[DATA_AXIS]
    sp = mesh.shape[SEQ_AXIS]
    b = batch.volumes[0].shape[0]
    if b % dp != 0:
        raise ValueError(
            f"global batch {b} not divisible by the {dp}-device data axis")
    vol_sh = NamedSharding(mesh, P(DATA_AXIS, SEQ_AXIS))
    row_sh = NamedSharding(mesh, P(DATA_AXIS))
    return type(batch)(
        volumes=tuple(jax.device_put(pad_frames(v, sp), vol_sh)
                      for v in batch.volumes),
        use_flags=tuple(jax.device_put(f, row_sh) for f in batch.use_flags),
        labels=jax.device_put(batch.labels, row_sh))


def make_sp_train_step(model, tx, mcfg, tcfg, mesh: Mesh):
    """Jitted (data, seq) shard_map train step.  State replicated, batch
    via shard_batch_sp.  Numerically identical to the shard_map DP step at
    the same data-axis layout (and to the single-device step under
    l2_mode="feature"); the seq axis only re-distributes the frame loop."""
    import dataclasses

    import optax
    from jax.sharding import PartitionSpec as P

    from ugaitnet_tpu.models.network import UGaitNet
    from ugaitnet_tpu.train.train_step import Batch, TrainState

    for b in mcfg.branches:
        if b.kind != "gaitset":
            raise ValueError(
                "sequence parallelism requires gaitset branches (set-pool "
                f"frame separability); branch kind {b.kind!r} is not")
    tcfg = _xla_triplet(tcfg)
    mcfg_sp = dataclasses.replace(mcfg, seq_axis=SEQ_AXIS)
    model_sp = UGaitNet(mcfg_sp)
    local_loss = make_local_loss(model_sp, mcfg_sp, tcfg, DATA_AXIS)
    nmods = len(mcfg.branches)
    batch_spec = Batch(
        volumes=tuple(P(DATA_AXIS, SEQ_AXIS) for _ in range(nmods)),
        use_flags=tuple(P(DATA_AXIS) for _ in range(nmods)),
        labels=P(DATA_AXIS))

    def sharded_step(state: TrainState, batch: Batch, key: jax.Array):
        def per_shard(params, opt_state, step, batch):
            # fold the DATA index only: the frames of one sample live on
            # every seq shard and must see the SAME dropout draw, or the
            # post-pool "replicated" compute would silently diverge
            k = jax.random.fold_in(
                jax.random.fold_in(key, step),
                jax.lax.axis_index(DATA_AXIS))
            (_, metrics), grads = jax.value_and_grad(
                local_loss, has_aux=True)(params, batch, k)
            grads = jax.lax.pmean(grads, (DATA_AXIS, SEQ_AXIS))
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, metrics

        fn = jax.shard_map(
            per_shard, mesh=mesh,
            in_specs=(P(), P(), P(), batch_spec),
            out_specs=(P(), P(), P()),
            check_vma=False)
        params, opt_state, metrics = fn(state.params, state.opt_state,
                                        state.step, batch)
        return TrainState(step=state.step + 1, params=params,
                          opt_state=opt_state), metrics

    return jax.jit(sharded_step, donate_argnums=(0,))
