"""Tensor-parallel (2D mesh) training: data x model sharding for GaitSet nets.

The reference scales with data-parallel MirroredStrategy only
(/root/reference/mains/mj_trainUWYHGaitNet_DataGen_CasiaB.py:214-224); this
module is a TPU-native extension: a ("data", "model") mesh where the model
axis shards the GaitSet trunk Megatron-style and the 62-part head by parts.
Everything is GSPMD — we annotate the *parameters* and jit the unchanged
train step; XLA inserts the collectives (all-gathers between column/row
conv pairs ride ICI, one psum closes each row-parallel pair).

Sharding scheme per branch (models/gaitset.py):
  a_conv1/3/5, b_conv1/3   (k,k,ci,co)  co  sharded  ("column parallel")
  a_conv2/4/6, b_conv2/4   (k,k,ci,co)  ci  sharded  ("row parallel": the
        preceding conv's output channels are already sharded, so the
        contraction is local and one psum restores the full activation for
        the pool / set-pool / residual-add that follows)
  part_proj                (62,c3,d)    parts sharded (each shard projects
        its own strip of the HPP pyramid; the batch-all triplet loss vmaps
        over parts, so the per-part loss terms stay shard-local and the
        final mean is one scalar psum)
  classprob kernel         (62*d,ncls)  rows sharded (flatten keeps the
        parts-major order, so row blocks line up with the parts shards;
        logits close with a psum)
  biases / scalars / other kinds        replicated

conv2d / conv3d branches have no natural parts axis and stay replicated
(the step is still valid — those branches just run data-parallel).

Optimizer moments mirror the param tree (same trailing path keys), so one
path rule places params AND opt_state.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ugaitnet_tpu.parallel.sharding import DATA_AXIS, _xla_triplet

MODEL_AXIS = "model"

# column-parallel convs (out-channel sharded) vs row-parallel convs
# (in-channel sharded) — see module docstring for why they alternate
_CO_SHARDED = ("a_conv1", "a_conv3", "a_conv5", "b_conv1", "b_conv3")
_CI_SHARDED = ("a_conv2", "a_conv4", "a_conv6", "b_conv2", "b_conv4")


def make_mesh2d(dp: int, mp: int,
                devices: Optional[Sequence] = None) -> Mesh:
    """(dp x mp) mesh over the first dp*mp devices."""
    devs = list(devices if devices is not None else jax.devices())
    need = dp * mp
    if len(devs) < need:
        raise ValueError(f"need {need} devices for a ({dp},{mp}) mesh, "
                         f"have {len(devs)}")
    return Mesh(np.asarray(devs[:need]).reshape(dp, mp),
                (DATA_AXIS, MODEL_AXIS))


def _path_keys(path) -> list:
    keys = []
    for e in path:
        k = getattr(e, "key", None)
        if k is None:
            k = getattr(e, "name", None)
        if k is None:
            k = getattr(e, "idx", None)
        keys.append(str(k))
    return keys


def _leaf_spec(path, leaf, mp: int) -> P:
    """Partition rule keyed on the trailing (module, leaf) path names —
    identical for params and the optimizer moments that mirror them.

    A dim is only sharded when the model-axis size divides it (device_put
    and donation reject uneven shards); an indivisible tensor stays
    replicated — the step is still correct, just less sharded (e.g. the
    62-part projection shards at mp=2/31 but not mp=4)."""
    keys = _path_keys(path)
    leaf_name = keys[-1] if keys else ""
    parent = keys[-2] if len(keys) > 1 else ""
    nd = getattr(leaf, "ndim", 0)
    shape = getattr(leaf, "shape", ())

    def ok(dim):
        return shape[dim] % mp == 0

    if leaf_name == "part_proj" and nd == 3 and ok(0):
        return P(MODEL_AXIS, None, None)
    if leaf_name == "kernel" and nd == 4:
        if parent in _CO_SHARDED and ok(3):
            return P(None, None, None, MODEL_AXIS)
        if parent in _CI_SHARDED and ok(2):
            return P(None, None, MODEL_AXIS, None)
    if leaf_name == "kernel" and nd == 2 and parent == "classprob" and ok(0):
        return P(MODEL_AXIS, None)
    return P()


def state_shardings(state: Any, mesh: Mesh) -> Any:
    """NamedSharding pytree for a TrainState (params + optimizer moments)."""
    mp = mesh.shape[MODEL_AXIS]
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _leaf_spec(path, leaf, mp)),
        state)


def place_tp_state(state: Any, mesh: Mesh) -> Any:
    """Shard a host/single-device TrainState onto the 2D mesh."""
    return jax.device_put(state, state_shardings(state, mesh))


def make_placed_train_step(model, tx, mcfg, tcfg, mesh: Mesh,
                           state_shardings_fn):
    """Jitted train step over a 2D mesh with GSPMD-placed state.

    Shared by the tensor-parallel (this module) and expert-parallel
    (parallel/expert.py) modes — the two differ only in the placement rule
    `state_shardings_fn(state, mesh)`.  Same numerics as the single-device
    step (GSPMD partitions one traced program); batch arrives via
    shard_batch (axis 0 over the data axis only — every device in a model
    column sees the same rows).  Out-shardings pin the updated state to
    the same layout so donation reuses the buffers."""
    from ugaitnet_tpu.train.train_step import TrainState, compute_losses
    import optax

    tcfg = _xla_triplet(tcfg)

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

    # the out_shardings pytree needs the state structure, which only the
    # first call provides — build the jit wrapper once and reuse it (a new
    # jax.jit object per call would carry an empty compile cache each time)
    _jit = {}

    def jitted(state: TrainState, batch, key):
        if "fn" not in _jit:
            st_shard = state_shardings_fn(state, mesh)
            rep = NamedSharding(mesh, P())
            _jit["fn"] = jax.jit(step, donate_argnums=(0,),
                                 out_shardings=(st_shard, rep))
        return _jit["fn"](state, batch, key)

    return jitted


def make_tp_train_step(model, tx, mcfg, tcfg, mesh: Mesh):
    """Jitted train step over the ("data", "model") mesh; state arrives
    via place_tp_state."""
    return make_placed_train_step(model, tx, mcfg, tcfg, mesh,
                                  state_shardings)


def shard_count(x: jax.Array) -> int:
    """Distinct device buffers holding non-identical slices (test helper)."""
    shape = x.sharding.shard_shape(x.shape)
    return int(np.prod(x.shape) // max(1, np.prod(shape)))
