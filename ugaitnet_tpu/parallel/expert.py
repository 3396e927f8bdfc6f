"""Expert parallelism: the MoE expert axis sharded over a ("data","expert") mesh.

TPU-native extension (the reference is data-parallel only,
/root/reference/mains/mj_trainUWYHGaitNet_DataGen_CasiaB.py:214-224; it has
no MoE at all).  Pairs with the MoE part projection (ops/moe.py /
BranchConfig.moe_experts): each branch's

  expert_proj  (E, C, D)   E sharded over the "expert" axis
  router       (C, E)      replicated (tiny; every device routes locally)

Everything is GSPMD, same pattern as tensor parallelism (parallel/tensor.py):
annotate the parameters, jit the unchanged train step, and XLA propagates
the expert sharding through the dispatch einsum — the (E, Cap, C) dispatched
activations and (E, Cap, D) expert outputs land E-sharded, so each device
runs only its experts' matmuls and the dispatch/combine contractions lower
to the token exchange over ICI.  Optimizer moments mirror the param tree,
so one placement rule covers both.

The static-capacity top-1 routing keeps every shape trace-time constant —
no ragged all_to_all, no data-dependent shapes, exactly what GSPMD wants.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ugaitnet_tpu.parallel.sharding import DATA_AXIS
from ugaitnet_tpu.parallel.tensor import _path_keys, make_placed_train_step

EXPERT_AXIS = "expert"


def make_mesh_dpep(dp: int, ep: int,
                   devices: Optional[Sequence] = None) -> Mesh:
    """(dp x ep) mesh over the first dp*ep devices."""
    devs = list(devices if devices is not None else jax.devices())
    need = dp * ep
    if len(devs) < need:
        raise ValueError(f"need {need} devices for a ({dp},{ep}) mesh, "
                         f"have {len(devs)}")
    return Mesh(np.asarray(devs[:need]).reshape(dp, ep),
                (DATA_AXIS, EXPERT_AXIS))


def _leaf_spec(path, leaf, ep: int) -> P:
    """expert_proj (E, C, D) shards on E when ep divides it; everything
    else (routers, convs, heads, optimizer scalars) is replicated —
    an indivisible expert count falls back to replicated, still correct."""
    keys = _path_keys(path)
    leaf_name = keys[-1] if keys else ""
    shape = getattr(leaf, "shape", ())
    if (leaf_name == "expert_proj" and getattr(leaf, "ndim", 0) == 3
            and shape[0] % ep == 0):
        return P(EXPERT_AXIS, None, None)
    return P()


def state_shardings(state: Any, mesh: Mesh) -> Any:
    ep = mesh.shape[EXPERT_AXIS]
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _leaf_spec(path, leaf, ep)),
        state)


def place_ep_state(state: Any, mesh: Mesh) -> Any:
    """Shard a host/single-device TrainState onto the (data, expert) mesh."""
    return jax.device_put(state, state_shardings(state, mesh))


def make_ep_train_step(model, tx, mcfg, tcfg, mesh: Mesh):
    """Jitted train step over the ("data", "expert") mesh; state arrives
    via place_ep_state, batch via sharding.shard_batch."""
    if not mcfg.has_moe:
        raise ValueError(
            "expert parallelism requires a branch with moe_experts > 0 "
            "(BranchConfig.moe_experts) — there is no expert axis to shard")
    return make_placed_train_step(model, tx, mcfg, tcfg, mesh,
                                  state_shardings)
