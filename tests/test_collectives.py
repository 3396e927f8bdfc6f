"""Collective-inventory audit for every mesh-parallel mode (VERDICT r3 #4).

Compiles each parallel train step on the 8-device CPU mesh, walks the
compiled HLO, and pins the collective inventory GSPMD inserted — kinds,
counts, and byte volumes tied to model quantities (grad all-reduce ~=
param bytes; shard_map DP's signature all-gather == B*parts*part_dim*4
exactly).  A jax/XLA upgrade that silently starts inserting extra
relayout collectives — which on real hardware would only show up as a
perf cliff — fails here loudly.

Calibrated against the measured inventory (benchmarks round 4, jax 0.8):
  gspmd_dp    : 9 colls — AR 243,904 B (= params + head glue), AG 8,480 B
  shardmap_dp : 5 colls — AR params+4, AG 32 + SIGNATURE (31,744), RS 3,968
  tp_2x4      : 100 colls — AR 50.2 MB (row-parallel activation psums),
                AG 3.9 MB, A2A 48 KB, CP 3.2 MB
  sp_2x4      : 17 colls — AG 1.87 MB (set-pool frame gathers), AR params,
                RS 475 KB (all_gather VJP), NO all-to-all
  ep_2x4      : 41 colls — AR params+aux; the static-capacity one-hot
                dispatch (ops/moe.py) lowers to small AG/CP, NOT
                all-to-all, at these sizes
Bounds are loose enough for compiler-version drift, tight enough that a
doubled inventory or an activation-sized stray collective trips them.
"""

import re

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ugaitnet_tpu.core.config import BranchConfig, ModelConfig, TrainConfig
from ugaitnet_tpu.models.network import UGaitNet
from ugaitnet_tpu.train.train_step import (Batch, TrainState, compute_losses,
                                           init_state, make_optimizer)

DTYPE_BYTES = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "f16": 2, "pred": 1,
               "s8": 1, "u8": 1, "f64": 8, "s64": 8, "u64": 8}

COLLECTIVE_RE = re.compile(
    r"=\s*((?:\([^)]*\)|\S+))\s+"
    r"(all-reduce|all-gather|all-to-all|collective-permute|reduce-scatter)"
    r"(?:-start)?\(")

B, T = 8, 25


def _shape_bytes(shape_str: str) -> int:
    total = 0
    for m in re.finditer(r"(\w+)\[([\d,]*)\]", shape_str):
        n = 1
        for d in m.group(2).split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES.get(m.group(1), 4)
    return total


def inventory(compiled) -> dict:
    """{kind: (count, total_output_bytes)} over the compiled HLO.

    Parse-health guard (ADVICE r4): the regex is calibrated to jax 0.8 HLO
    spellings.  Cross-check it against a plain opcode-token scan of the
    same text so a compiler upgrade that re-formats the lines fails with
    "HLO parse drift", not a silently-wrong inventory.
    """
    text = compiled.as_text()
    agg = {}
    for line in text.splitlines():
        m = COLLECTIVE_RE.search(line)
        if m and "-done" not in line.split("=")[0]:
            kind = m.group(2)
            c, b = agg.get(kind, (0, 0))
            agg[kind] = (c + 1, b + _shape_bytes(m.group(1)))
    for kind in ("all-reduce", "all-gather", "all-to-all",
                 "collective-permute", "reduce-scatter"):
        token_count = len(re.findall(
            rf"\b{kind}(?:-start)?\(", text))
        parsed = agg.get(kind, (0, 0))[0]
        assert parsed == token_count, (
            f"HLO parse drift: token scan sees {token_count} '{kind}' ops "
            f"but COLLECTIVE_RE parsed {parsed} — update the regex for "
            f"this jax/XLA version before trusting the inventory")
    return agg


def small_cfg(moe=0):
    kw = dict(gaitset_channels=(8, 8, 16), part_dim=16)
    if moe:
        kw["moe_experts"] = moe
    return ModelConfig(
        branches=(BranchConfig(kind="gaitset", modality="of", **kw),
                  BranchConfig(kind="gaitset", modality="gray", **kw)),
        merge="sign_max", nclasses=6)


def make_batch():
    rng = np.random.RandomState(0)
    return Batch(
        volumes=(jnp.asarray(rng.randn(B, T, 60, 60, 2), jnp.float32),
                 jnp.asarray(rng.randn(B, T, 60, 60, 1), jnp.float32)),
        use_flags=(jnp.ones((B,), jnp.float32),
                   jnp.ones((B,), jnp.float32)),
        labels=jnp.asarray(np.arange(B) % 4, jnp.int32))


@pytest.fixture(scope="module")
def parts():
    mcfg = small_cfg()
    tcfg = TrainConfig(lr=1e-3, loss_weights=(1.0, 0.1))
    model = UGaitNet(mcfg)
    tx = make_optimizer(tcfg)
    state = init_state(model, tx, jax.random.PRNGKey(0))
    pbytes = sum(x.size * 4 for x in jax.tree.leaves(state.params))
    return model, tx, mcfg, tcfg, state, pbytes


def _hand_step(model, tx, mcfg, tcfg):
    """Un-jitted step identical to make_placed_train_step's body."""
    import optax
    from ugaitnet_tpu.parallel.sharding import _xla_triplet
    tcfg = _xla_triplet(tcfg)

    def step(state, batch, key):
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
    return step


def test_gspmd_dp_collectives(parts):
    from ugaitnet_tpu.parallel.sharding import (make_mesh,
                                                make_sharded_train_step,
                                                replicate, shard_batch)
    model, tx, mcfg, tcfg, state, pbytes = parts
    mesh = make_mesh(8)
    step = make_sharded_train_step(model, tx, mcfg, tcfg, mesh)
    inv = inventory(step.lower(replicate(state, mesh),
                               shard_batch(make_batch(), mesh),
                               jax.random.PRNGKey(0)).compile())
    arc, arb = inv["all-reduce"]
    # grad psum dominates: ~= param bytes (+ head glue + metric scalars)
    assert pbytes <= arb <= 1.2 * pbytes, inv
    assert arc <= 10, inv
    agb = inv.get("all-gather", (0, 0))[1]
    assert agb <= 16_384, inv  # small glue only — no activation gathers
    assert "all-to-all" not in inv and "collective-permute" not in inv, inv


def test_shardmap_dp_collectives(parts):
    from ugaitnet_tpu.parallel.sharding import (make_mesh,
                                                make_shardmap_train_step,
                                                replicate, shard_batch)
    model, tx, mcfg, tcfg, state, pbytes = parts
    mesh = make_mesh(8)
    step = make_shardmap_train_step(model, tx, mcfg, tcfg, mesh)
    inv = inventory(step.lower(replicate(state, mesh),
                               shard_batch(make_batch(), mesh),
                               jax.random.PRNGKey(0)).compile())
    arc, arb = inv["all-reduce"]
    assert pbytes <= arb <= 1.05 * pbytes, inv       # explicit grad psum
    # the all-gather-before-loss (SURVEY §2.5): full signature, exactly
    sig_bytes = B * 62 * 16 * 4
    agc, agb = inv["all-gather"]
    assert sig_bytes <= agb <= sig_bytes + 4_096, inv
    assert inv.get("reduce-scatter", (0, 0))[1] <= 8_192, inv
    assert "all-to-all" not in inv and "collective-permute" not in inv, inv
    assert sum(c for c, _ in inv.values()) <= 8, inv


def test_tp_collectives(parts):
    from jax.sharding import NamedSharding, PartitionSpec as P
    from ugaitnet_tpu.parallel.sharding import shard_batch
    from ugaitnet_tpu.parallel.tensor import (make_mesh2d, place_tp_state,
                                              state_shardings)
    model, tx, mcfg, tcfg, state, pbytes = parts
    mesh = make_mesh2d(2, 4)
    st = place_tp_state(state, mesh)
    step = jax.jit(_hand_step(model, tx, mcfg, tcfg),
                   out_shardings=(state_shardings(st, mesh),
                                  NamedSharding(mesh, P())))
    inv = inventory(step.lower(st, shard_batch(make_batch(), mesh),
                               jax.random.PRNGKey(0)).compile())
    arb = inv["all-reduce"][1]
    # row-parallel convs psum ACTIVATIONS: orders of magnitude over params
    assert arb >= 10 * pbytes, inv
    # ... but bounded: catch a blowup (measured 50.2 MB; 2x headroom)
    assert arb <= 100e6, inv
    assert sum(c for c, _ in inv.values()) <= 140, inv


def test_sp_collectives(parts):
    from ugaitnet_tpu.parallel.sequence import (make_mesh_dpsp,
                                                make_sp_train_step,
                                                shard_batch_sp)
    from ugaitnet_tpu.parallel.sharding import replicate
    model, tx, mcfg, tcfg, state, pbytes = parts
    mesh = make_mesh_dpsp(2, 4)
    step = make_sp_train_step(model, tx, mcfg, tcfg, mesh)
    inv = inventory(step.lower(replicate(state, mesh),
                               shard_batch_sp(make_batch(), mesh),
                               jax.random.PRNGKey(0)).compile())
    arb = inv["all-reduce"][1]
    assert pbytes <= arb <= 1.2 * pbytes, inv        # grads only
    # set-pool frame gathers (models/gaitset._set_max): activation-sized
    agb = inv["all-gather"][1]
    assert 500_000 <= agb <= 4e6, inv                # measured 1.87 MB
    # their VJP reduce-scatters cotangents back to the owning shard
    assert inv["reduce-scatter"][1] >= 100_000, inv
    assert "all-to-all" not in inv, inv
    assert sum(c for c, _ in inv.values()) <= 25, inv


def test_ep_collectives(parts):
    from jax.sharding import NamedSharding, PartitionSpec as P
    from ugaitnet_tpu.parallel.expert import (make_mesh_dpep, place_ep_state,
                                              state_shardings)
    from ugaitnet_tpu.parallel.sharding import shard_batch
    mcfg = small_cfg(moe=4)
    tcfg = TrainConfig(lr=1e-3, loss_weights=(1.0, 0.1),
                       moe_aux_weight=0.01)
    model = UGaitNet(mcfg)
    tx = make_optimizer(tcfg)
    state = init_state(model, tx, jax.random.PRNGKey(0))
    pbytes = sum(x.size * 4 for x in jax.tree.leaves(state.params))
    mesh = make_mesh_dpep(2, 4)
    st = place_ep_state(state, mesh)
    step = jax.jit(_hand_step(model, tx, mcfg, tcfg),
                   out_shardings=(state_shardings(st, mesh),
                                  NamedSharding(mesh, P())))
    inv = inventory(step.lower(st, shard_batch(make_batch(), mesh),
                               jax.random.PRNGKey(0)).compile())
    arb = inv["all-reduce"][1]
    # non-expert params are replicated over BOTH axes while the dispatch
    # splits tokens over ep as well as dp, so their grads reduce over both
    # axes — ~2x param bytes of all-reduce is structural (measured 2.08x)
    assert pbytes <= arb <= 2.5 * pbytes, inv
    # the static-capacity one-hot dispatch stays matmul-shaped: GSPMD
    # lowers it to small gathers/permutes at these sizes, NOT a token
    # all-to-all, and nothing activation-sized
    assert inv.get("all-gather", (0, 0))[1] <= 200_000, inv
    assert inv.get("all-to-all", (0, 0))[1] <= 200_000, inv
    assert sum(c for c, _ in inv.values()) <= 60, inv
