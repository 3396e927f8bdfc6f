"""Jitted training step: multi-loss objective, optimizers, regularization.

Re-derives the reference's compile-time objective
(/root/reference/nets/mj_uwyhNets_ba.py:861-933):
  loss = w_ver * triplet(signature)
       + w_id  * CE(classprob)        [+ label smoothing / focal]
       + w_aux * CE(per-branch aux heads)
       + explicit L2 regularization terms (Keras kernel_regularizer parity)

and the optimizer menu of the mains (Adam / SGD+momentum+decay / AMSGrad /
AdamW, mains/mj_trainUWYHGaitNet_DataGen_CasiaB.py:227-238).

Everything is one jit with donated state; the only host exchange per step is
the scalar metrics dict.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ugaitnet_tpu.core.config import ModelConfig, TrainConfig
from ugaitnet_tpu.models.network import UGaitNet
from ugaitnet_tpu.ops import losses as L
from ugaitnet_tpu.ops.triplet import make_triplet_loss


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any


def keras_adam(learning_rate, b1: float = 0.9, b2: float = 0.999,
               eps: float = 1e-7) -> optax.GradientTransformation:
    """EXACT Keras Adam (both tf_keras legacy and 2.11+ Adam use this form):

        alpha_t = lr * sqrt(1 - b2^t) / (1 - b1^t)
        m_t = b1*m + (1-b1)*g ;  v_t = b2*v + (1-b2)*g^2
        p  -= alpha_t * m_t / (sqrt(v_t) + eps)

    optax.adam instead computes m_hat/(sqrt(v_hat) + eps): the epsilon
    lands on the BIAS-CORRECTED sqrt(v) (equivalent to eps*sqrt(1-b2^t)
    in the Keras form), so the two diverge measurably over a trajectory
    at keras's large default eps=1e-7.  This form makes N optimizer steps
    here bit-track N Keras steps (benchmarks/training_parity.py), which
    matters for migrating mid-training reference checkpoints.
    Matches /root/reference mains' compile optimizer ('Adam', e.g.
    mains/mj_trainUWYHGaitNet_DataGen_2mod.py) stepped by Keras.
    """
    def init(params):
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree_util.tree_map(jnp.zeros_like, params),
            nu=jax.tree_util.tree_map(jnp.zeros_like, params))

    def update(updates, state, params=None):
        del params
        mu = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1.0 - b1) * g, state.mu, updates)
        nu = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1.0 - b2) * jnp.square(g),
            state.nu, updates)
        count = state.count + 1
        t = count.astype(jnp.float32)
        alpha = (learning_rate * jnp.sqrt(1.0 - jnp.float32(b2) ** t)
                 / (1.0 - jnp.float32(b1) ** t))
        out = jax.tree_util.tree_map(
            lambda m, v: -alpha * m / (jnp.sqrt(v) + eps), mu, nu)
        return out, optax.ScaleByAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    """All optimizers are wrapped in inject_hyperparams so the learning rate
    lives in opt_state and host-side schedulers (train/schedule.py) can
    change it without recompiling the jitted step."""
    name = cfg.optimizer.lower()
    if name == "adam":
        return optax.inject_hyperparams(optax.adam)(learning_rate=cfg.lr)
    if name == "adam_keras":
        return optax.inject_hyperparams(keras_adam)(learning_rate=cfg.lr)
    if name == "amsgrad":
        return optax.inject_hyperparams(optax.amsgrad)(learning_rate=cfg.lr)
    if name == "adamw":
        return optax.inject_hyperparams(optax.adamw)(
            learning_rate=cfg.lr, weight_decay=1e-4)
    if name == "sgd":
        # Keras SGD(lr, momentum, decay=1e-05): effective lr is
        # base_lr / (1 + 1e-5 * iter).  The decay rides scale_by_schedule
        # and the BASE lr is the injected (settable) hyperparam — passing
        # the whole schedule as learning_rate would make inject_hyperparams
        # recompute it every step and silently discard set_lr (so plateau
        # reductions and the fine-tune lr reset were no-ops for sgd).
        # Keras applies its decay to the CURRENT base lr the same way.
        def sgd_decay(learning_rate, momentum):
            return optax.chain(
                optax.trace(decay=momentum, nesterov=False),
                optax.scale_by_schedule(
                    lambda count: 1.0 / (1.0 + 1e-5 * count)),
                optax.scale(-learning_rate))
        return optax.inject_hyperparams(sgd_decay)(
            learning_rate=cfg.lr, momentum=cfg.momentum)
    raise ValueError(f"unknown optimizer {cfg.optimizer}")


def get_lr(state: "TrainState") -> float:
    return float(state.opt_state.hyperparams["learning_rate"])


def set_lr(state: "TrainState", lr: float) -> "TrainState":
    hp = dict(state.opt_state.hyperparams)
    hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return state.replace(opt_state=state.opt_state._replace(hyperparams=hp))


def l2_regularization(params: Any, mcfg: ModelConfig) -> jax.Array:
    """Explicit Keras kernel_regularizer parity.

    conv2d branches: l2(weight_decay) on every conv kernel
    (mj_uwyhNets_ba.py:82,88) and l2(1e-3) on the final code dense (:104).
    conv3d branches: l2(1e-3) on the 1x1x1 code conv (:367). The gaitset
    branch has no kernel regularizers. Keras l2(c) adds c * sum(w^2).
    """
    total = jnp.float32(0.0)
    tree = params["params"] if "params" in params else params
    for bcfg in mcfg.branches:
        bp = tree.get(f"branch_{bcfg.modality}")
        if bp is None:
            continue
        if bcfg.kind == "conv2d":
            for name, mod in bp.items():
                if name.startswith("conv"):
                    total += bcfg.weight_decay * jnp.sum(
                        jnp.square(mod["kernel"]))
            total += 1e-3 * jnp.sum(jnp.square(bp["code"]["kernel"]))
        elif bcfg.kind == "conv3d":
            total += 1e-3 * jnp.sum(jnp.square(bp["code"]["kernel"]))
    return total


class Batch(NamedTuple):
    volumes: Tuple[jax.Array, ...]
    use_flags: Tuple[jax.Array, ...]
    labels: jax.Array  # dense int ids


def compute_losses(model: UGaitNet, params, batch: Batch, key,
                   mcfg: ModelConfig, tcfg: TrainConfig, train: bool = True
                   ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    rngs = {"dropout": key} if train else None
    if mcfg.has_moe:
        # MoE branches sow their Switch load-balance terms into the "moe"
        # collection (models/gaitset.py); apply with it mutable to collect
        # them.  The sown values are functions of params, so the aux loss
        # back-propagates into the router/experts as usual.
        out, mvars = model.apply(
            params, list(batch.volumes), list(batch.use_flags),
            train=train, rngs=rngs, mutable=["moe"])
        moe_aux = jnp.float32(0.0)
        for v in jax.tree_util.tree_leaves(mvars.get("moe", {})):
            moe_aux += jnp.sum(v)
        return losses_from_outputs(out, params, batch, mcfg, tcfg,
                                   moe_aux=moe_aux)
    out = model.apply(params, list(batch.volumes), list(batch.use_flags),
                      train=train, rngs=rngs)
    return losses_from_outputs(out, params, batch, mcfg, tcfg)


def losses_from_outputs(out: Dict[str, jax.Array], params, batch: Batch,
                        mcfg: ModelConfig, tcfg: TrainConfig,
                        moe_aux=None
                        ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Loss assembly from forward outputs — shared by compute_losses and
    the pipeline-parallel head stage (parallel/pipeline.py), so the
    objective cannot drift between execution modes.  `params` is only
    read for the explicit L2 regularization terms."""
    triplet_fn = make_triplet_loss(tcfg.triplet_kind, tcfg.margin)

    lw = list(tcfg.loss_weights)
    metrics: Dict[str, jax.Array] = {}
    total = jnp.float32(0.0)

    l_tri = triplet_fn(out["signature"], batch.labels)
    metrics["triplet"] = l_tri
    total += lw[0] * l_tri

    if mcfg.nclasses > 0 and not tcfg.only_triplet:
        onehot = jax.nn.one_hot(batch.labels, mcfg.nclasses)
        if tcfg.use_focal:
            l_id = L.sigmoid_focal_crossentropy(out["classprob"], onehot)
        else:
            l_id = L.softmax_crossentropy_logits(
                out["classprob_logits"], onehot, tcfg.label_smoothing)
        metrics["id_ce"] = l_id
        metrics["acc"] = L.accuracy(out["classprob"], onehot)
        w_id = lw[1] if len(lw) > 1 else 1.0
        total += w_id * l_id

        if mcfg.aux_losses and "aux_logits" in out:
            # pad weights with the last value (mj_uwyhNets_ba.py:880-884)
            while len(lw) < 2 + len(out["aux_logits"]):
                lw.append(lw[-1])
            for i, al in enumerate(out["aux_logits"]):
                l_aux = L.softmax_crossentropy_logits(
                    al, onehot, tcfg.label_smoothing)
                metrics[f"aux_ce_{i}"] = l_aux
                total += lw[2 + i] * l_aux

    if moe_aux is not None:
        metrics["moe_aux"] = moe_aux
        total += tcfg.moe_aux_weight * moe_aux

    reg = l2_regularization(params, mcfg)
    metrics["reg"] = reg
    total += reg
    metrics["loss"] = total
    return total, metrics


def make_train_step_fn(model: UGaitNet, tx: optax.GradientTransformation,
                       mcfg: ModelConfig, tcfg: TrainConfig):
    """The un-jitted step function (for callers that jit with their own
    options — benchmarks/step_opts.py, sharded wrappers)."""
    def step(state: TrainState, batch: Batch, key: jax.Array):
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


def make_train_step(model: UGaitNet, tx: optax.GradientTransformation,
                    mcfg: ModelConfig, tcfg: TrainConfig):
    return jax.jit(make_train_step_fn(model, tx, mcfg, tcfg),
                   donate_argnums=(0,))


class PairBatch(NamedTuple):
    """Two aligned sample tuples + same/different labels (1=same subject)."""
    batch1: Batch
    batch2: Batch
    pair_labels: jax.Array


def make_pair_train_step(model: UGaitNet, tx: optax.GradientTransformation,
                         mcfg: ModelConfig, tcfg: TrainConfig):
    """Siamese verification training (UWYHNet.build parity,
    /root/reference/nets/mj_uwyhNets_ba.py:154-245): both tuples run through
    the SAME branch weights; the margin contrastive VerifLossLayer drives the
    L2-normalized fused embeddings together/apart."""
    from ugaitnet_tpu.ops.losses import verif_pair_loss

    def embed(params, batch: Batch, key, train):
        out = model.apply(params, list(batch.volumes), list(batch.use_flags),
                          train=train, rngs={"dropout": key} if train else None)
        sig = out["signature"]
        return sig.reshape(sig.shape[0], -1)

    def step(state: TrainState, pair: PairBatch, key: jax.Array):
        k1, k2 = jax.random.split(jax.random.fold_in(key, state.step))

        def loss_fn(params):
            e1 = embed(params, pair.batch1, k1, True)
            e2 = embed(params, pair.batch2, k2, True)
            loss = verif_pair_loss(e1, e2, pair.pair_labels,
                                   margin=tcfg.margin)
            return loss, {"pair_loss": loss}

        (_, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(step=state.step + 1, params=params,
                          opt_state=opt_state), metrics

    return jax.jit(step, donate_argnums=(0,))


def make_eval_step(model: UGaitNet, mcfg: ModelConfig, tcfg: TrainConfig):
    def step(params, batch: Batch):
        _, metrics = compute_losses(model, params, batch,
                                    jax.random.PRNGKey(0), mcfg, tcfg,
                                    train=False)
        return metrics
    return jax.jit(step)


def init_state(model: UGaitNet, tx, rng: jax.Array, batch: int = 2
               ) -> TrainState:
    from ugaitnet_tpu.models.network import init_params
    params = init_params(model, rng, batch=batch)
    return TrainState(step=jnp.int32(0), params=params,
                      opt_state=tx.init(params))
