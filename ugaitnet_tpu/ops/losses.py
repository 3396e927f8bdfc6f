"""Classification and pair/verification losses.

Parity targets:
  - categorical cross-entropy with optional label smoothing
    (/root/reference/nets/mj_uwyhNets_ba.py:865-878)
  - sigmoid focal cross-entropy (tfa.losses.SigmoidFocalCrossEntropy, used by
    the BothDatasets nets, /root/reference/nets/mj_uwyhNets_bothDatasets.py:694,745)
  - VerifLossLayer margin contrastive pair loss and smooth-L1 PairLossLayer
    (/root/reference/nets/mj_loss.py:38-106)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def categorical_crossentropy(probs: jax.Array, onehot: jax.Array,
                             label_smoothing: float = 0.0,
                             eps: float = 1e-7) -> jax.Array:
    """Keras CCE over *probabilities* (the reference heads end in softmax).

    Keras clips probabilities to [eps, 1-eps] before the log; smoothing mixes
    the one-hot target with uniform mass like tf.losses.CategoricalCrossentropy.
    """
    probs = probs.astype(jnp.float32)
    onehot = onehot.astype(jnp.float32)
    if label_smoothing > 0.0:
        n = onehot.shape[-1]
        onehot = onehot * (1.0 - label_smoothing) + label_smoothing / n
    probs = jnp.clip(probs, eps, 1.0 - eps)
    return jnp.mean(-jnp.sum(onehot * jnp.log(probs), axis=-1))


def softmax_crossentropy_logits(logits: jax.Array, onehot: jax.Array,
                                label_smoothing: float = 0.0) -> jax.Array:
    """Numerically-stable variant for when heads emit logits (preferred on TPU:
    fuses into one log-softmax instead of softmax+clip+log)."""
    logits = logits.astype(jnp.float32)
    onehot = onehot.astype(jnp.float32)
    if label_smoothing > 0.0:
        n = onehot.shape[-1]
        onehot = onehot * (1.0 - label_smoothing) + label_smoothing / n
    logp = jax.nn.log_softmax(logits, axis=-1)
    return jnp.mean(-jnp.sum(onehot * logp, axis=-1))


def sigmoid_focal_crossentropy(probs: jax.Array, onehot: jax.Array,
                               alpha: float = 0.25, gamma: float = 2.0,
                               from_logits: bool = False) -> jax.Array:
    """tfa.losses.SigmoidFocalCrossEntropy parity (per-sample sum over classes,
    mean over batch)."""
    y = onehot.astype(jnp.float32)
    if from_logits:
        p = jax.nn.sigmoid(probs.astype(jnp.float32))
        bce = jnp.maximum(probs, 0) - probs * y + jnp.log1p(jnp.exp(-jnp.abs(probs)))
    else:
        p = jnp.clip(probs.astype(jnp.float32), 1e-7, 1.0 - 1e-7)
        bce = -(y * jnp.log(p) + (1.0 - y) * jnp.log(1.0 - p))
    p_t = y * p + (1.0 - y) * (1.0 - p)
    alpha_f = y * alpha + (1.0 - y) * (1.0 - alpha) if alpha is not None else 1.0
    modulating = jnp.power(1.0 - p_t, gamma) if gamma else 1.0
    return jnp.mean(jnp.sum(alpha_f * modulating * bce, axis=-1))


def verif_pair_loss(emb1: jax.Array, emb2: jax.Array, labels: jax.Array,
                    margin: float = 0.5) -> jax.Array:
    """VerifLossLayer parity (/root/reference/nets/mj_loss.py:65-98).

    Positive pairs (label==1): 0.5 * sum of squared distances.
    Negative pairs (label==0): 0.5 * max(0, margin - sqrt(sum sq dists))^2,
    computed over the *pooled* residual of all negative pairs, as the
    reference does (a batch-level margin, not per-pair).
    """
    res2 = jnp.sum(jnp.square(emb1.astype(jnp.float32) - emb2.astype(jnp.float32)),
                   axis=-1)
    labels = labels.reshape(-1)
    pos = (labels == 1).astype(jnp.float32)
    neg = (labels == 0).astype(jnp.float32)
    xpos = 0.5 * jnp.sum(res2 * pos)
    # eps inside the sqrt: d(sqrt)/dx is inf at 0, and a batch with no
    # negative pairs (or identical gated-off embeddings) would NaN the
    # pair train step's gradients
    xneg = 0.5 * jnp.square(jnp.maximum(
        0.0, margin - jnp.sqrt(jnp.sum(res2 * neg) + 1e-12)))
    return xpos + xneg


def smooth_l1_pair_loss(emb1: jax.Array, emb2: jax.Array,
                        delta: float = 0.5) -> jax.Array:
    """PairLossLayer parity: Huber-style smooth-L1 summed over all elements
    (/root/reference/nets/mj_loss.py:38-54)."""
    x = jnp.abs(emb1.astype(jnp.float32) - emb2.astype(jnp.float32))
    return jnp.sum(jnp.where(x < delta, 0.5 * x * x, delta * (x - 0.5 * delta)))


def accuracy(probs: jax.Array, onehot: jax.Array) -> jax.Array:
    return jnp.mean((jnp.argmax(probs, -1) == jnp.argmax(onehot, -1)).astype(jnp.float32))
