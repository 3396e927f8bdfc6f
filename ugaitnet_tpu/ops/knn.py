"""Device-side kNN gallery search.

Replaces sklearn.KNeighborsClassifier in the open-world protocol
(/root/reference/mains/mj_testUWYHGaitNet_open_casiab.py:389-393) with a
tiled distance-matrix + top-k on the MXU: probes x gallery distances are one
matmul, lax.top_k picks neighbors, and the vote runs as a one-hot matmul —
no host round-trip until the final labels.

Vote parity: sklearn with uniform weights sums votes per class and takes the
argmin-index class on ties (np.argmax over class-ordered counts). We vote via
a one-hot sum over the k neighbor labels and argmax over sorted unique class
ids, which matches.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def pairwise_l2(probes: jax.Array, gallery: jax.Array) -> jax.Array:
    """(P, D) x (G, D) -> (P, G) squared-L2 distances (monotone in L2, so
    neighbor order matches sklearn's euclidean metric)."""
    p2 = jnp.sum(jnp.square(probes), axis=1, keepdims=True)
    g2 = jnp.sum(jnp.square(gallery), axis=1)
    dot = jnp.matmul(probes, gallery.T, preferred_element_type=jnp.float32)
    return jnp.maximum(p2 + g2[None, :] - 2.0 * dot, 0.0)


def quantize_gallery(codes: np.ndarray) -> Tuple[np.ndarray, np.ndarray,
                                                 np.ndarray]:
    """Symmetric per-ROW int8 quantization: (int8 codes, (G,) scales, |g|^2).

    Per-row scales so one outlier code cannot degrade int8 resolution for
    every other gallery row (a global max-abs scale would).  The squared
    norms are computed from the ORIGINAL codes, so only the cross term of
    the distance is quantized (pairwise_l2_int8).  For pod-scale galleries
    this is the int8 win the convs never delivered (CLAUDE.md "int8
    inference findings"): the (P,D)x(D,G) distance matmul at large G is
    gallery-bandwidth-bound, and int8 quarters the bytes read per query
    besides doubling the MXU rate — and a 16 GB v5e holds a 4x larger
    gallery resident.  The (G,) f32 scale vector adds 4 bytes/row next to
    D>=992 int8 code bytes (<0.5% overhead).
    """
    codes = np.asarray(codes, np.float32)
    if codes.size == 0:
        return (codes.astype(np.int8),
                np.ones((codes.shape[0],), np.float32),
                np.zeros((codes.shape[0],), np.float32))
    scale = np.maximum(np.max(np.abs(codes), axis=1), 1e-30) / 127.0
    q = np.clip(np.rint(codes / scale[:, None]), -127, 127).astype(np.int8)
    g2 = np.sum(np.square(codes), axis=1).astype(np.float32)
    return q, scale.astype(np.float32), g2


def pairwise_l2_int8(probes: jax.Array, gallery_i8: jax.Array,
                     gallery_scale, g2: jax.Array) -> jax.Array:
    """(P, D) f32 x (G, D) int8 -> (P, G) squared-L2.

    Probes are quantized per ROW (symmetric max-abs — a single large-norm
    probe does not cost the rest of the bucket precision); the cross term
    runs as an int8 x int8 -> int32 MXU matmul and is rescaled in f32 by
    the per-row probe scales and per-row gallery scales ((G,) vector or a
    legacy scalar — both broadcast); |q|^2 and |g|^2 stay exact f32.  For
    L2-normalized signature codes the neighbor-order perturbation is
    O(1e-3) of the distance — top-1 parity is pinned by
    tests/test_knn_int8.py.
    """
    p2 = jnp.sum(jnp.square(probes), axis=1, keepdims=True)
    ps = jnp.maximum(jnp.max(jnp.abs(probes), axis=1, keepdims=True),
                     1e-30) / 127.0
    q_i8 = jnp.clip(jnp.round(probes / ps), -127, 127).astype(jnp.int8)
    dot_i32 = jax.lax.dot_general(
        q_i8, gallery_i8, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)
    gscale = jnp.asarray(gallery_scale, jnp.float32)
    gscale = gscale[None, :] if gscale.ndim == 1 else gscale
    dot = dot_i32.astype(jnp.float32) * ps * gscale
    return jnp.maximum(p2 + g2[None, :] - 2.0 * dot, 0.0)


@functools.partial(jax.jit, static_argnames=("k", "num_classes"))
def _knn_device(probes, gallery, gallery_labels, k: int, num_classes: int):
    d2 = pairwise_l2(probes, gallery)
    neg = -d2
    _, idx = jax.lax.top_k(neg, k)                      # (P, k) nearest
    neighbor_labels = gallery_labels[idx]               # (P, k)
    votes = jax.nn.one_hot(neighbor_labels, num_classes, dtype=jnp.float32)
    counts = jnp.sum(votes, axis=1)                     # (P, C)
    return jnp.argmax(counts, axis=1), d2


def knn_predict(probes: np.ndarray, gallery: np.ndarray,
                gallery_labels: np.ndarray, k: int = 3,
                batch: int = 4096) -> np.ndarray:
    """Predict probe labels by kNN vote over the gallery.

    Labels may be arbitrary ints; they are densified to [0, C) on host and
    mapped back after the vote.
    """
    gallery_labels = np.asarray(gallery_labels)
    ulabs, dense = np.unique(gallery_labels, return_inverse=True)
    probes = jnp.asarray(np.asarray(probes, dtype=np.float32))
    gal = jnp.asarray(np.asarray(gallery, dtype=np.float32))
    dense = jnp.asarray(dense.astype(np.int32))
    k = min(k, gal.shape[0])

    preds = []
    for s in range(0, probes.shape[0], batch):
        pred, _ = _knn_device(probes[s:s + batch], gal, dense, k, len(ulabs))
        preds.append(np.asarray(pred))
    return ulabs[np.concatenate(preds)]


@functools.partial(jax.jit, static_argnames=("k", "num_classes"))
def _knn_device_int8(probes, gallery_i8, gscale, g2, gallery_labels,
                     k: int, num_classes: int):
    d2 = pairwise_l2_int8(probes, gallery_i8, gscale, g2)
    neg = -d2
    _, idx = jax.lax.top_k(neg, k)
    neighbor_labels = gallery_labels[idx]
    votes = jax.nn.one_hot(neighbor_labels, num_classes, dtype=jnp.float32)
    counts = jnp.sum(votes, axis=1)
    return jnp.argmax(counts, axis=1), d2


def pad_gallery_int8(q: np.ndarray, scale: np.ndarray, g2: np.ndarray,
                     dense_labels: np.ndarray, multiple: int):
    """Pad a quantized gallery to a row-count multiple with +inf-distance
    sentinels (q=0, |g|^2=1e12) so row-sharding divides evenly; the
    sentinels can never enter a top-k as long as k <= real rows."""
    pad = (-len(q)) % multiple
    if not pad:
        return q, scale, g2, dense_labels
    return (np.concatenate([q, np.zeros((pad, q.shape[1]), np.int8)]),
            np.concatenate([scale, np.ones(pad, np.float32)]),
            np.concatenate([g2, np.full(pad, 1e12, np.float32)]),
            np.concatenate([dense_labels, np.zeros(pad, np.int32)]))


def knn_predict_sharded(probes: np.ndarray, gallery: np.ndarray,
                        gallery_labels: np.ndarray, mesh, k: int = 3,
                        gallery_dtype: str = "float32") -> np.ndarray:
    """kNN with the gallery row-sharded over a device mesh.

    For galleries too large for one chip's HBM: codes + labels are placed
    with axis 0 sharded over the mesh's data axis, probes replicated; GSPMD
    partitions the distance matmul (each chip scores its gallery rows —
    traffic rides the probe replication, not the gallery) and assembles the
    global top-k.  gallery_dtype="int8" quantizes per row on host
    (shard-independent, so results match the single-device int8 path
    exactly) and runs the cross term as an int8 MXU matmul — 4x gallery
    rows per chip on top of the sharding.  Label parity with knn_predict is
    pinned on the virtual mesh (tests/test_knn_int8.py, test_eval.py).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P
    gallery_labels = np.asarray(gallery_labels)
    ulabs, dense = np.unique(gallery_labels, return_inverse=True)
    axis = mesh.axis_names[0]
    row_sh = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())
    n = mesh.shape[axis]
    d_lab = dense.astype(np.int32)
    pr = jax.device_put(jnp.asarray(np.asarray(probes, np.float32)), rep)
    k = min(k, len(gallery))
    if gallery_dtype == "int8":
        q, scale, g2 = quantize_gallery(np.asarray(gallery))
        q, scale, g2, d_lab = pad_gallery_int8(q, scale, g2, d_lab, n)
        pred, _ = _knn_device_int8(
            pr, jax.device_put(jnp.asarray(q), row_sh),
            jax.device_put(jnp.asarray(scale), row_sh),
            jax.device_put(jnp.asarray(g2), row_sh),
            jax.device_put(jnp.asarray(d_lab), row_sh), k, len(ulabs))
        return ulabs[np.asarray(pred)]
    g = np.asarray(gallery, np.float32)
    pad = (-len(g)) % n
    if pad:  # pad with +inf-distance sentinels so sharding divides evenly
        g = np.concatenate([g, np.full((pad, g.shape[1]), 1e6, np.float32)])
        d_lab = np.concatenate([d_lab, np.zeros(pad, np.int32)])
    gal = jax.device_put(jnp.asarray(g), row_sh)
    lab = jax.device_put(jnp.asarray(d_lab), row_sh)
    pred, _ = _knn_device(pr, gal, lab, k, len(ulabs))
    return ulabs[np.asarray(pred)]


def knn_predict_with_distances(probes: np.ndarray, gallery: np.ndarray,
                               gallery_labels: np.ndarray, k: int = 3
                               ) -> Tuple[np.ndarray, np.ndarray]:
    """Like knn_predict but also returns the full (P, G) distance matrix
    (used by the averaged-code video protocol)."""
    gallery_labels = np.asarray(gallery_labels)
    ulabs, dense = np.unique(gallery_labels, return_inverse=True)
    k = min(k, gallery.shape[0])
    pred, d2 = _knn_device(jnp.asarray(probes, dtype=jnp.float32),
                           jnp.asarray(gallery, dtype=jnp.float32),
                           jnp.asarray(dense.astype(np.int32)), k, len(ulabs))
    return ulabs[np.asarray(pred)], np.sqrt(np.asarray(d2))
