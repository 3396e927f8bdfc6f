"""Network utilities: freezing, soft labels, filter/sprite image export.

Parity targets in /root/reference/nets/mj_utils.py:
  mj_freezeModel (:13-26)      -> freeze_mask + frozen_optimizer (functional
                                  freezing via optax.multi_transform — the
                                  JAX equivalent of layer.trainable=False)
  mj_softlabel (:238-248)      -> soft_labels
  mj_save_filters/3d (:134-235)-> save_filter_grid
  mj_save_sprite (:95-131)     -> save_sprite
"""

from __future__ import annotations

import math
import os
from typing import Any, Callable, Sequence

import jax
import numpy as np
import optax


def freeze_mask(params: Any, predicate: Callable[[str], bool]) -> Any:
    """Label tree: 'frozen' where predicate(path) is True, else 'trainable'.

    predicate receives a '/'-joined parameter path like
    'params/branch_of/a_conv1/kernel'.
    """
    def path_str(p):
        parts = []
        for e in p:
            parts.append(str(getattr(e, "key", getattr(e, "name",
                                                       getattr(e, "idx", e)))))
        return "/".join(parts)

    # Labels must be derived from each leaf's own path: zipping a flattened
    # path list against a hand-rolled recursion mislabels leaves whenever
    # dict insertion order differs from tree_flatten's sorted key order.
    return jax.tree_util.tree_map_with_path(
        lambda p, _: "frozen" if predicate(path_str(p)) else "trainable",
        params)


def frozen_optimizer(tx: optax.GradientTransformation, params: Any,
                     predicate: Callable[[str], bool]
                     ) -> optax.GradientTransformation:
    """Wrap an optimizer so parameters matching `predicate` get zero updates
    (freeze_convs / freeze_all parity, nets/mj_uwyhNets_ba.py:635-660)."""
    labels = freeze_mask(params, predicate)
    return optax.multi_transform(
        {"trainable": tx, "frozen": optax.set_to_zero()}, labels)


def freeze_convs_predicate(path: str) -> bool:
    return "conv" in path.lower()


def freeze_branches_predicate(path: str) -> bool:
    return "branch_" in path


def soft_labels(labels: Sequence[int], nclasses: int,
                epsilon: float = 0.1) -> np.ndarray:
    """mj_softlabel parity: target class gets 1 - eps*(C-1)/C, others eps/C."""
    labels = np.asarray(labels, int)
    the_class = 1.0 - epsilon * (nclasses - 1) / nclasses
    others = epsilon / nclasses
    out = np.full((len(labels), nclasses), others, np.float32)
    out[np.arange(len(labels)), labels] = the_class
    return out


def _to_grid(images: Sequence[np.ndarray], pad: int = 1) -> np.ndarray:
    """Tile 2D images into a square grid, each min-max normalized to [0,255]."""
    n = len(images)
    grid = int(math.ceil(math.sqrt(n)))
    h, w = images[0].shape[:2]
    canvas = np.zeros((grid * (h + pad), grid * (w + pad)), np.uint8)
    for i, img in enumerate(images):
        lo, hi = float(img.min()), float(img.max())
        norm = (img - lo) / (hi - lo) if hi > lo else np.zeros_like(img)
        r, c = divmod(i, grid)
        canvas[r * (h + pad):r * (h + pad) + h,
               c * (w + pad):c * (w + pad) + w] = np.uint8(norm * 255)
    return canvas


def save_filter_grid(kernel: np.ndarray, path: str) -> str:
    """Export conv filters as one grid PNG (mj_save_filters parity).

    kernel: (kh, kw, cin, cout) 2D conv or (kt, kh, kw, cin, cout) 3D conv
    (the time/cin axes are averaged for display).
    """
    k = np.asarray(kernel, np.float32)
    if k.ndim == 5:
        k = k.mean(axis=0)
    imgs = [k[:, :, :, o].mean(axis=2) for o in range(k.shape[-1])]
    canvas = _to_grid(imgs)
    from PIL import Image
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(canvas).save(path)
    return path


def save_sprite(images: Sequence[np.ndarray], path: str,
                max_size: int = 8192) -> str:
    """TensorBoard projector sprite sheet (mj_save_sprite parity)."""
    from PIL import Image
    grid = int(math.sqrt(len(images))) + 1
    cell = max(int(max_size / grid), 1)
    big = Image.new("RGB", (cell * grid, cell * grid), (0, 0, 0))
    for i, img in enumerate(images):
        lo, hi = float(img.min()), float(img.max())
        norm = (img - lo) / (hi - lo) if hi > lo else np.zeros_like(img)
        im = Image.fromarray(np.uint8(norm * 255)).resize((cell, cell))
        r, c = divmod(i, grid)
        big.paste(im, (c * cell, r * cell))
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    big.save(path)
    return path
