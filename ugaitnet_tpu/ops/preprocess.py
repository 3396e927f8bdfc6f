"""Device-side decode/normalization of packed gait volumes.

Replaces the reference's per-sample host loop `__load_dd`
(/root/reference/data/mj_dataGeneratorMMUWYHsingle.py:294-338) with one
vectorized, jit-fusable function over a whole packed batch:

  raw int16/uint8 (B, T*C, H, W)  ->  float (B, T, H, W, C)

Normalization rules (parity with __load_dd):
  * quantized data (compress_factor > 1, e.g. OF stored int16 x100):
      optional clip-augment (|x| outside [clip_min, clip_max] -> 1e-8,
      ...single.py:412-417 + :318-321), then / compress_factor, then *0.1
      when ntype==2 (:323-324).
  * uint8 silhouettes: / 255            (:326-327)
  * other uint8 (gray/depth): /255 - 0.5 (:329)

Layout: the reference keeps (T*C, H, W) channel-planes and reshapes
interleaved OF planes into (25, H, W, 2) for the gaitset branch
(...single.py:434-442). We emit (T, H, W, C) directly — NHWC per frame, the
native TPU conv layout.

NOTE: the production train/serve path is data/pipeline.preprocess_batch,
which fuses these same rules with augmentation, per-sample clip coins and
per-dataset standardization in one jit.  The per-volume helpers here are
the composable public API; tests/test_data.py pins them against
preprocess_batch so the two cannot drift.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dequantize(raw: jax.Array, compress_factor: float, ntype: int = 2,
               clip_max: float = 0.0, clip_min: float = 0.0) -> jax.Array:
    """Quantized (e.g. int16 OF) planes -> float32, with optional clip-augment."""
    x = raw.astype(jnp.float32)
    # clip_max <= 0 disables the WHOLE clip augment including the min-side
    # wipe — the reference gates both on `if clip_max > 0:`
    # (...single.py:316-321), and pipeline.preprocess_batch does the same
    if clip_max > 0:
        x = jnp.where((jnp.abs(x) > clip_max)
                      | (jnp.abs(x) < clip_min), 1e-8, x)
    x = x / compress_factor
    if ntype == 2:
        x = x * 0.1
    return x


def normalize_uint8(raw: jax.Array, silhouette: bool = False) -> jax.Array:
    x = raw.astype(jnp.float32) / 255.0
    return x if silhouette else x - 0.5


def planes_to_frames(x: jax.Array, channels: int) -> jax.Array:
    """(..., T*C, H, W) channel-planes -> (..., T, H, W, C) frames.

    For OF the planes are interleaved x0,y0,x1,y1,... so plane 2t+c belongs to
    frame t channel c — exactly the reference's de-interleave
    (...single.py:436-438: x_new[...,0]=x[::2], x_new[...,1]=x[1::2]).
    """
    *lead, tc, h, w = x.shape
    t = tc // channels
    x = x.reshape(*lead, t, channels, h, w)
    return jnp.moveaxis(x, -3, -1)


def frames_to_planes(x: jax.Array) -> jax.Array:
    """Inverse of planes_to_frames: (..., T, H, W, C) -> (..., T*C, H, W)."""
    *lead, t, h, w, c = x.shape
    x = jnp.moveaxis(x, -1, -3)
    return x.reshape(*lead, t * c, h, w)


def normalize_volume(raw: jax.Array, modality: str, ntype: int = 2,
                     compress_factor: float = 100.0,
                     clip_max: float = 0.0, clip_min: float = 0.0) -> jax.Array:
    """Full __load_dd-equivalent normalization for one modality's planes."""
    if modality == "of":
        return dequantize(raw, compress_factor, ntype, clip_max, clip_min)
    return normalize_uint8(raw, silhouette=(modality == "silhouette"))


def apply_modality_dropout(volumes: jax.Array, use_flags: jax.Array,
                           noise: float = 1e-9) -> jax.Array:
    """Replace disabled-modality volumes with the reference's tiny constant
    (self.noise = 1e-9, ...single.py:102,422,449) so the branch still runs a
    static-shape forward and the gate zeroes its embedding."""
    flag = use_flags.reshape(use_flags.shape[0], *([1] * (volumes.ndim - 1)))
    return jnp.where(flag > 0, volumes, jnp.asarray(noise, volumes.dtype))
