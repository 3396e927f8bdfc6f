"""Device-side augmentation kernels for gait clip volumes.

Vectorized, jit-fusable equivalents of the reference's host-side per-frame
loops (`/root/reference/data/mj_augmentation.py`):

  * mirror_volume       <- mj_mirrorsequence (:12-32)
  * affine_volume       <- mj_transformsequence + Keras apply_affine_transform
                           (shift/zoom, bilinear, edge-clamp fill)
  * brightness + channel-shift <- Keras brightness/channel_shift branches
  * random_transform_params    <- mj_transgenerator distributions (:53-66)

Deliberate deviations (documented, distribution-faithful, not bit-identical):
  * The Keras brightness path round-trips through PIL uint8 (array_to_img ->
    ImageEnhance -> img_to_array), which min-max rescales each frame and
    quantizes to 8 bits; the reference then re-normalizes with /255-0.5
    (mj_augmentation.py:47-48). We implement the same net effect — per-frame
    min-max rescale to [0,1], multiply by the brightness factor, shift by
    -0.5 — without the quantization.
  * mj_mirrorsequence negates *every even-index plane* regardless of
    modality (mj_augmentation.py:29-30): correct for interleaved OF x-planes,
    an accidental brightness inversion for gray/depth. We negate the
    x-channel for OF only; `negate_even_frames=True` reproduces the quirk
    for parity testing.

All functions take frame-major volumes (T, H, W, C) (see ops/preprocess.py)
and have batch variants via vmap.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class TransformParams(NamedTuple):
    """Per-sample affine/photometric parameters (static-shape, batchable)."""
    apply: jax.Array        # bool/float — whether the affine applies (3/4 prob)
    tx: jax.Array           # horizontal shift in pixels (width axis — the
                            # tf_keras-pinned convention, affine_volume)
    ty: jax.Array           # vertical shift in pixels (height axis)
    zx: jax.Array           # horizontal zoom factor
    zy: jax.Array           # vertical zoom factor
    flip: jax.Array         # bool — horizontal mirror (1/2 prob given apply)
    brightness: jax.Array   # multiplicative factor (non-OF; 1.0 = off)
    channel_shift: jax.Array  # additive intensity (non-OF; 0.0 = off)
    clip_of: jax.Array      # bool — OF magnitude clip-augment (1/2 prob)


def random_transform_params(key: jax.Array, batch: int,
                            shift_choices=(-5, -3, 0, 3, 5),
                            zoom_range: float = 0.04,
                            brightness_range=(0.95, 1.05),
                            channel_shift_range: float = 0.025,
                            photometric: bool = True,
                            augment_prob: float = 0.75,
                            flip_prob: float = 0.5,
                            clip_prob: float = 0.5) -> TransformParams:
    """Sample per-sample params matching mj_transgenerator + the call-site
    probabilities (...single.py:401-417): 3/4 apply a transform, 1/2 of those
    flip; OF clip-aug is an independent 1/2 coin."""
    ks = jax.random.split(key, 8)
    choices = jnp.asarray(shift_choices, jnp.float32)
    apply = jax.random.uniform(ks[0], (batch,)) < augment_prob
    tx = choices[jax.random.randint(ks[1], (batch,), 0, len(shift_choices))]
    ty = choices[jax.random.randint(ks[2], (batch,), 0, len(shift_choices))]
    zx = jax.random.uniform(ks[3], (batch,), minval=1.0 - zoom_range,
                            maxval=1.0 + zoom_range)
    zy = jax.random.uniform(ks[4], (batch,), minval=1.0 - zoom_range,
                            maxval=1.0 + zoom_range)
    flip = jnp.logical_and(apply, jax.random.uniform(ks[5], (batch,)) < flip_prob)
    if photometric:
        brightness = jax.random.uniform(ks[6], (batch,),
                                        minval=brightness_range[0],
                                        maxval=brightness_range[1])
        channel_shift = jax.random.uniform(ks[7], (batch,),
                                           minval=-channel_shift_range,
                                           maxval=channel_shift_range)
    else:
        brightness = jnp.ones((batch,))
        channel_shift = jnp.zeros((batch,))
    clip_of = jax.random.uniform(jax.random.fold_in(key, 99), (batch,)) < clip_prob
    return TransformParams(apply=apply, tx=tx, ty=ty, zx=zx, zy=zy, flip=flip,
                           brightness=brightness, channel_shift=channel_shift,
                           clip_of=clip_of)


def mirror_volume(x: jax.Array, is_of: bool,
                  negate_even_frames: bool = False) -> jax.Array:
    """Horizontal mirror of a (T, H, W, C) volume.

    For OF, mirroring reverses horizontal motion, so the x channel (channel 0)
    changes sign — the intent of mj_mirrorsequence's even-plane negation.
    negate_even_frames=True reproduces the reference's literal behavior
    (negate planes 0,2,4,... of any modality) for parity tests.
    """
    out = jnp.flip(x, axis=2)
    if negate_even_frames:
        # the reference's plane stack interleaves (H, W, T*C) with plane
        # index t*C + c — negate exactly the even plane indices for ANY C
        # (for C=2 that is channel 0 of every frame; for C=1 even frames;
        # for C=3 it alternates with (t + c) parity)
        t, c = out.shape[0], out.shape[-1]
        plane = (jnp.arange(t).reshape(t, 1, 1, 1) * c
                 + jnp.arange(c).reshape(1, 1, 1, c))
        return jnp.where(plane % 2 == 0, -out, out)
    if is_of:
        sign = jnp.where(jnp.arange(x.shape[-1]) == 0, -1.0, 1.0).astype(x.dtype)
        out = out * sign.reshape(1, 1, 1, -1)
    return out


def affine_volume(x: jax.Array, tx: jax.Array, ty: jax.Array,
                  zx: jax.Array, zy: jax.Array) -> jax.Array:
    """Keras apply_affine_transform parity on a (T, H, W, C) volume.

    Inverse mapping with zoom centered at (dim-1)/2, bilinear interpolation,
    coordinates clamped to the frame (== fill_mode='nearest'). One transform
    is shared by all frames/channels of the volume, like the reference
    applies one Keras transform per sequence (mj_augmentation.py:35-50).

    Axis convention pinned empirically against tf_keras
    (tests/test_reference_parity.py::test_affine_matches_keras): (tx, zx)
    act on axis 1 (columns), (ty, zy) on axis 0 (rows).
    """
    t, h, w, c = x.shape
    cy = (h - 1) / 2.0
    cx = (w - 1) / 2.0
    rows = jnp.arange(h, dtype=jnp.float32)
    cols = jnp.arange(w, dtype=jnp.float32)
    src_r = zy * (rows - cy) + cy + ty          # (H,)
    src_c = zx * (cols - cx) + cx + tx          # (W,)

    r0 = jnp.clip(jnp.floor(src_r), 0, h - 1)
    c0 = jnp.clip(jnp.floor(src_c), 0, w - 1)
    r1 = jnp.clip(r0 + 1, 0, h - 1)
    c1 = jnp.clip(c0 + 1, 0, w - 1)
    wr = jnp.clip(src_r - r0, 0.0, 1.0)
    wc = jnp.clip(src_c - c0, 0.0, 1.0)
    r0i, r1i = r0.astype(jnp.int32), r1.astype(jnp.int32)
    c0i, c1i = c0.astype(jnp.int32), c1.astype(jnp.int32)

    # Separable gather: rows then cols (gathers on a single axis keep XLA
    # on the fast dynamic-slice path).
    top = jnp.take(x, r0i, axis=1)
    bot = jnp.take(x, r1i, axis=1)
    xr = top + wr.reshape(1, h, 1, 1) * (bot - top)
    left = jnp.take(xr, c0i, axis=2)
    right = jnp.take(xr, c1i, axis=2)
    return left + wc.reshape(1, 1, w, 1) * (right - left)


def photometric_volume(x: jax.Array, brightness: jax.Array,
                       channel_shift: jax.Array) -> jax.Array:
    """Channel shift then brightness, net-effect parity with the Keras path.

    channel shift: x + intensity, clipped to per-frame per-channel min/max
    (Keras apply_channel_shift; the reference transforms each frame
    separately, so the bounds are per frame — mj_augmentation.py:39-44).
    brightness: per-frame min-max rescale to [0,1], * factor, - 0.5 (the net
    effect of array_to_img -> ImageEnhance -> img_to_array -> the /255-0.5
    renormalization at mj_augmentation.py:47-48, minus the uint8 rounding).
    """
    cmin = jnp.min(x, axis=(1, 2), keepdims=True)
    cmax = jnp.max(x, axis=(1, 2), keepdims=True)
    x = jnp.clip(x + channel_shift, cmin, cmax)

    fmin = jnp.min(x, axis=(1, 2, 3), keepdims=True)
    fmax = jnp.max(x, axis=(1, 2, 3), keepdims=True)
    unit = (x - fmin) / jnp.maximum(fmax - fmin, 1e-12)
    # PIL's uint8 brightness saturates at 255, capping the reference output
    # at +0.5 — clamp to match
    return jnp.clip(unit * brightness, 0.0, 1.0) - 0.5


def augment_volume(x: jax.Array, p: TransformParams, is_of: bool,
                   photometric: bool = True) -> jax.Array:
    """Full augmentation for one (T, H, W, C) volume given its params."""
    transformed = affine_volume(x, p.tx, p.ty, p.zx, p.zy)
    if photometric and not is_of:
        transformed = photometric_volume(transformed, p.brightness,
                                         p.channel_shift)
    x = jnp.where(p.apply, transformed, x)
    return jnp.where(p.flip, mirror_volume(x, is_of), x)


def augment_batch(x: jax.Array, p: TransformParams, is_of: bool,
                  photometric: bool = True) -> jax.Array:
    """(B, T, H, W, C) batch variant; one set of params per sample."""
    return jax.vmap(lambda v, a, tx, ty, zx, zy, f, b, cs: augment_volume(
        v, TransformParams(a, tx, ty, zx, zy, f, b, cs, jnp.bool_(False)),
        is_of, photometric))(
        x, p.apply, p.tx, p.ty, p.zx, p.zy, p.flip, p.brightness,
        p.channel_shift)
