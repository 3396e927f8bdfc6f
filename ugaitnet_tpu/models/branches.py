"""Per-modality encoder branches (2D CNN and 3D CNN).

Flax re-designs of the reference Keras branches — same receptive fields,
filter counts and activation structure, TPU-native layout:

  * Conv2DBranch <- UWYHNet.buildBranch / buildBranchLReLU
    (/root/reference/nets/mj_uwyhNets_ba.py:66-152). The reference feeds
    channels_first (T*C, 60, 60) planes; we feed NHWC (B, 60, 60, T*C) so XLA
    tiles the convs straight onto the MXU.
  * Conv3DBranch <- UWYHSemiNet.build_3Dbranch / LReLU variant
    (/root/reference/nets/mj_uwyhNets_ba.py:336-417): 6 strided valid convs
    64->512 then a 1x1x1 conv to `ndense_units`, flattened.

Initializer parity: Keras Conv/Dense default glorot_uniform + zero bias; the
final code layer uses he_uniform (mj_uwyhNets_ba.py:105,368).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ugaitnet_tpu.ops.pooling import max_pool_2x2

glorot = nn.initializers.glorot_uniform()
he_uniform = nn.initializers.he_uniform()


def _act(activation: str, alpha: float):
    if activation == "relu":
        return nn.relu
    # max(x, a*x) == leaky_relu exactly for 0<=a<1, without the select
    # form's sign-mask materialization (see gaitset.py lrelu note)
    return lambda x: jnp.maximum(x, alpha * x)


class Conv2DBranch(nn.Module):
    """4-layer 2D CNN over a (B, H, W, T*C) volume -> (B, ndense_units).

    conv(k_i, f_i, valid) + act + maxpool(2) between convs (no pool after the
    last conv), then Flatten -> Dense(2*d) -> Dropout -> Dense(d).
    """

    filters_numbers: Sequence[int] = (64, 128, 512, 512)
    filters_size: Sequence[int] = (7, 5, 3, 2)
    ndense_units: int = 512
    dropout: float = 0.4
    activation: str = "leaky"
    leaky_alpha: float = 0.3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        act = _act(self.activation, self.leaky_alpha)
        n = len(self.filters_numbers)
        for i, (f, k) in enumerate(zip(self.filters_numbers, self.filters_size)):
            x = nn.Conv(f, (k, k), padding="VALID", kernel_init=glorot,
                        dtype=self.dtype, name=f"conv{i}")(x)
            x = act(x)
            if i != n - 1:
                x = max_pool_2x2(x)
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(self.ndense_units * 2, kernel_init=glorot,
                     dtype=self.dtype, name="dense")(x)
        if self.dropout > 0.001:
            x = nn.Dropout(self.dropout, deterministic=not train,
                           name="drop")(x)
        x = nn.Dense(self.ndense_units, kernel_init=he_uniform,
                     dtype=self.dtype, name="code")(x)
        return x.astype(jnp.float32)


# (filters, kernel, strides) — mj_uwyhNets_ba.py:347-363; shared with the
# int8 inference mirror (ops/quantize.py:conv3d_branch_int8)
CONV3D_SPEC = (
    (64, (3, 5, 5), (1, 2, 2)),
    (128, (3, 3, 3), (1, 2, 2)),
    (256, (3, 3, 3), (2, 2, 2)),
    (512, (3, 3, 3), (2, 2, 2)),
    (512, (3, 2, 2), (1, 1, 1)),
    (512, (2, 1, 1), (1, 1, 1)),
)


class Conv3DBranch(nn.Module):
    """Strided 3D CNN over (B, T, H, W, C) -> (B, ndense_units)."""

    ndense_units: int = 512
    activation: str = "relu"
    leaky_alpha: float = 0.3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        act = _act(self.activation, self.leaky_alpha)
        spec = CONV3D_SPEC
        for i, (f, k, s) in enumerate(spec):
            x = nn.Conv(f, k, strides=s, padding="VALID", kernel_init=glorot,
                        dtype=self.dtype, name=f"conv{i}")(x)
            x = act(x)
        x = nn.Conv(self.ndense_units, (1, 1, 1), padding="VALID",
                    kernel_init=he_uniform, dtype=self.dtype, name="code")(x)
        return x.reshape(x.shape[0], -1).astype(jnp.float32)
