"""Backend-aware max pooling.

The models' pools are all non-overlapping (2x2 stride 2; set pool window =
the whole time axis), which admits two lowerings with identical forward
values:

- TPU: `reduce_window` (via flax nn.max_pool) — lowers to an efficient
  fused select-and-scatter backward; this is the measured-fastest form on
  v5e and the one the perf budgets (benchmarks/BUDGET*.md) account.
- CPU: reshape + jnp.max — XLA:CPU lowers SelectAndScatter as a scalar
  loop (measured 7.2 s backward for a (150,64,64,32) 2x2 pool vs 64 ms
  forward, 112x; the reshaped max's eq-mask backward runs in ~100 ms,
  and the set pool's jnp.max backward is 16x faster).  This halves the
  wall time of every CPU training test and makes the training-dynamics
  parity harness (benchmarks/training_parity.py) tractable on the 1-core
  host.

Gradient tie-breaking differs between the forms (select-and-scatter routes
to the first max; jnp.max splits evenly among ties), but with continuous
activations ties only occur in all-zero padded regions whose weight
gradients vanish (g*x = 0), so training trajectories are unaffected.

Reference pools: MaxPooling2D(pool_size=2) in the gaitset branch
(/root/reference/nets/mj_uwyhNets_ba.py:434,442,450) and the conv2d
branches (:86); set pool reduce_max (:435,451,464).
"""

import jax
import jax.numpy as jnp
from flax import linen as nn


def max_pool_2x2(x: jax.Array) -> jax.Array:
    """Non-overlapping 2x2/stride-2 max pool over the trailing (H, W, C)
    spatial dims; any leading dims (batch, time) pass through."""
    if jax.default_backend() == "tpu":
        win = (1,) * (x.ndim - 4) + (2, 2)
        return nn.max_pool(x, win, strides=win)
    h, w, c = x.shape[-3:]
    lead = x.shape[:-3]
    if h % 2 or w % 2:
        # VALID windows on odd extents drop the trailing row/col
        x = x[..., : h // 2 * 2, : w // 2 * 2, :]
    r = x.reshape(lead + (h // 2, 2, w // 2, 2, c))
    n = r.ndim
    return jnp.max(r, axis=(n - 4, n - 2))
