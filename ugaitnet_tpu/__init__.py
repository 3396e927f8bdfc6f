"""ugaitnet_tpu — TPU-native multimodal gait recognition framework.

A ground-up JAX / XLA / Pallas re-design of the capabilities of
avagait/ugaitnet (IEEE TIFS 2021): per-modality CNN encoders (2D, 3D and
GaitSet-style set-pooling branches) over fixed-size clip volumes
(optical flow / gray / depth / silhouette), binary modality-presence
gating, element-wise fusion (max / average / sign-max) into an
L2-normalized gait signature, batch-all triplet + identification losses
with random modality dropout, and open-world kNN gallery evaluation on
CASIA-B / TUM-GAID / joint-dataset protocols.

Unlike the TF 2.3 reference (all Python + Keras, per-sample h5 loading),
this framework keeps the hot path on device: packed array shards, fused
XLA/Pallas preprocessing (dequantize, crop/shift, mirror, modality
dropout), one jitted forward/backward, tiled pairwise-distance kernels
for triplet mining and kNN search, and data-parallel sharding over the
ICI mesh via jax.sharding + shard_map.
"""

__version__ = "0.3.0"

from ugaitnet_tpu.core.config import (  # noqa: F401
    BranchConfig,
    DataConfig,
    EvalConfig,
    ModelConfig,
    TrainConfig,
)
