"""Host->device input pipeline.

The host side is a thin gather over the packed, memory-mapped dataset
(data/schema.py); everything the reference's generator did per-sample in
Python — dequantization, normalization, joint augmentation, gaitset
de-interleave, expand-level modality-dropout replication
(/root/reference/data/mj_dataGeneratorMMUWYHsingle.py:294-535) — runs on
device as ONE jitted function over the whole batch.

Batch layout after expansion (parity with the reference's interleaving,
...single.py:491-535): rows [i*E .. i*E+E-1] are sample i's original copy
followed by its modality-dropout copies, so P*K label blocks survive.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ugaitnet_tpu.core.config import DataConfig, MODALITY_CHANNELS
from ugaitnet_tpu.data.schema import GaitDataset
from ugaitnet_tpu.ops import augment as A
from ugaitnet_tpu.ops.preprocess import planes_to_frames


class HostBatch(dict):
    """Raw numpy arrays staged for one batch: per-modality uint8/int16
    volumes + present flags, plus dense labels."""


def gather_host_batch(ds: GaitDataset, idx: np.ndarray,
                      modalities: Sequence[str],
                      labmap: Optional[Dict[int, int]] = None) -> HostBatch:
    from ugaitnet_tpu.data.native import gather_rows
    out = HostBatch()
    for m in modalities:
        store = ds.modalities[m]
        out[f"raw_{m}"] = gather_rows(store.volumes, idx)
        out[f"present_{m}"] = store.present[idx].astype(np.float32)
    labels = ds.labels[idx]
    if labmap is not None:
        labels = np.asarray([labmap[int(l)] for l in labels], np.int32)
    out["labels"] = labels.astype(np.int32)
    # joint-dataset source selector (BothDatasets regime, data/convert.py)
    src = getattr(ds, "dataset_source", None)
    out["source"] = (src[idx].astype(np.int32) if src is not None
                     else np.zeros(len(idx), np.int32))
    return out


def compute_normalization_stats(ds: GaitDataset, modality: str,
                                source: Optional[np.ndarray] = None
                                ) -> Tuple[np.ndarray, np.ndarray]:
    """Per-plane mean/std of the *normalized* volumes (the BothDatasets
    per-dataset normalization h5s, mj_dataGeneratorMMUWYHBothDatasets.py:89-99).
    Returns (mean (T*C,), std (T*C,))."""
    store = ds.modalities[modality]
    idx = (np.arange(len(ds)) if source is None
           else np.where(np.asarray(source))[0])
    # stream in chunks: the store is memory-mapped and a real train split
    # is tens of GB — materializing it as one float64 copy (4-8x on-disk
    # size) would OOM the host before training starts
    chunk = 512
    n_planes = store.volumes.shape[1]
    tot = np.zeros(n_planes, np.float64)
    tot2 = np.zeros(n_planes, np.float64)
    count = 0
    for s in range(0, len(idx), chunk):
        x = np.asarray(store.volumes[idx[s:s + chunk]], np.float64)
        if store.compress_factor > 1:
            x = x / store.compress_factor
            if ds.ntype == 2:
                x = x * 0.1
        else:
            x = x / 255.0
            if modality != "silhouette":
                x = x - 0.5
        tot += x.sum(axis=(0, 2, 3))
        tot2 += np.square(x).sum(axis=(0, 2, 3))
        count += x.shape[0] * x.shape[2] * x.shape[3]
    mean = tot / max(count, 1)
    var = np.maximum(tot2 / max(count, 1) - np.square(mean), 0.0)
    return (mean.astype(np.float32),
            np.maximum(np.sqrt(var), 1e-6).astype(np.float32))


def save_norm_stats(experdir: str, norm_stats: Dict) -> str:
    """Persist {modality: (mean, std)} standardization next to the
    experiment's checkpoints (the reference passes its normalize-h5 paths
    to the eval mains by hand, mj_dataGeneratorMMUWYHBothDatasets.py:89-99;
    here training persists them once and eval/export reload them)."""
    import os
    path = os.path.join(experdir, "norm_stats.npz")
    np.savez(path,
             **{f"mean_{m}": v[0] for m, v in norm_stats.items()},
             **{f"std_{m}": v[1] for m, v in norm_stats.items()})
    return path


def load_norm_stats(experdir: str, modalities) -> Optional[Dict]:
    """Load save_norm_stats() output; None when the experiment was trained
    without --normstats. Shared by cli/evaluate and cli/export_model so the
    reconstruction of the standardization cannot drift between them."""
    import os
    path = os.path.join(experdir, "norm_stats.npz")
    if not os.path.exists(path):
        return None
    z = np.load(path)
    missing = [m for m in modalities
               if f"mean_{m}" not in z or f"std_{m}" not in z]
    if missing:
        raise ValueError(
            f"{path} lacks stats for modalities {missing}; it was written "
            "for a different branch set than this experiment's config")
    return {m: (z[f"mean_{m}"], z[f"std_{m}"]) for m in modalities}


def _dropout_masks(key: jax.Array, batch: int, nmods: int, expand: int
                   ) -> jax.Array:
    """(B, E, nmods) 0/1 keep-masks for the expand copies (copy 0 = all 1).

    2-mod parity (...single.py:500-535): copy 1 disables a random modality,
    copy 2 the other. >=3-mod parity (__gen_batchMM :783-807): even samples
    disable min(ex+1, nmods-1) randomly-chosen (with replacement) modalities;
    odd samples keep exactly one, cycling. Deliberate deviation: the
    reference hardcodes the cycle as (i+ex) % 3 (:802) so a 4th+ modality
    could never be the sole survivor; we cycle % nmods (identical for
    nmods<=3, sane for more).
    """
    if expand <= 1:
        return jnp.ones((batch, expand, nmods), jnp.float32)

    if nmods == 2:
        choice = jax.random.bernoulli(key, 0.5, (batch,)).astype(jnp.int32)
        copies = [jnp.ones((batch, nmods), jnp.float32)]
        first = 1.0 - jax.nn.one_hot(choice, nmods, dtype=jnp.float32)
        copies.append(first)
        if expand > 2:
            copies.append(1.0 - jax.nn.one_hot(1 - choice, nmods,
                                               dtype=jnp.float32))
        for _ in range(expand - len(copies)):
            copies.append(copies[1])
        return jnp.stack(copies[:expand], axis=1)

    rows = jnp.arange(batch)
    even = (rows % 2 == 0)
    copies = [jnp.ones((batch, nmods), jnp.float32)]
    for ex in range(expand - 1):
        k_ex = jax.random.fold_in(key, ex)
        if expand > 2:
            # fixed count per copy index (__gen_batchMM :790)
            ndis = jnp.full((batch,), min(ex + 1, nmods - 1), jnp.int32)
        else:
            # expand==2: count sampled uniformly in [1, nmods) (:792)
            ndis = jax.random.randint(jax.random.fold_in(k_ex, 1),
                                      (batch,), 1, nmods)
        picks = jax.random.randint(k_ex, (batch, nmods - 1), 0, nmods)
        mask_even = jnp.ones((batch, nmods), jnp.float32)
        for d in range(nmods - 1):
            disable_d = (1.0 - jax.nn.one_hot(picks[:, d], nmods,
                                              dtype=jnp.float32))
            active = (d < ndis).astype(jnp.float32)[:, None]
            mask_even = mask_even * (disable_d * active
                                     + (1.0 - active))
        keep_ix = (rows + ex) % nmods
        mask_odd = jax.nn.one_hot(keep_ix, nmods, dtype=jnp.float32)
        copies.append(jnp.where(even[:, None], mask_even, mask_odd))
    return jnp.stack(copies, axis=1)


def _expand_rows(x: jax.Array, expand: int) -> jax.Array:
    """Repeat each row E times, interleaved: (B, ...) -> (B*E, ...)."""
    return jnp.repeat(x, expand, axis=0)


@functools.partial(
    jax.jit,
    static_argnames=("modalities", "channels", "compress_factors", "ntype",
                     "expand", "augmenting", "cfg", "normalize"))
def preprocess_batch(raw: Dict[str, jax.Array], key: jax.Array,
                     modalities: Tuple[str, ...],
                     channels: Tuple[int, ...],
                     compress_factors: Tuple[float, ...],
                     ntype: int, expand: int, augmenting: bool,
                     cfg: DataConfig, normalize: bool = False
                     ) -> Tuple[List[jax.Array], List[jax.Array], jax.Array]:
    """Device-side: dequant -> frames -> joint augment -> expand+dropout.

    Returns (volumes[(B*E, T, H, W, C_m)], use_flags[(B*E,)], labels (B*E,)).
    """
    batch = raw["labels"].shape[0]
    k_aug, k_drop = jax.random.split(key, 2)

    # One affine/flip draw per sample, shared across modalities (the
    # reference copies tx/ty and flip between modality transforms,
    # ...single.py:401-410); photometric params per modality.
    params = []
    for mi, m in enumerate(modalities):
        p = A.random_transform_params(
            jax.random.fold_in(k_aug, mi), batch,
            shift_choices=cfg.shift_range, zoom_range=cfg.zoom_range,
            brightness_range=cfg.brightness_range,
            channel_shift_range=cfg.channel_shift_range,
            photometric=(m != "of"))
        params.append(p)
    base = params[0]
    params = [p._replace(apply=base.apply, tx=base.tx, ty=base.ty,
                         flip=base.flip) for p in params]

    volumes, use_flags = [], []
    clip_coin = base.clip_of  # one per-sample coin (...single.py:412-417)
    for mi, m in enumerate(modalities):
        x = raw[f"raw_{m}"].astype(jnp.float32)
        cf = compress_factors[mi]
        if cf > 1.0:  # quantized (OF)
            # clip_max <= 0 disables the clip augment entirely, matching
            # the reference's `if clip_max > 0:` guard (...single.py:316)
            # — without it, clip_max=0 would wipe every nonzero OF value
            if augmenting and cfg.of_clip_max > 0:
                clipped = jnp.where(
                    (jnp.abs(x) > cfg.of_clip_max)
                    | (jnp.abs(x) < cfg.of_clip_min), 1e-8, x)
                x = jnp.where(clip_coin.reshape(-1, 1, 1, 1), clipped, x)
            x = x / cf
            if ntype == 2:
                x = x * 0.1
        else:
            x = x / 255.0
            if m != "silhouette":
                x = x - 0.5
        if normalize:
            # per-dataset per-plane standardization (BothDatasets,
            # mj_dataGeneratorMMUWYHBothDatasets.py:300-316)
            mean = raw[f"norm_mean_{m}"][raw["source"]]   # (B, T*C)
            std = raw[f"norm_std_{m}"][raw["source"]]
            x = (x - mean[:, :, None, None]) / std[:, :, None, None]
        x = planes_to_frames(x, channels[mi])          # (B, T, H, W, C)
        if augmenting:
            x = A.augment_batch(x, params[mi], is_of=(m == "of"))
        volumes.append(x)
        use_flags.append(raw[f"present_{m}"])

    # --- expand-level modality dropout ------------------------------------
    masks = _dropout_masks(k_drop, batch, len(modalities), expand)
    out_vols, out_flags = [], []
    for mi in range(len(modalities)):
        v = _expand_rows(volumes[mi], expand)
        u = _expand_rows(use_flags[mi], expand) * masks[:, :, mi].reshape(-1)
        v = jnp.where(u.reshape(-1, 1, 1, 1, 1) > 0, v,
                      jnp.asarray(cfg.noise, v.dtype))
        out_vols.append(v)
        out_flags.append(u)
    labels = _expand_rows(raw["labels"], expand)
    return out_vols, out_flags, labels


class PrefetchLoader:
    """Async host pipeline: gathers/stages the next batches on a background
    thread while the device is busy.

    The reference left Keras' workers/use_multiprocessing commented out and
    ran its generator synchronously (/root/reference/nets/mj_uwyhNets_ba.py:
    270-271,965-966; SURVEY.md §2.5); here overlap is first-class. The
    native gather (data/native.py) releases the GIL, so the producer thread
    truly runs in parallel with jit dispatch.
    """

    def __init__(self, pipe: "GaitPipeline", sampler, key: "jax.Array",
                 depth: int = 2, expand: Optional[int] = None):
        import queue
        import threading
        self.pipe = pipe
        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._stop = False
        self._n = len(sampler)

        def producer():
            # any exception must reach the consumer: a silently-dead
            # producer would leave __iter__ parked in q.get() forever
            try:
                for i, idx in enumerate(sampler.epoch()):
                    if self._stop:
                        return
                    batch = pipe.load(idx, jax.random.fold_in(key, i),
                                      expand=expand)
                    if not self._put(batch):
                        return
            except BaseException as e:   # noqa: BLE001 — re-raised below
                self._put(e)
                return
            self._put(None)

        self._t = threading.Thread(target=producer, daemon=True)
        self._t.start()

    def _put(self, item) -> bool:
        import queue
        while not self._stop:
            try:
                self._q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue  # re-check _stop so close() can unblock us
        return False

    def __iter__(self):
        try:
            while True:
                item = self._q.get()
                if item is None:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            # consumer stopped early (exception / break): release the
            # producer so it doesn't park forever holding device batches
            self.close()

    def __len__(self):
        return self._n

    def close(self):
        self._stop = True
        try:
            while True:
                self._q.get_nowait()
        except Exception:
            pass


class GaitPipeline:
    """Convenience wrapper: sampler indices -> device-ready batches."""

    def __init__(self, ds: GaitDataset, cfg: DataConfig,
                 modalities: Sequence[str],
                 labmap: Optional[Dict[int, int]] = None,
                 indices: Optional[np.ndarray] = None,
                 augment: Optional[bool] = None,
                 norm_stats: Optional[Dict[str, Tuple[np.ndarray,
                                                      np.ndarray]]] = None):
        self.ds = ds
        self.cfg = cfg
        self.modalities = tuple(modalities)
        self.labmap = labmap
        self.indices = (np.arange(len(ds)) if indices is None
                        else np.asarray(indices))
        self.channels = tuple(MODALITY_CHANNELS[m] for m in modalities)
        self.compress_factors = tuple(
            float(ds.modalities[m].compress_factor) for m in modalities)
        self.augmenting = cfg.augment if augment is None else augment
        # norm_stats[m] = (means (S, T*C), stds (S, T*C)) per dataset source
        self.norm_stats = norm_stats

    def load(self, batch_idx: np.ndarray, key: jax.Array,
             expand: Optional[int] = None):
        """batch_idx indexes into this pipeline's view (self.indices)."""
        raw = gather_host_batch(self.ds, self.indices[batch_idx],
                                self.modalities, self.labmap)
        if self.norm_stats is not None:
            src_max = int(np.max(raw["source"], initial=0))
            for m in self.modalities:
                mean, std = self.norm_stats[m]
                mean2 = np.atleast_2d(mean).astype(np.float32)
                if src_max >= mean2.shape[0]:
                    # the device gather would CLAMP an out-of-range source
                    # row, silently standardizing one dataset with the
                    # other's statistics
                    raise ValueError(
                        f"norm_stats[{m!r}] has {mean2.shape[0]} source "
                        f"row(s) but the batch contains dataset_source="
                        f"{src_max}; pass one (mean, std) row per dataset")
                raw[f"norm_mean_{m}"] = mean2
                raw[f"norm_std_{m}"] = np.atleast_2d(std).astype(np.float32)
        raw_dev = {k: jnp.asarray(v) for k, v in raw.items()}
        e = self.cfg.expand_level if expand is None else expand
        return preprocess_batch(
            raw_dev, key, self.modalities, self.channels,
            self.compress_factors, self.ds.ntype, e, self.augmenting,
            self.cfg, normalize=self.norm_stats is not None)
