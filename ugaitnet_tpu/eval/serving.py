"""Production serving: device-resident gallery identification service.

The reference's eval pipeline re-embeds galleries into host numpy and runs
sklearn kNN per query batch (mains/mj_testUWYHGaitNet_open_casiab.py:380-424).
For deployment this module keeps everything on device: the gallery code
matrix lives in HBM, and one jitted call takes raw quantized clip volumes ->
dequantize -> embed -> distance matmul on the MXU -> top-k vote, returning
dense labels + neighbor distances. Query batches are padded to fixed bucket
sizes so steady-state serving never recompiles.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ugaitnet_tpu.core.config import DataConfig, MODALITY_CHANNELS, ModelConfig
from ugaitnet_tpu.data.pipeline import preprocess_batch
from ugaitnet_tpu.data.schema import GaitDataset
from ugaitnet_tpu.eval.encode import _tap
from ugaitnet_tpu.models.network import UGaitNet


class SignatureService:
    """Encode + identify against an in-HBM gallery.

    Usage:
        svc = SignatureService(model, params, ("of", "gray"))
        svc.set_gallery(codes, labels)          # or build_gallery(dataset)
        labels, dists = svc.identify_raw({"raw_of": ..., "raw_gray": ...})
    """

    def __init__(self, model: UGaitNet, params,
                 modalities: Sequence[str], typecode: int = 3,
                 knn: int = 3, ntype: int = 2,
                 compress_factors: Optional[Sequence[float]] = None,
                 buckets: Sequence[int] = (1, 8, 32, 128),
                 quantized: bool = False,
                 calib_volumes: Optional[Sequence] = None,
                 norm_stats: Optional[Dict] = None,
                 gallery_dtype: str = "float32",
                 mesh=None):
        # The reference-parity signature normalizes rank-3 signatures over
        # the BATCH axis (ModelConfig.l2_mode="reference",
        # /root/reference/nets/mj_uwyhNets_ba.py:817) — codes then depend on
        # batch composition, which is unacceptable for serving. Force the
        # deterministic per-sample normalization here (parameter-free, so
        # trained weights are unaffected); the gallery is built by this same
        # service, so gallery and probe codes stay consistent.
        if model.config.l2_mode != "feature":
            import dataclasses
            model = UGaitNet(dataclasses.replace(model.config,
                                                 l2_mode="feature"))
        self.model = model
        self.params = params
        self.modalities = tuple(modalities)
        self.typecode = typecode
        self.knn = knn
        self.ntype = ntype
        self.channels = tuple(MODALITY_CHANNELS[m] for m in modalities)
        self.compress_factors = tuple(
            compress_factors if compress_factors is not None
            else [100.0 if m == "of" else 1.0 for m in modalities])
        self.buckets = tuple(sorted(buckets))
        self._dcfg = DataConfig()
        # models trained with --normstats standardize every input
        # (trainer writes norm_stats.npz); a service without the same
        # stats feeds the net a different input distribution than it was
        # trained on and identification quietly degrades.  Stats are
        # baked into the jitted encode (and thus into exported
        # artifacts) as constants; multi-source stats index by the
        # optional "source" entry of the raw feed (default 0).
        self.norm_stats = norm_stats
        self._norm = None
        self.norm_sources = 1
        if norm_stats is not None:
            missing = [m for m in self.modalities if m not in norm_stats]
            if missing:
                raise ValueError(
                    f"norm_stats missing modalities {missing}; a partially"
                    " standardized encode would mix input scales")
            self._norm = {
                m: (jnp.asarray(np.atleast_2d(norm_stats[m][0]),
                                jnp.float32),
                    jnp.asarray(np.atleast_2d(norm_stats[m][1]),
                                jnp.float32))
                for m in self.modalities}
            rows = {int(v[0].shape[0]) for v in self._norm.values()}
            if len(rows) > 1:
                raise ValueError(
                    f"norm_stats disagree on dataset-source count per "
                    f"modality: {sorted(rows)}")
            self.norm_sources = rows.pop()
        # gallery_dtype="int8": store the gallery symmetric-int8 quantized
        # (ops/knn.quantize_gallery) and run the distance cross-term as an
        # int8 MXU matmul.  The pod-scale lane int8 actually wins (unlike
        # the convs — CLAUDE.md "int8 inference findings"): reading the
        # gallery dominates identify at large G, int8 quarters those bytes
        # and doubles the MXU rate, and 4x more codes fit per chip.  Probe
        # encode stays bf16; |g|^2 stays exact f32.
        if gallery_dtype not in ("float32", "int8"):
            raise ValueError(f"gallery_dtype must be float32 or int8, "
                             f"got {gallery_dtype!r}")
        self.gallery_dtype = gallery_dtype
        self._gallery_codes = None  # f32 array, or (int8, scale, g2) tuple
        self._gallery_dense: Optional[jax.Array] = None
        self._ulabels: Optional[np.ndarray] = None
        self._gallery_size = 0

        # optional int8 encode (ops/quantize.py): requires pre-quantized
        # params (calibrated on representative volumes)
        self.quantized = quantized
        if quantized and (typecode != 3
                          or model.config.extra_dense):
            # encode_int8 emits the flattened signature only; a service
            # configured for another tap would silently compare
            # incompatible embedding spaces between fp32 galleries and
            # int8 probes
            raise ValueError(
                "quantized=True supports typecode=3 on nets without "
                "extra_dense (the int8 path encodes the flattened "
                f"signature); got typecode={typecode}, extra_dense="
                f"{model.config.extra_dense}")
        if quantized:
            from ugaitnet_tpu.ops.quantize import quantize_model_params
            if calib_volumes is None:
                raise ValueError("quantized=True needs calib_volumes "
                                 "(one (B,T,H,W,C_i) batch per modality)")
            self.params = quantize_model_params(params, model.config,
                                                calib_volumes)
        # mesh=<jax.sharding.Mesh>: pod-scale gallery mode.  set_gallery
        # row-shards the codes (f32 or int8 tuple) over the mesh's FIRST
        # axis with +inf-distance pad sentinels; params are replicated once
        # here, probes replicate per query, and GSPMD partitions the
        # distance matmul + assembles the global top-k inside the same
        # jitted _identify.  An 8-chip v5e pod with the int8 gallery holds
        # 32x the single-chip f32 capacity (4x int8 x 8 row shards).
        # Label parity with the single-device service is pinned on the
        # virtual mesh (tests/test_serving.py).
        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            self.params = jax.device_put(
                self.params, NamedSharding(mesh, PartitionSpec()))

        def _prep(raw):
            if self._norm is not None:
                raw = dict(raw)
                for m in self.modalities:
                    mean, std = self._norm[m]
                    raw[f"norm_mean_{m}"] = mean   # constants under jit:
                    raw[f"norm_std_{m}"] = std     # baked into exports
                if "source" not in raw:
                    raw["source"] = jnp.zeros(raw["labels"].shape[0],
                                              jnp.int32)
            return preprocess_batch(
                raw, jax.random.PRNGKey(0), self.modalities, self.channels,
                self.compress_factors, self.ntype, 1, False, self._dcfg,
                normalize=self._norm is not None)

        @functools.partial(jax.jit, static_argnames=("n_classes", "k"))
        def _identify(params, raw, gallery, gallery_dense, n_classes, k):
            vols, flags, _ = _prep(raw)
            if self.quantized:
                from ugaitnet_tpu.ops.quantize import encode_int8
                codes = encode_int8(params, vols, flags, self.model.config)
            else:
                out = self.model.apply(params, vols, flags, train=False)
                codes = _tap(out, self.typecode)
            # distance + vote shared with the eval protocol's kNN so the
            # sklearn tie-break parity lives in one place (ops/knn.py)
            from ugaitnet_tpu.ops.knn import pairwise_l2, pairwise_l2_int8
            if isinstance(gallery, tuple):   # int8 gallery (codes, scale, g2)
                d2 = pairwise_l2_int8(codes, *gallery)
            else:
                d2 = pairwise_l2(codes, gallery)
            neg, idx = jax.lax.top_k(-d2, k)
            votes = jax.nn.one_hot(gallery_dense[idx], n_classes,
                                   dtype=jnp.float32)
            pred = jnp.argmax(jnp.sum(votes, axis=1), axis=1)
            return pred, jnp.sqrt(-neg)

        self._identify = _identify

        @jax.jit
        def _encode_raw(params, raw):
            vols, flags, _ = _prep(raw)
            if self.quantized:
                from ugaitnet_tpu.ops.quantize import encode_int8
                return encode_int8(params, vols, flags, self.model.config)
            out = self.model.apply(params, vols, flags, train=False)
            return _tap(out, self.typecode)

        self._encode_raw = _encode_raw

    # ------------------------------------------------------------------
    def set_gallery(self, codes: np.ndarray, labels: np.ndarray,
                    warmup: bool = False) -> None:
        """warmup=True precompiles every query bucket right away, so the
        first live query is steady-state (a cold compile through the
        remote-tunnel backend costs minutes)."""
        self._ulabels, dense = np.unique(np.asarray(labels),
                                         return_inverse=True)
        self._gallery_size = int(len(codes))
        dense = dense.astype(np.int32)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            axis = self.mesh.axis_names[0]
            row_sh = NamedSharding(self.mesh, PartitionSpec(axis))
            nshards = self.mesh.shape[axis]
            if self.gallery_dtype == "int8":
                from ugaitnet_tpu.ops.knn import (pad_gallery_int8,
                                                  quantize_gallery)
                q, scale, g2 = quantize_gallery(codes)
                q, scale, g2, dense = pad_gallery_int8(q, scale, g2, dense,
                                                       nshards)
                self._gallery_codes = tuple(
                    jax.device_put(jnp.asarray(a), row_sh)
                    for a in (q, scale, g2))
            else:
                g = np.asarray(codes, np.float32)
                pad = (-len(g)) % nshards
                if pad:  # +inf-distance sentinels; never reach a top-k
                    g = np.concatenate(
                        [g, np.full((pad, g.shape[1]), 1e6, np.float32)])
                    dense = np.concatenate([dense, np.zeros(pad, np.int32)])
                self._gallery_codes = jax.device_put(jnp.asarray(g), row_sh)
            self._gallery_dense = jax.device_put(jnp.asarray(dense), row_sh)
            if warmup:
                self.warmup()
            return
        if self.gallery_dtype == "int8":
            from ugaitnet_tpu.ops.knn import quantize_gallery
            q, scale, g2 = quantize_gallery(codes)
            self._gallery_codes = (jnp.asarray(q),
                                   jnp.asarray(scale), jnp.asarray(g2))
        else:
            self._gallery_codes = jnp.asarray(codes, jnp.float32)
        self._gallery_dense = jnp.asarray(dense)
        if warmup:
            self.warmup()

    def build_gallery(self, ds: GaitDataset, batch_size: int = 128,
                      warmup: bool = False) -> None:
        """Embed a packed dataset with this service's encode path (works for
        both float and quantized modes) and install it as the gallery."""
        codes = []
        n = len(ds)
        for s in range(0, n, batch_size):
            idx = np.arange(s, min(s + batch_size, n))
            real = len(idx)
            if real < batch_size:  # reuse the compiled full-batch executable
                idx = np.concatenate(
                    [idx, np.full(batch_size - real, idx[-1])])
            # the dataset's real per-sample source selects the norm_stats
            # row — hardcoded zeros would standardize every sample of a
            # BothDatasets gallery with dataset 0's statistics
            src = getattr(ds, "dataset_source", None)
            raw = {"labels": jnp.zeros(len(idx), jnp.int32),
                   "source": jnp.asarray(
                       src[idx].astype(np.int32) if src is not None
                       else np.zeros(len(idx), np.int32))}
            for m in self.modalities:
                store = ds.modalities[m]
                raw[f"raw_{m}"] = jnp.asarray(
                    np.ascontiguousarray(store.volumes[idx]))
                raw[f"present_{m}"] = jnp.asarray(
                    store.present[idx].astype(np.float32))
            codes.append(np.asarray(
                self._encode_raw(self.params, raw))[:real])
        self.set_gallery(np.concatenate(codes), ds.labels, warmup=warmup)

    def warmup(self) -> None:
        """Precompile every query bucket so steady-state serving never hits
        a compile (call once after set_gallery/build_gallery)."""
        if self._gallery_codes is None:
            raise RuntimeError("no gallery set")
        # zeros from the SAME spec derivation the exporter uses — a
        # drifted copy here would precompile buckets no live query hits
        from ugaitnet_tpu.eval.export import _raw_specs
        for b in self.buckets:
            specs = _raw_specs(self.modalities, self.channels,
                               self.compress_factors, b,
                               with_source=self._norm is not None)
            raw = {k: np.zeros(s.shape, s.dtype)
                   for k, s in specs.items()
                   if k.startswith("raw_") or k == "source"}
            self.identify_raw(raw)

    def _bucket(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        raise AssertionError("identify_raw chunks n > max bucket")

    def identify_raw(self, raw: Dict[str, np.ndarray]
                     ) -> Tuple[np.ndarray, np.ndarray]:
        """raw: {"raw_<mod>": (N, T*C, H, W) quantized volumes,
                 optional "present_<mod>": (N,)}. Returns (labels, (N, k)
        neighbor distances)."""
        if self._gallery_codes is None:
            raise RuntimeError("no gallery set")
        n = next(iter(raw.values())).shape[0]
        top = self.buckets[-1]
        if n > top:
            # chunk through the largest (warmed) bucket instead of
            # compiling a fresh padded shape per oversize query — the
            # module contract is that steady-state serving never
            # recompiles (same strategy as ExportedEncoder.encode)
            preds, dists = [], []
            for s in range(0, n, top):
                chunk = {k: np.asarray(v)[s:s + top]
                         for k, v in raw.items()}
                p, d = self.identify_raw(chunk)
                preds.append(p)
                dists.append(d)
            return np.concatenate(preds), np.concatenate(dists)
        nb = self._bucket(n)
        padded = {}
        for m in self.modalities:
            v = np.asarray(raw[f"raw_{m}"])
            pad = np.zeros((nb - n, *v.shape[1:]), v.dtype)
            padded[f"raw_{m}"] = jnp.asarray(np.concatenate([v, pad]))
            pres = np.asarray(raw.get(f"present_{m}",
                                      np.ones(n, np.float32)))
            padded[f"present_{m}"] = jnp.asarray(
                np.concatenate([pres, np.zeros(nb - n, np.float32)]))
        padded["labels"] = jnp.zeros((nb,), jnp.int32)
        # multi-source norm_stats index by "source"; with one stats row the
        # default 0 is the only row, but with several a missing source would
        # silently standardize every query with dataset 0's statistics
        if self.norm_sources > 1 and "source" not in raw:
            raise ValueError(
                f"this service standardizes with {self.norm_sources} "
                "dataset-source stat rows; queries must carry a 'source' "
                "entry selecting each sample's dataset")
        src = np.asarray(raw.get("source", np.zeros(n, np.int32)))
        padded["source"] = jnp.asarray(np.concatenate(
            [src, np.zeros(nb - n)]).astype(np.int32))
        k = min(self.knn, self._gallery_size)
        pred, dists = self._identify(self.params, padded,
                                     self._gallery_codes,
                                     self._gallery_dense,
                                     len(self._ulabels), k)
        return self._ulabels[np.asarray(pred[:n])], np.asarray(dists[:n])
