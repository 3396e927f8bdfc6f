"""Serialized deployment artifacts for the serving encoder.

The reference has no deployment story beyond "load the Keras h5 in the
same codebase" (mains/mj_testUWYHGaitNet_open_casiab.py:200-240).  Here
the raw->signature encoder is exported as a self-contained StableHLO
artifact (jax.export): trained parameters are baked in as constants, so a
serving process needs NO model code, NO checkpoint plumbing and NO
retracing — it deserializes one blob per batch bucket and calls it.

Layout on disk (one directory):
    meta.json            modalities/channels/typecode/buckets/platform
    encode_b{N}.bin      serialized Exported for batch bucket N

Artifacts are platform-bound (the StableHLO is lowered for the platform
that exported it — "tpu" in production, "cpu" in the tests); loading on a
different platform raises at call time.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from jax import export as jax_export


def _raw_specs(modalities, channels, compress_factors,
               batch: int, with_source: bool = False
               ) -> Dict[str, jax.ShapeDtypeStruct]:
    """Input spec of SignatureService's raw dict at one bucket size
    (data/pipeline.preprocess_batch consumes interleaved quantized planes:
    (B, T*C, H, W) per modality + per-modality presence flags).  The raw
    dtype follows the quantization scale exactly like serving's warmup()
    does: factor > 1 means x100-style int16 planes, else uint8.

    with_source: services that bake --normstats standardization select the
    stats row by each sample's dataset "source"; without this input the
    trace would bake source=0 as a constant and a BothDatasets artifact
    would standardize every query with dataset 0's statistics."""
    from ugaitnet_tpu.core.config import FRAME_H, FRAME_W, NUM_FRAMES
    spec: Dict[str, jax.ShapeDtypeStruct] = {}
    for m, c, f in zip(modalities, channels, compress_factors):
        dt = jnp.int16 if f > 1 else jnp.uint8
        spec[f"raw_{m}"] = jax.ShapeDtypeStruct(
            (batch, NUM_FRAMES * c, FRAME_H, FRAME_W), dt)
        spec[f"present_{m}"] = jax.ShapeDtypeStruct((batch,), jnp.float32)
    spec["labels"] = jax.ShapeDtypeStruct((batch,), jnp.int32)
    if with_source:
        spec["source"] = jax.ShapeDtypeStruct((batch,), jnp.int32)
    return spec


def export_encoder(service, out_dir: str,
                   buckets: Sequence[int] = ()) -> Dict[int, int]:
    """Export `service`'s raw->codes encoder, params baked in, one artifact
    per batch bucket.  Returns {bucket: serialized bytes}. """
    os.makedirs(out_dir, exist_ok=True)
    buckets = tuple(buckets) or service.buckets
    params = service.params

    def encode(raw):
        return service._encode_raw(params, raw)

    sizes: Dict[int, int] = {}
    with_source = service.norm_stats is not None
    for b in buckets:
        spec = _raw_specs(service.modalities, service.channels,
                          service.compress_factors, b,
                          with_source=with_source)
        exp = jax_export.export(jax.jit(encode))(spec)
        blob = exp.serialize()
        with open(os.path.join(out_dir, f"encode_b{b}.bin"), "wb") as f:
            f.write(blob)
        sizes[b] = len(blob)

    meta = {
        "modalities": list(service.modalities),
        "channels": list(service.channels),
        "compress_factors": list(service.compress_factors),
        "typecode": service.typecode,
        "buckets": sorted(buckets),
        "platform": jax.default_backend(),
        # audit trail: whether --normstats standardization (and which OF
        # dequant scale) is baked into the executables
        "ntype": service.ntype,
        "normalized": service.norm_stats is not None,
        # normalized artifacts take a per-sample dataset "source" input
        # selecting the stats row; norm_sources says how many rows exist
        "has_source": with_source,
        "norm_sources": service.norm_sources,
    }
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    return sizes


class ExportedEncoder:
    """Load an export_encoder() directory and serve encode() from it —
    no model code, params or retracing involved."""

    def __init__(self, path: str, warmup: bool = False):
        """warmup=True runs every bucket's executable once on zeros at
        load time, so the first real query never pays a compile/transfer
        cold start (through the remote-tunnel backend a cold first call
        can cost minutes; see cli/export_model.py --warmup)."""
        with open(os.path.join(path, "meta.json")) as f:
            self.meta = json.load(f)
        self.modalities = tuple(self.meta["modalities"])
        self.channels = tuple(self.meta["channels"])
        self.buckets = tuple(self.meta["buckets"])
        here = jax.default_backend()
        if self.meta.get("platform", here) != here:
            raise RuntimeError(
                f"artifact at {path} was exported for platform "
                f"{self.meta['platform']!r} but this process runs "
                f"{here!r}; re-export on the serving platform "
                f"(cli/export_model.py)")
        self._fns = {}
        for b in self.buckets:
            with open(os.path.join(path, f"encode_b{b}.bin"), "rb") as f:
                self._fns[b] = jax_export.deserialize(f.read())
        # output code width, for empty-batch answers
        out_aval = self._fns[self.buckets[0]].out_avals[0]
        self.code_dim = int(out_aval.shape[-1])
        self.code_dtype = np.dtype(out_aval.dtype)
        if warmup:
            self.warmup()

    def warmup(self) -> None:
        """Run every bucket once on zero batches (idempotent).  The feeds
        come from each executable's own in_avals — exact shapes AND
        dtypes, no re-derivation from meta that could drift."""
        import jax.tree_util as jtu
        for b in self.buckets:
            fn = self._fns[b]
            zeros = [np.zeros(a.shape, a.dtype) for a in fn.in_avals]
            args, kwargs = jtu.tree_unflatten(fn.in_tree, zeros)
            np.asarray(fn.call(*args, **kwargs))

    def _bucket(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        return -1   # chunk through the largest bucket

    def encode(self, raw: Dict[str, np.ndarray]) -> np.ndarray:
        """raw: {"raw_<mod>": (B, T*C, H, W) quantized planes, optional
        "present_<mod>": (B,) flags}.  Pads to the nearest bucket."""
        n = next(v.shape[0] for k, v in raw.items() if k.startswith("raw_"))
        if n == 0:
            # np.repeat(v[-1:], ...) on a zero-row array would feed a
            # (0, ...) batch into the exported call and fail with an
            # opaque shape error; an empty query has an empty answer —
            # in the artifact's own code dtype (bf16 exports must not
            # promote a concatenation to f32 via this path)
            return np.zeros((0, self.code_dim), self.code_dtype)
        b = self._bucket(n)
        if b < 0:
            # larger than any bucket: serve in slices of the biggest one
            big = self.buckets[-1]
            outs = []
            for s0 in range(0, n, big):
                chunk = {k: np.asarray(v)[s0:s0 + big]
                         for k, v in raw.items()}
                outs.append(self.encode(chunk))
            return np.concatenate(outs, axis=0)
        feed = {}
        for m, c in zip(self.modalities, self.channels):
            v = np.asarray(raw[f"raw_{m}"])
            if v.shape[0] < b:
                pad = np.repeat(v[-1:], b - v.shape[0], axis=0)
                v = np.concatenate([v, pad], axis=0)
            feed[f"raw_{m}"] = jnp.asarray(v)
            pres = np.asarray(raw.get(f"present_{m}",
                                      np.ones(n, np.float32)))
            pres = np.concatenate(
                [pres, np.zeros(b - len(pres), np.float32)])
            feed[f"present_{m}"] = jnp.asarray(pres.astype(np.float32))
        feed["labels"] = jnp.zeros((b,), jnp.int32)
        if self.meta.get("has_source"):
            if self.meta.get("norm_sources", 1) > 1 and "source" not in raw:
                raise ValueError(
                    "this artifact standardizes with "
                    f"{self.meta['norm_sources']} dataset-source stat "
                    "rows; queries must carry a 'source' entry selecting "
                    "each sample's dataset")
            src = np.asarray(raw.get("source", np.zeros(n, np.int32)))
            feed["source"] = jnp.asarray(np.concatenate(
                [src, np.zeros(b - len(src))]).astype(np.int32))
        codes = self._fns[b].call(feed)
        return np.asarray(codes)[:n]
