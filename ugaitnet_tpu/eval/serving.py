"""Production serving: device-resident gallery identification service.

The reference's eval pipeline re-embeds galleries into host numpy and runs
sklearn kNN per query batch (mains/mj_testUWYHGaitNet_open_casiab.py:380-424).
For deployment this module keeps everything on device: the gallery code
matrix lives in HBM, and one jitted call takes raw quantized clip volumes ->
dequantize -> embed -> distance matmul on the MXU -> top-k vote, returning
dense labels + neighbor distances. Query batches are padded to fixed bucket
sizes so steady-state serving never recompiles.

Incremental enrollment: the gallery lives in capacity-padded device buffers
(power-of-two row capacity, power-of-two class capacity) with a (capacity,)
f32 distance-bias vector marking dead slots (+1e12 — never reaches a top-k).
`enroll()` appends new identities with a device-side dynamic_update_slice
(only the new rows cross H2D) and `remove()` tombstones rows by flipping
bias entries; neither changes any traced shape or static argument, so
steady-state enrollment NEVER recompiles `_identify` — rebuilds happen only
when capacity doubles (amortized log2(G) compiles over a gallery's life).
The reference has no serving layer at all (its eval re-embeds the gallery
per run, mains/mj_testUWYHGaitNet_open_casiab.py:328-429); this is the
production surface it implies.
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


def _next_pow2(n: int, floor: int = 8) -> int:
    """Smallest power of two >= max(n, floor) — the gallery/class capacity
    quantum.  Power-of-two capacities keep the amortized recompile count at
    log2(final gallery size) and land on MXU-friendly row counts."""
    return 1 << max(floor - 1, n - 1).bit_length()


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
        self._gallery_bias: Optional[jax.Array] = None  # (capacity,) 0/1e12
        self._ulabels: Optional[np.ndarray] = None
        self._gallery_size = 0      # LIVE rows (tombstones excluded)
        # enrollment state: host masters stay row-aligned with the device
        # buffers (tombstoned slots are kept in place until a capacity
        # rebuild compacts them), so device-side appends need only the new
        # rows on the wire
        self._capacity = 0
        self._label_capacity = 0
        self._rows_used = 0         # slots consumed incl. tombstones
        self._host_codes: Optional[np.ndarray] = None
        self._host_labels: Optional[np.ndarray] = None
        self._live: Optional[np.ndarray] = None

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
        self._row_sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            self.params = jax.device_put(
                self.params, NamedSharding(mesh, PartitionSpec()))
            self._row_sharding = NamedSharding(
                mesh, PartitionSpec(mesh.axis_names[0]))

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

        def _dist_vote(codes, gallery, gallery_dense, gallery_bias,
                       n_classes, k):
            # distance + vote shared with the eval protocol's kNN so the
            # sklearn tie-break parity lives in one place (ops/knn.py)
            from ugaitnet_tpu.ops.knn import pairwise_l2, pairwise_l2_int8
            if isinstance(gallery, tuple):   # int8 gallery (codes, scale, g2)
                d2 = pairwise_l2_int8(codes, *gallery)
            else:
                d2 = pairwise_l2(codes, gallery)
            # dead slots (capacity padding + removed identities) carry a
            # +1e12 bias — excluded from any top-k while k <= live rows,
            # with no shape/static-arg change when the gallery mutates
            d2 = d2 + gallery_bias[None, :]
            neg, idx = jax.lax.top_k(-d2, k)
            votes = jax.nn.one_hot(gallery_dense[idx], n_classes,
                                   dtype=jnp.float32)
            pred = jnp.argmax(jnp.sum(votes, axis=1), axis=1)
            return pred, jnp.sqrt(-neg)

        @functools.partial(jax.jit, static_argnames=("n_classes", "k"))
        def _identify(params, raw, gallery, gallery_dense, gallery_bias,
                      n_classes, k):
            vols, flags, _ = _prep(raw)
            if self.quantized:
                from ugaitnet_tpu.ops.quantize import encode_int8
                codes = encode_int8(params, vols, flags, self.model.config)
            else:
                out = self.model.apply(params, vols, flags, train=False)
                codes = _tap(out, self.typecode)
            return _dist_vote(codes, gallery, gallery_dense, gallery_bias,
                              n_classes, k)

        self._identify = _identify
        self._identify_codes = jax.jit(
            _dist_vote, static_argnames=("n_classes", "k"))

        @jax.jit
        def _encode_raw(params, raw):
            vols, flags, _ = _prep(raw)
            if self.quantized:
                from ugaitnet_tpu.ops.quantize import encode_int8
                return encode_int8(params, vols, flags, self.model.config)
            out = self.model.apply(params, vols, flags, train=False)
            return _tap(out, self.typecode)

        self._encode_raw = _encode_raw

        # device-side gallery row appends for enroll(): only the new rows
        # cross H2D; the buffer is donated so the update is in-place on TPU.
        # Shapes are (capacity, ...) x (bucket, ...), so steady-state
        # enrollment reuses one executable per bucket size.
        def _constrain(x):
            if self._row_sharding is not None:
                x = jax.lax.with_sharding_constraint(x, self._row_sharding)
            return x

        @functools.partial(jax.jit, donate_argnums=(0,))
        def _append_f32(buf, rows, pos):
            return _constrain(
                jax.lax.dynamic_update_slice(buf, rows, (pos, 0)))

        @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
        def _append_i8(q, scale, g2, q_r, scale_r, g2_r, pos):
            return (_constrain(
                        jax.lax.dynamic_update_slice(q, q_r, (pos, 0))),
                    _constrain(
                        jax.lax.dynamic_update_slice(scale, scale_r, (pos,))),
                    _constrain(
                        jax.lax.dynamic_update_slice(g2, g2_r, (pos,))))

        self._append_f32 = _append_f32
        self._append_i8 = _append_i8

    # ------------------------------------------------------------------
    def set_gallery(self, codes: np.ndarray, labels: np.ndarray,
                    warmup: bool = False) -> None:
        """Install a fresh gallery (replacing any previous one).

        warmup=True precompiles every query bucket right away, so the
        first live query is steady-state (a cold compile through the
        remote-tunnel backend costs minutes)."""
        codes = np.asarray(codes, np.float32)
        labels = np.asarray(labels)
        if len(codes) == 0:
            raise ValueError("gallery must have at least one code")
        self._host_codes = codes
        self._host_labels = labels
        self._live = np.ones(len(codes), bool)
        self._install(self._fit_capacity(len(codes)),
                      _next_pow2(len(np.unique(labels))))
        if warmup:
            self.warmup()

    # -- capacity machinery --------------------------------------------
    def _fit_capacity(self, rows: int) -> int:
        cap = _next_pow2(rows)
        if self.mesh is not None:  # row-sharding must divide evenly
            n = self.mesh.shape[self.mesh.axis_names[0]]
            cap += (-cap) % n
        return cap

    def _put_rows(self, arr: np.ndarray) -> jax.Array:
        x = jnp.asarray(arr)
        if self._row_sharding is not None:
            x = jax.device_put(x, self._row_sharding)
        return x

    def _install(self, capacity: int, label_capacity: int) -> None:
        """(Re)build the device buffers at the given capacities, compacting
        tombstoned slots out of the host masters.  This is the only path
        that changes traced shapes / static args — it runs once per
        capacity doubling, never per enroll/remove."""
        self._host_codes = self._host_codes[self._live]
        self._host_labels = self._host_labels[self._live]
        self._live = np.ones(len(self._host_codes), bool)
        self._rows_used = len(self._host_codes)
        self._capacity = capacity
        self._label_capacity = label_capacity
        codes = self._host_codes
        pad = capacity - len(codes)
        if self.gallery_dtype == "int8":
            from ugaitnet_tpu.ops.knn import quantize_gallery
            # per-row quantization is shard- and append-independent, so
            # incremental enrolls match a full requant exactly
            q, scale, g2 = quantize_gallery(codes)
            if pad:  # dead slots are excluded by the bias vector
                q = np.concatenate([q, np.zeros((pad, q.shape[1]), np.int8)])
                scale = np.concatenate([scale, np.ones(pad, np.float32)])
                g2 = np.concatenate([g2, np.zeros(pad, np.float32)])
            self._gallery_codes = tuple(self._put_rows(a)
                                        for a in (q, scale, g2))
        else:
            g = codes
            if pad:
                g = np.concatenate(
                    [g, np.zeros((pad, g.shape[1]), np.float32)])
            self._gallery_codes = self._put_rows(g)
        self._refresh_meta()

    def _refresh_meta(self) -> None:
        """Recompute + upload the dense-label and bias vectors from the host
        masters (4/8 bytes per row — negligible next to the code rows).
        Dense ids come from sorted np.unique over LIVE labels, so tie-break
        order always matches a freshly built service."""
        live_idx = np.flatnonzero(self._live)
        self._ulabels, dense_live = np.unique(self._host_labels[live_idx],
                                              return_inverse=True)
        if len(self._ulabels) > self._label_capacity:
            raise AssertionError("class capacity underflow — enroll() must "
                                 "grow label_capacity before refreshing")
        dense = np.zeros(self._capacity, np.int32)
        dense[live_idx] = dense_live.astype(np.int32)
        bias = np.full(self._capacity, 1e12, np.float32)
        bias[live_idx] = 0.0
        self._gallery_dense = self._put_rows(dense)
        self._gallery_bias = self._put_rows(bias)
        self._gallery_size = int(len(live_idx))

    # -- incremental enrollment ----------------------------------------
    def enroll(self, codes: np.ndarray, labels: np.ndarray) -> None:
        """Append identities to the live gallery.

        Steady state (fits current capacities): new code rows are written
        device-side with dynamic_update_slice — only the new rows cross
        H2D, no traced shape or static argument changes, so NO recompile
        happens (pinned by tests/test_serving.py).  When row or class
        capacity is exceeded the gallery rebuilds at the doubled capacity
        (one recompile, amortized log2(G) over a gallery's life).
        """
        codes = np.asarray(codes, np.float32)
        labels = np.asarray(labels)
        if len(codes) != len(labels):
            raise ValueError(f"{len(codes)} codes vs {len(labels)} labels")
        if len(codes) == 0:
            return
        if self._host_codes is None:
            self.set_gallery(codes, labels)
            return
        n = len(codes)
        live_labels = self._host_labels[:self._rows_used][self._live]
        nuniq = len(np.unique(np.concatenate([live_labels, labels])))
        # chunk plan: each chunk pads to a query bucket so enrollment
        # compiles at most len(buckets) append executables, ever
        top = self.buckets[-1]
        starts = list(range(0, n, top))
        last_nb = self._bucket(n - starts[-1])
        in_place = (self._rows_used + n <= self._capacity
                    and self._rows_used + starts[-1] + last_nb
                    <= self._capacity
                    and nuniq <= self._label_capacity)
        self._host_codes = np.concatenate([self._host_codes, codes])
        self._host_labels = np.concatenate([self._host_labels, labels])
        self._live = np.concatenate([self._live, np.ones(n, bool)])
        if not in_place:
            self._install(self._fit_capacity(int(self._live.sum())),
                          _next_pow2(nuniq))
            return
        for s in starts:
            rows = codes[s:s + top]
            nb = self._bucket(len(rows))
            pad = nb - len(rows)
            pos = jnp.int32(self._rows_used + s)
            if self.gallery_dtype == "int8":
                from ugaitnet_tpu.ops.knn import quantize_gallery
                q, scale, g2 = quantize_gallery(rows)
                if pad:  # pad slots stay dead via the bias vector
                    q = np.concatenate(
                        [q, np.zeros((pad, q.shape[1]), np.int8)])
                    scale = np.concatenate([scale, np.ones(pad, np.float32)])
                    g2 = np.concatenate([g2, np.zeros(pad, np.float32)])
                self._gallery_codes = self._append_i8(
                    *self._gallery_codes, jnp.asarray(q), jnp.asarray(scale),
                    jnp.asarray(g2), pos)
            else:
                r = rows
                if pad:
                    r = np.concatenate(
                        [r, np.zeros((pad, r.shape[1]), np.float32)])
                self._gallery_codes = self._append_f32(
                    self._gallery_codes, jnp.asarray(r), pos)
        self._rows_used += n
        self._refresh_meta()

    def enroll_raw(self, raw: Dict[str, np.ndarray],
                   labels: np.ndarray) -> None:
        """Encode raw clip volumes with this service's (bucketed, warmed)
        encode path and enroll the resulting signatures."""
        self.enroll(self.encode_raw(raw), labels)

    def remove(self, labels) -> int:
        """Tombstone every gallery row whose label is in `labels`.

        Pure metadata: flips (capacity,) bias entries to +1e12 and refreshes
        the dense-label map — the code rows stay in place (compacted out at
        the next capacity rebuild), and nothing recompiles.  Returns the
        number of rows removed."""
        labs = np.atleast_1d(np.asarray(labels))
        if self._host_codes is None:
            raise RuntimeError("no gallery set")
        hit = np.isin(self._host_labels, labs) & self._live
        if not hit.any():
            return 0
        if hit.sum() == self._live.sum():
            raise ValueError("cannot remove the entire gallery — use "
                             "set_gallery to install a new one")
        self._live &= ~hit
        self._refresh_meta()
        return int(hit.sum())

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

    def _pad_raw(self, raw: Dict[str, np.ndarray], n: int) -> Dict:
        """Pad a raw query feed (n <= max bucket) to its query bucket."""
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
        return padded

    def encode_raw(self, raw: Dict[str, np.ndarray]) -> np.ndarray:
        """Encode raw clip volumes to (N, D) signatures through the same
        bucketed (never-recompiling) path identify_raw uses — the probe-side
        half of the service, exposed for enroll_raw and for callers that
        manage their own gallery."""
        n = next(iter(raw.values())).shape[0]
        top = self.buckets[-1]
        if n > top:
            return np.concatenate([
                self.encode_raw({k: np.asarray(v)[s:s + top]
                                 for k, v in raw.items()})
                for s in range(0, n, top)])
        codes = self._encode_raw(self.params, self._pad_raw(raw, n))
        return np.asarray(codes)[:n]

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
        padded = self._pad_raw(raw, n)
        k = min(self.knn, self._gallery_size)
        # n_classes is the CLASS CAPACITY (not the live unique count), so
        # enrolling a new identity within capacity keeps the static args
        # stable; unused class slots never receive votes (dead rows never
        # reach a top-k) so argmax cannot land on them
        pred, dists = self._identify(self.params, padded,
                                     self._gallery_codes,
                                     self._gallery_dense,
                                     self._gallery_bias,
                                     self._label_capacity, k)
        return self._ulabels[np.asarray(pred[:n])], np.asarray(dists[:n])

    def identify_codes(self, codes: np.ndarray
                       ) -> Tuple[np.ndarray, np.ndarray]:
        """kNN-identify precomputed (N, D) signature codes against the
        gallery — the distance+vote half of identify_raw, bucket-padded so
        steady-state calls never recompile."""
        if self._gallery_codes is None:
            raise RuntimeError("no gallery set")
        codes = np.asarray(codes, np.float32)
        n = len(codes)
        top = self.buckets[-1]
        if n > top:
            preds, dists = zip(*(self.identify_codes(codes[s:s + top])
                                 for s in range(0, n, top)))
            return np.concatenate(preds), np.concatenate(dists)
        nb = self._bucket(n)
        if nb > n:  # zero codes: distances = |g|^2, predictions discarded
            codes = np.concatenate(
                [codes, np.zeros((nb - n, codes.shape[1]), np.float32)])
        k = min(self.knn, self._gallery_size)
        pred, dists = self._identify_codes(jnp.asarray(codes),
                                           self._gallery_codes,
                                           self._gallery_dense,
                                           self._gallery_bias,
                                           self._label_capacity, k)
        return self._ulabels[np.asarray(pred[:n])], np.asarray(dists[:n])

    # -- 1:1 verification ----------------------------------------------
    def verify_codes(self, codes_a: np.ndarray, codes_b: np.ndarray,
                     threshold: Optional[float] = None
                     ) -> Tuple[np.ndarray, Optional[np.ndarray]]:
        """1:1 verification over row-paired signatures: L2 distances, plus
        same-person decisions when a threshold is given (host-side — the
        pairwise distance over two (N, D) code batches is trivial next to
        the encode).  Calibrate the threshold with
        calibrate_verification."""
        codes_a = np.asarray(codes_a, np.float32)
        codes_b = np.asarray(codes_b, np.float32)
        if codes_a.shape != codes_b.shape:
            raise ValueError(f"paired code batches must match: "
                             f"{codes_a.shape} vs {codes_b.shape}")
        d = np.linalg.norm(codes_a - codes_b, axis=1)
        return d, (d <= threshold if threshold is not None else None)

    def verify_raw(self, raw_a: Dict[str, np.ndarray],
                   raw_b: Dict[str, np.ndarray],
                   threshold: Optional[float] = None
                   ) -> Tuple[np.ndarray, Optional[np.ndarray]]:
        """Verify that raw clip pairs show the same person: encode both
        sides through the bucketed (never-recompiling) path and compare
        signature distances — the deployed form of the reference's
        verification nets + EER protocol (nets/mj_metrics.py:10-24,
        ops/losses.py:verif_pair_loss)."""
        return self.verify_codes(self.encode_raw(raw_a),
                                 self.encode_raw(raw_b), threshold)

    @staticmethod
    def calibrate_verification(codes_a: np.ndarray, codes_b: np.ndarray,
                               same: np.ndarray) -> Tuple[float, float]:
        """EER-point threshold over labeled pairs (same=1 for same-person):
        returns (eer, threshold) via ops/metrics.eer_verif_dist — exact
        mj_eerVerifDist parity.  Feed the threshold to verify_raw."""
        from ugaitnet_tpu.ops.metrics import eer_verif_dist
        d = np.linalg.norm(np.asarray(codes_a, np.float32)
                           - np.asarray(codes_b, np.float32), axis=1)
        return eer_verif_dist(np.asarray(same).astype(np.int64), d)

    def identify_video(self, raw: Dict[str, np.ndarray],
                       use_avg: bool = True
                       ) -> Tuple[np.ndarray, np.ndarray]:
        """Identify one VIDEO from its subsequence clips: encode every clip,
        merge the signatures into a single video code (mean, or max with
        use_avg=False — the reference's averaged/maxed video protocol,
        mains/mj_testUWYHGaitNet_open_tum.py:355-420 via
        eval/protocol.py:_merge_codes_per_video; no re-normalization after
        the merge, matching the eval path), and query the gallery once.
        For video-level galleries install per-video merged codes with
        set_gallery. Returns (label, (k,) neighbor distances)."""
        codes = self.encode_raw(raw)
        merged = codes.mean(axis=0) if use_avg else codes.max(axis=0)
        labels, dists = self.identify_codes(merged[None])
        return labels[0], dists[0]
