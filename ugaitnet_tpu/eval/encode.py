"""Signature extraction for evaluation.

Device-batched equivalent of the reference's `evalUWYHNet_set` encode loop
(/root/reference/mains/mj_testUWYHGaitNet_open_casiab.py:55-245): iterate the
dataset deterministically (expand=1, no shuffle, trailing partial batch
included), tap the requested embedding, optionally add mirrored copies, and
return codes + labels + video ids + cams on host.

typecode parity (:157-166): 1 -> "signature", 3 -> "flatten", else "code".
Rank-3 part signatures are flattened per sample so kNN sees one vector per
subsequence (what the reference's "flatten" tap produces; its typecode=1 on
a gaitset net was effectively unusable).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import numpy as np

from ugaitnet_tpu.core.config import DataConfig
from ugaitnet_tpu.data.pipeline import GaitPipeline
from ugaitnet_tpu.data.sampler import SequentialSampler
from ugaitnet_tpu.data.schema import GaitDataset
from ugaitnet_tpu.models.network import UGaitNet
from ugaitnet_tpu.ops.augment import mirror_volume

TYPECODE_TAP = {1: "signature", 3: "flatten"}


def _tap(out: Dict[str, jax.Array], typecode: int) -> jax.Array:
    name = TYPECODE_TAP.get(typecode, "code")
    x = out.get(name, out["signature"])
    if x.ndim == 3:
        x = x.reshape(x.shape[0], -1)
    return x


_ENCODE_CACHE: Dict[Tuple[object, int, object], object] = {}


def make_encode_fn(model: UGaitNet, typecode: int = 3, mesh=None):
    # cache per (model config, typecode, mesh): eval_all_combos calls
    # encode_dataset up to 2*(2^nmods - 1) times, and a fresh jit closure
    # each time would re-trace the identical computation (cold compiles
    # through the tunnel cost minutes).  The frozen ModelConfig itself is
    # the key (hashable dataclass): dict lookup falls back to __eq__ on a
    # hash collision, so two distinct configs can never alias an entry.
    key = (model.config, typecode, mesh)
    fn = _ENCODE_CACHE.get(key)
    if fn is not None:
        return fn

    def encode_impl(params, volumes, use_flags):
        out = model.apply(params, list(volumes), list(use_flags),
                          train=False)
        return _tap(out, typecode)

    if mesh is None:
        encode = jax.jit(encode_impl)
    else:
        # Data-parallel gallery/probe encoding over a device mesh: params
        # replicated, batch axis-0 sharded, codes gathered back replicated
        # (they leave for host numpy immediately).  Per-sample independent
        # forward -> GSPMD partitions it with zero collectives beyond the
        # output gather.
        from ugaitnet_tpu.parallel.sharding import replicated
        encode = jax.jit(encode_impl, out_shardings=replicated(mesh))

    _ENCODE_CACHE[key] = encode
    return encode


def encode_dataset(model: UGaitNet, params, ds: GaitDataset,
                   modalities: Sequence[str],
                   typecode: int = 3, batch_size: int = 128,
                   use_mods: Optional[Sequence[float]] = None,
                   mirror: bool = False,
                   indices: Optional[np.ndarray] = None,
                   mesh=None, norm_stats=None
                   ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Returns (codes (N,D), labels, video_ids, cams) — raw label space.

    use_mods masks whole modalities at encode time (the eval scripts'
    use_mod1/use_mod2 args and the TUM all-combos protocol). mirror=True
    appends a horizontally-mirrored copy of every batch (usemirror gallery
    option, mj_testUWYHGaitNet_open_casiab.py:194-206).

    mesh: optional jax.sharding.Mesh — shards every encode batch over the
    mesh's data axis (params replicated), for pod-scale gallery encoding.
    The per-sample forward is identical; with l2_mode="reference" the
    signature L2 reduces over the (sharded) batch axis and GSPMD may
    reassociate that reduction — measured maxerr ~1.5e-7 fp32 vs the
    single-device codes (tests/test_eval.py), not bit-exact.
    """
    cfg = DataConfig(batch_size=batch_size, expand_level=1, augment=False)
    # norm_stats: the per-dataset standardization the model was trained
    # with (--normstats); encoding without it feeds the net inputs on a
    # different scale than training saw
    pipe = GaitPipeline(ds, cfg, modalities, labmap=None, indices=indices,
                        augment=False, norm_stats=norm_stats)
    n = len(pipe.indices)
    if n == 0:
        # loud instead of the opaque np.concatenate error at the end (an
        # empty probe dir / indices filter is a data mistake; returning
        # (0, D) codes would just surface later as a silent rank1=0.0)
        raise ValueError(
            f"encode_dataset: no samples to encode in '{ds.name}' "
            f"(dataset len {len(ds)}, indices filter "
            f"{'set' if indices is not None else 'absent'})")
    encode = make_encode_fn(model, typecode, mesh)
    place = lambda t: t  # noqa: E731
    if mesh is not None:
        from ugaitnet_tpu.parallel.sharding import (DATA_AXIS, batch_sharding,
                                                    replicate)
        ndev = mesh.shape[DATA_AXIS]
        if batch_size % ndev:
            raise ValueError(
                f"encode batch_size {batch_size} not divisible by the "
                f"{ndev}-device data axis; the padded trailing batch could "
                "not shard evenly")
        params = replicate(params, mesh)
        sh = batch_sharding(mesh)
        place = lambda t: tuple(jax.device_put(x, sh) for x in t)  # noqa: E731
    if use_mods is None:
        use_mods = [1.0] * len(modalities)

    codes, metas = [], []
    key = jax.random.PRNGKey(0)
    for batch_idx in SequentialSampler(n, batch_size).epoch():
        # pad the trailing partial batch to the full size so it reuses the
        # compiled executable (a fresh shape costs minutes on cold caches).
        # Padded rows get use_flags == 0: gating then zeroes their
        # embeddings, so under l2_mode="reference" (batch-axis signature
        # L2) they contribute nothing to the column norms and the real
        # rows are bit-identical to an unpadded forward — duplicate-row
        # padding would instead skew every real code in the tail batch.
        real = len(batch_idx)
        valid = None
        if real < batch_size:
            batch_idx = np.concatenate(
                [batch_idx, np.full(batch_size - real, batch_idx[-1])])
            valid = np.zeros(batch_size, np.float32)
            valid[:real] = 1.0
        vols, flags, _ = pipe.load(batch_idx, key, expand=1)
        flags = [f * u for f, u in zip(flags, use_mods)]
        if valid is not None:
            flags = [f * valid for f in flags]
        codes.append(np.asarray(encode(params, place(tuple(vols)),
                                       place(tuple(flags))))[:real])
        metas.append(batch_idx[:real])
        if mirror:
            mvols = [jax.vmap(
                lambda v, m=m: mirror_volume(v, is_of=(m == "of")))(v)
                for v, m in zip(vols, modalities)]
            codes.append(np.asarray(encode(params, place(tuple(mvols)),
                                           place(tuple(flags))))[:real])
            metas.append(batch_idx[:real])

    sel = pipe.indices[np.concatenate(metas)]
    return (np.concatenate(codes), np.asarray(ds.labels[sel]),
            np.asarray(ds.video_ids[sel]), np.asarray(ds.cams[sel]))
