"""Observability: scalar metrics, histograms, embedding exports, profiling.

Replaces the reference's TensorBoard wiring (histogram_freq, profile_batch,
Projector export — /root/reference/mains/mj_trainUWYHGaitNet_DataGen_CasiaB.py:368-369,
/root/reference/nets/mj_utils.py:75-131) with:

  * an always-on JSONL metrics stream (metrics.jsonl per experiment dir) —
    greppable, no TF dependency;
  * optional TensorBoard scalars/histograms via torch.utils.tensorboard when
    importable (lazy import — torch is heavy);
  * embedding projector export: codes + labels as .npy/.tsv in the TB
    projector layout;
  * `profile(step_fn)` helper wrapping jax.profiler traces (the
    profile_batch analogue).
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Any, Dict, Sequence

import numpy as np


class MetricsLogger:
    def __init__(self, experdir: str, use_tensorboard: bool = False):
        os.makedirs(experdir, exist_ok=True)
        self.experdir = experdir
        self.path = os.path.join(experdir, "metrics.jsonl")
        self._f = open(self.path, "a")
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(log_dir=os.path.join(experdir, "tb"))
            except Exception:
                self._tb = None

    def log(self, step: int, metrics: Dict[str, Any], prefix: str = "") -> None:
        rec = {}
        for k, v in metrics.items():
            try:
                f = float(v)
            except (TypeError, ValueError):
                continue
            # nan/inf serialize as literal NaN/Infinity — invalid JSON
            # that breaks jq/strict consumers of the "greppable" stream
            # (e.g. an undefined val EER). Store null instead.
            rec[prefix + k] = f if np.isfinite(f) else None
        # bookkeeping fields win: a metric literally named "time"/"step"
        # must not overwrite the record timestamp/step
        rec["step"] = int(step)
        rec["time"] = time.time()
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._tb is not None:
            for k, v in rec.items():
                if k not in ("step", "time") and v is not None:
                    self._tb.add_scalar(k, v, step)

    def log_histogram(self, step: int, name: str, values: np.ndarray) -> None:
        if self._tb is not None:
            self._tb.add_histogram(name, np.asarray(values), step)

    def export_embeddings(self, step: int, codes: np.ndarray,
                          labels: Sequence, tag: str = "signatures",
                          images: Sequence = None) -> str:
        """Projector-style export (mj_register_embedding parity,
        nets/mj_utils.py:75-131): codes .npy + labels .tsv per step, plus a
        sprite sheet when per-sample thumbnails are given (mj_save_sprite,
        nets/mj_utils.py:95-131)."""
        d = os.path.join(self.experdir, "projector", f"{tag}_{step:05d}")
        os.makedirs(d, exist_ok=True)
        np.save(os.path.join(d, "codes.npy"), np.asarray(codes))
        with open(os.path.join(d, "metadata.tsv"), "w") as f:
            for l in labels:
                f.write(f"{l}\n")
        if images is not None and len(images) == len(codes):
            try:
                from ugaitnet_tpu.utils.net_utils import save_sprite
                save_sprite(images, os.path.join(d, "sprite.png"),
                            max_size=2048)
            except Exception:
                pass
        if self._tb is not None:
            try:
                self._tb.add_embedding(np.asarray(codes),
                                       metadata=list(labels),
                                       tag=tag, global_step=step)
            except Exception:
                pass
        return d

    def close(self) -> None:
        self._f.close()
        if self._tb is not None:
            self._tb.close()


@contextlib.contextmanager
def profile(logdir: str, enabled: bool = True):
    """jax.profiler trace around a block (the profile_batch analogue)."""
    if not enabled:
        yield
        return
    import jax
    try:
        jax.profiler.start_trace(logdir)
        yield
    finally:
        try:
            jax.profiler.stop_trace()
        except Exception:
            pass


def read_metrics(experdir: str) -> list:
    path = os.path.join(experdir, "metrics.jsonl")
    if not os.path.exists(path):
        return []
    out = []
    with open(path) as f:
        for line in f:
            if not line.strip():
                continue
            try:
                out.append(json.loads(line))
            except ValueError:
                continue  # torn tail from a crash mid-write
    return out
