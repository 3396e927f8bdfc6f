"""Per-op device-time summaries from jax.profiler traces.

The reference has no profiling story; on TPU the jax profiler writes an
xplane protobuf that normally needs TensorBoard to read (and the installed
tensorboard_plugin_profile's convert API is incompatible with this TF).
This module parses the xplane directly and aggregates per-HLO-op device
time — the tool behind every round-2 optimization (the layout-copy and
weight-gradient findings in CLAUDE.md came from these tables).

Usage:
    with jax.profiler.trace("/tmp/trace"):
        for _ in range(3): step(...)
    for line in summarize_xplane("/tmp/trace", iters=3)[:20]:
        print(line)

Needs PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python when the installed
protobuf runtime rejects TF's generated descriptors (set it before the
tensorflow import, e.g. in the shell).
"""

from __future__ import annotations

import collections
import glob
import os
from typing import List, NamedTuple


class OpTime(NamedTuple):
    ms_per_iter: float
    count: int
    name: str


def _load_xplane(path_or_dir: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    if os.path.isdir(path_or_dir):
        cands = sorted(glob.glob(os.path.join(
            path_or_dir, "plugins/profile/*/*.xplane.pb")))
        if not cands:
            raise FileNotFoundError(f"no xplane.pb under {path_or_dir}")
        path_or_dir = cands[-1]
    xs = xplane_pb2.XSpace()
    with open(path_or_dir, "rb") as f:
        xs.ParseFromString(f.read())
    return xs


def summarize_xplane(path_or_dir: str, iters: int = 1,
                     device_substr: str = "TPU") -> List[OpTime]:
    """Aggregate per-op device time from a trace dir or xplane.pb file.

    iters: number of identical steps captured inside the trace — reported
    times are divided by it.  Returns ops sorted by total time, one row
    per distinct HLO op (fusions keep their full HLO text as the name).
    """
    xs = _load_xplane(path_or_dir)
    rows: List[OpTime] = []
    for plane in xs.planes:
        if device_substr.lower() not in plane.name.lower():
            continue
        evmeta = {m.id: m.name for m in plane.event_metadata.values()}
        total: collections.Counter = collections.Counter()
        count: collections.Counter = collections.Counter()
        for line in plane.lines:
            lname = line.name.lower()
            # the "Async XLA Ops" line carries copy-start/copy-done SPANS
            # that overlap compute; summing them as op times reproduces
            # the round-2 misread ("30 ms of conv wgrad" that was copy
            # spans — benchmarks/BUDGET.md). Only the sync op line counts.
            if "xla op" not in lname or "async" in lname:
                continue
            for ev in line.events:
                name = evmeta.get(ev.metadata_id, "?")
                total[name] += ev.duration_ps
                count[name] += 1
        for name, ps in total.most_common():
            rows.append(OpTime(ps / 1e9 / iters, count[name], name))
    rows.sort(key=lambda r: -r.ms_per_iter)
    return rows


def print_op_profile(path_or_dir: str, iters: int = 1, top: int = 40,
                     width: int = 110) -> None:
    for r in summarize_xplane(path_or_dir, iters)[:top]:
        print(f"  {r.ms_per_iter:8.3f} ms/iter  x{r.count:3d}  "
              f"{r.name[:width]}")
