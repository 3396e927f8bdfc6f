"""Parse a jax.profiler xplane.pb and print the per-op device time table.

Usage: PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
           python benchmarks/parse_xplane.py [xplane.pb path]
"""

import collections
import glob
import sys

from tensorflow.tsl.profiler.protobuf import xplane_pb2


def main():
    paths = sys.argv[1:] or sorted(glob.glob(
        "/tmp/embed_trace/plugins/profile/*/*.xplane.pb"))
    path = paths[-1]
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())

    for plane in xs.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name.lower():
            continue
        evmeta = {m.id: m.name for m in plane.event_metadata.values()}
        total = collections.Counter()
        count = collections.Counter()
        for line in plane.lines:
            lname = line.name.lower()
            # XLA op lines carry the per-op events
            if "xla op" in lname or "xla_op" in lname:
                for ev in line.events:
                    total[evmeta.get(ev.metadata_id, "?")] += ev.duration_ps
                    count[evmeta.get(ev.metadata_id, "?")] += 1
        if not total:
            # fall back: dump line names so we can see the structure
            print(plane.name, "lines:", [l.name for l in plane.lines][:20])
            continue
        print(f"== {plane.name}  (total device {sum(total.values())/1e12*1e3:.2f} ms over all iters)")
        for name, ps in total.most_common(45):
            print(f"  {ps/1e12*1e3/3:8.3f} ms/iter  x{count[name]:3d}  {name[:110]}")


if __name__ == "__main__":
    main()
