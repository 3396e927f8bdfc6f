"""Parse a jax.profiler xplane.pb and print the per-op device time table.

Thin wrapper over the framework's obsv/profiling.py (which see).

Usage: PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
           python benchmarks/parse_xplane.py [xplane.pb or trace dir] [iters]
"""

import sys

sys.path.insert(0, ".")

from ugaitnet_tpu.obsv.profiling import print_op_profile

if __name__ == "__main__":
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/embed_trace"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    print_op_profile(path, iters=iters)
