"""Test harness: run everything on a virtual 8-device CPU mesh.

Sharding tests need multiple devices without a TPU pod; JAX's host-platform
device-count override gives us 8 virtual CPU devices (SURVEY.md §4). The
environment may pre-register an accelerator platform via sitecustomize, so we
both set the env *and* force the platform through jax.config before any
backend initializes. Tests opt back into the real accelerator (bench runs)
by not going through this conftest.
"""

import os
import sys

os.environ.setdefault("TF_USE_LEGACY_KERAS", "1")
# Pin TF (the reference-parity oracle) to one thread BEFORE any test
# initializes its context: on this 1-core host TF's default inter-op pool
# spin-waits and quadruples jax step times in the same process (measured
# 62 s vs 16 s for the flagship grad, benchmarks/training_parity.py).
os.environ.setdefault("TF_NUM_INTRAOP_THREADS", "1")
os.environ.setdefault("TF_NUM_INTEROP_THREADS", "1")

if os.environ.get("UGAITNET_TPU_TESTS"):
    # hardware integration mode (tests/test_integration_tpu.py): keep the
    # real accelerator platform
    import jax  # noqa: E402
else:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax  # noqa: E402

    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
