"""Test configuration: force CPU jax with 8 virtual devices.

Sharding/pmap tests exercise multi-chip code paths on a virtual CPU mesh
(the driver separately dry-runs the multichip path; see __graft_entry__.py).
Must run before jax is imported anywhere.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The axon TPU plugin ignores the JAX_PLATFORMS/JAX_PLATFORM_NAME env vars;
# only jax.config.update reliably forces the CPU backend here.
import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Reserve the repo's `tools` package in sys.modules now: parity tests put
# /root/reference (which has its own `tools/`) at sys.path[0], and a later
# `import tools.train` must not resolve to the reference's CLI.
import tools  # noqa: E402,F401

# Persistent compilation cache: this host has ONE CPU core, so full-model
# XLA compiles dominate test time; the cache makes reruns cheap. The host
# fingerprint subdir guards against loading foreign AOT artifacts after a
# machine change — they execute with WRONG numerics, not an error (see
# leanyolo_tpu/utils/compile_cache.py).
from leanyolo_tpu.utils.compile_cache import host_fingerprint  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.environ.get("LEANYOLO_TEST_CACHE", "/tmp/leanyolo_tpu_jax_cache"), host_fingerprint()),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

# Auto-rerun load-skipped distributed tests at session finish (the skips are
# core-saturation verdicts, not product verdicts — see tests/dist_rerun.py).
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from dist_rerun import (  # noqa: E402,F401
    pytest_runtest_logreport,
    pytest_sessionfinish,
)

REFERENCE_ROOT = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_ROOT, "leanyolo"))
