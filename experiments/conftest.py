"""Standalone-run config for the quarantined probe tests.

experiments/ is NOT in pytest's testpaths; these tests run only when invoked
explicitly (e.g. `python -m pytest experiments/test_stem_pallas.py`). Force
the CPU backend (interpret-mode Pallas) exactly like tests/conftest.py does
— the axon plugin ignores JAX_PLATFORMS, only config.update works.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from leanyolo_tpu.utils.compile_cache import host_fingerprint  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.environ.get("LEANYOLO_TEST_CACHE", "/tmp/leanyolo_tpu_jax_cache"), host_fingerprint()),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
