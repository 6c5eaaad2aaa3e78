"""Test configuration: force CPU jax with 8 virtual devices.

Sharding/pmap tests exercise multi-chip code paths on a virtual CPU mesh
(the driver separately dry-runs the multichip path; see __graft_entry__.py).
Must run before jax is imported anywhere.
"""

import os
import sys

os.environ["JAX_PLATFORM_NAME"] = "cpu"  # the axon TPU plugin ignores JAX_PLATFORMS
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_ROOT = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_ROOT, "leanyolo"))
