"""Persistent XLA compilation cache for the CLI tools.

Every tool invocation is a fresh process, and a full-model jit compile costs
1-8 minutes on this class of hardware. JAX's persistent compilation cache
serializes compiled executables keyed on (HLO, platform, flags), so a rerun
of the same tool at the same shapes loads in seconds (measured 6.7 s -> 0.9 s
for a yolov10n forward+decode through the axon TPU plugin).

The cache lives in a subdirectory keyed by a HOST FINGERPRINT (CPU model +
feature flags + jax/jaxlib/libtpu versions). This is load-bearing for
correctness, not hygiene: the axon AOT pipeline bakes host-CPU-feature-
dependent XLA:CPU glue into its artifacts, and an artifact compiled on one
host, loaded on another, EXECUTES WITHOUT ERROR WITH WRONG NUMERICS (the
`cpu_aot_loader` machine-feature warnings are the only symptom). Observed
concretely: a cached train-step executable from a different host trained
yolov10n to held-out mAP50 0.077 where a fresh compile of the identical
program reproduces the recorded 0.497 bit-exactly (SQA QT-001, 2026-08-19).
Fingerprinting the directory makes a host/toolchain change miss the cache
and recompile instead of loading a foreign executable.

The reference has no equivalent (torch eager pays no compile); this is a
TPU-native operability requirement, not a parity feature.
"""

from __future__ import annotations

import hashlib
import os
from typing import Optional

#: Environment knob: set to a directory to relocate the cache, or to "0" to
#: disable persistent caching entirely.
ENV_VAR = "LEANYOLO_COMPILE_CACHE"

DEFAULT_DIR = os.path.join("~", ".cache", "leanyolo_tpu", "jax_cache")


def host_fingerprint() -> str:
    """Hash of the host CPU identity and the JAX/libtpu stack versions.

    Keys the cache so artifacts never cross a host or toolchain change.
    The CPU *feature flags* (not just the model name) are included because
    that is exactly what the AOT loader checks (cpu_aot_loader.cc) — two
    hosts with the same nominal model but different exposed features (e.g.
    amx variants) produce incompatible AOT code.
    """
    parts = []
    try:
        import jax

        parts.append(f"jax={jax.__version__}")
    except Exception:  # pragma: no cover - jax is a hard dep everywhere else
        pass
    try:
        import jaxlib

        parts.append(f"jaxlib={jaxlib.__version__}")
    except Exception:
        pass
    try:
        from importlib.metadata import version

        parts.append(f"libtpu={version('libtpu')}")
    except Exception:
        pass
    try:
        with open("/proc/cpuinfo", "r", encoding="utf-8") as f:
            for line in f:
                if line.startswith(("model name", "flags")):
                    parts.append(line.strip())
                    if line.startswith("flags"):
                        break  # first core's model+flags identify the host
    except OSError:
        import platform

        parts.append(platform.processor() or platform.machine())
    return hashlib.sha256("\n".join(parts).encode()).hexdigest()[:16]


def enable_persistent_compile_cache(cache_dir: Optional[str] = None) -> Optional[str]:
    """Point JAX's persistent compilation cache at a host-scoped directory.

    Call before the first jit compile (any time before first use works — the
    config is read at compile time). Returns the cache directory, or None if
    caching was disabled or already configured.

    Precedence: explicit ``cache_dir`` arg > ``$LEANYOLO_COMPILE_CACHE`` >
    ``~/.cache/leanyolo_tpu/jax_cache``. The host fingerprint subdirectory is
    appended to whichever base wins. A pre-existing configuration (e.g. the
    test suite's conftest cache, or a user-set ``JAX_COMPILATION_CACHE_DIR``)
    is left untouched so in-process tool invocations from tests keep hitting
    the test cache.
    """
    import jax

    env = os.environ.get(ENV_VAR)
    if env == "0":
        return None
    if jax.config.jax_compilation_cache_dir:
        return None  # already configured (tests, or the user's own setup)
    base = os.path.expanduser(cache_dir or env or DEFAULT_DIR)
    d = os.path.join(base, host_fingerprint())
    try:
        os.makedirs(d, exist_ok=True)
    except OSError:
        return None  # unwritable location: run uncached rather than fail
    jax.config.update("jax_compilation_cache_dir", d)
    # Skip caching trivial programs (threefry helpers etc. recompile in ms);
    # full-model programs all clear this bar by orders of magnitude.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return d
