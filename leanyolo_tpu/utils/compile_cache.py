"""Persistent XLA compilation cache for the CLI tools.

Every tool invocation is a fresh process, and a full-model jit compile costs
1-8 minutes on this class of hardware. JAX's persistent compilation cache
serializes compiled executables keyed on (HLO, platform, flags), so a rerun
of the same tool at the same shapes loads in seconds (measured 6.7 s -> 0.9 s
for a yolov10n forward+decode through the axon TPU plugin).

The reference has no equivalent (torch eager pays no compile); this is a
TPU-native operability requirement, not a parity feature.
"""

from __future__ import annotations

import os
from typing import Optional

#: Environment knob: set to a directory to relocate the cache, or to "0" to
#: disable persistent caching entirely.
ENV_VAR = "LEANYOLO_COMPILE_CACHE"

DEFAULT_DIR = os.path.join("~", ".cache", "leanyolo_tpu", "jax_cache")


def enable_persistent_compile_cache(cache_dir: Optional[str] = None) -> Optional[str]:
    """Point JAX's persistent compilation cache at a stable directory.

    Call before the first jit compile (any time before first use works — the
    config is read at compile time). Returns the cache directory, or None if
    caching was disabled or already configured.

    Precedence: explicit ``cache_dir`` arg > ``$LEANYOLO_COMPILE_CACHE`` >
    ``~/.cache/leanyolo_tpu/jax_cache``. A pre-existing configuration (e.g.
    the test suite's conftest cache, or a user-set ``JAX_COMPILATION_CACHE_DIR``)
    is left untouched so in-process tool invocations from tests keep hitting
    the test cache.
    """
    import jax

    env = os.environ.get(ENV_VAR)
    if env == "0":
        return None
    if jax.config.jax_compilation_cache_dir:
        return None  # already configured (tests, or the user's own setup)
    d = os.path.expanduser(cache_dir or env or DEFAULT_DIR)
    try:
        os.makedirs(d, exist_ok=True)
    except OSError:
        return None  # unwritable location: run uncached rather than fail
    jax.config.update("jax_compilation_cache_dir", d)
    # Skip caching trivial programs (threefry helpers etc. recompile in ms);
    # full-model programs all clear this bar by orders of magnitude.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return d
