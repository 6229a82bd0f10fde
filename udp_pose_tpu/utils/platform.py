"""Platform selection helper.

The runtime image pins ``JAX_PLATFORMS=axon`` via sitecustomize (one
tunnelled TPU chip) and ignores later env changes.  ``UDP_POSE_PLATFORM``
lets CLIs opt into a different platform (e.g. ``cpu`` for smoke runs) —
must be applied before any jax device query.
"""

from __future__ import annotations

import os


def maybe_force_platform():
    plat = os.environ.get("UDP_POSE_PLATFORM")
    if plat:
        import jax
        jax.config.update("jax_platforms", plat)
        if plat == "cpu" and "xla_force_host_platform_device_count" not in \
                os.environ.get("XLA_FLAGS", ""):
            # single host device unless the caller asked for more
            pass


def maybe_enable_compilation_cache(cache_dir: str = ""):
    """Persistent XLA compilation cache (serving/training cold-start).

    A full-size HRNet graph costs 1-7 min to compile; a restarted
    serving daemon or a preempted-and-rescheduled trainer pays it
    again from scratch.  With a cache dir set (``TPU.COMPILATION_CACHE``
    or ``$UDP_POSE_COMPILATION_CACHE``), XLA-compiled executables are
    serialized to disk keyed by HLO+flags and reloaded on the next
    process start.  The reference has no equivalent (torch eager).

    Returns the directory enabled, or "" when disabled.  Call before
    the first jit compilation (later calls still work but earlier
    compiles are not cached).

    Refused on the axon relay platform: measured there (2026-08-19),
    entries write but do not reload — a warm rerun recompiles at full
    cost (190.8s for a small graph) and a cache-enabled serving warmup
    stalled >18 min, so enabling the cache only adds serialization
    overhead.  CPU and locally-attached TPU platforms keep the cache.
    """
    d = cache_dir or os.environ.get("UDP_POSE_COMPILATION_CACHE", "")
    if not d:
        return ""
    import jax

    plats = jax.config.jax_platforms or os.environ.get("JAX_PLATFORMS", "")
    if "axon" in str(plats):
        import sys
        print("compilation cache disabled: the axon relay does not "
              "reload cached executables (see utils/platform.py)",
              file=sys.stderr)
        return ""
    d = os.path.abspath(d)
    os.makedirs(d, exist_ok=True)

    jax.config.update("jax_compilation_cache_dir", d)
    # cache every real model graph, skip only trivial jits
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return d
