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
    # XLA's own cache key covers HLO+flags but NOT the host CPU's
    # machine features: an XLA:CPU AOT executable compiled on another
    # host loads here with "could lead to SIGILL" warnings (observed on
    # the dryrun's warm cache) and can crash outright on a weaker host.
    # Scoping the directory by a host fingerprint makes a host change
    # invalidate cleanly instead.
    d = os.path.join(os.path.abspath(d),
                     "host-" + host_cache_fingerprint())
    os.makedirs(d, exist_ok=True)

    jax.config.update("jax_compilation_cache_dir", d)
    # cache every real model graph, skip only trivial jits
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return d


def host_cache_fingerprint(cpuinfo_text: str = None,
                           versions: tuple = None) -> str:
    """Stable 12-hex fingerprint of (host CPU feature flags, machine,
    jax/jaxlib versions) — the compatibility surface of an XLA:CPU AOT
    executable.  Same host+toolchain → same key; any flag or version
    change → a fresh cache subdirectory."""
    import hashlib
    import platform as _platform

    if cpuinfo_text is None:
        try:
            with open("/proc/cpuinfo") as f:
                cpuinfo_text = f.read()
        except OSError:
            cpuinfo_text = ""
    flags = ""
    for line in cpuinfo_text.splitlines():
        if line.startswith(("flags", "Features")):
            flags = " ".join(sorted(line.split(":", 1)[1].split()))
            break
    if versions is None:
        import jax
        import jaxlib
        versions = (jax.__version__, getattr(jaxlib, "__version__", ""))
    blob = "|".join([flags, _platform.machine(), *versions])
    return hashlib.sha256(blob.encode()).hexdigest()[:12]
