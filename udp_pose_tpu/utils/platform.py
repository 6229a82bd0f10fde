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
