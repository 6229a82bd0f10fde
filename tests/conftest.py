"""Test harness config: force an 8-device virtual CPU mesh.

This replaces the reference's "multi-node testing: none" (SURVEY.md §4) with
`jax.device_count()`-parameterised pjit tests that run anywhere.  The
environment pre-registers the axon TPU backend via sitecustomize with
``JAX_PLATFORMS=axon``; tests must run on a deterministic 8-device CPU mesh
instead, so we override the platform through jax.config *before any
computation runs* (env vars alone are too late — sitecustomize already
imported jax).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
