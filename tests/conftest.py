"""Test configuration.

Tests run on a virtual 8-device CPU mesh so that data-parallel / sharding
tests work without TPU hardware (standard JAX practice).

Note: this image's axon TPU plugin force-sets ``jax_platforms`` at import,
so the usual ``JAX_PLATFORMS=cpu`` env var is ignored — we must override
via ``jax.config.update`` after import. ``XLA_FLAGS`` must still be set
before the CPU backend initializes.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
