"""Test env: CPU backend, 8 virtual devices (for sharding tests), x64 on.

jax is pre-imported by a site startup hook in this image, so env vars are
too late — use runtime config (backends initialize lazily, so this works
as long as it runs before any computation).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
