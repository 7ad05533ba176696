"""Test configuration: force the CPU backend with 8 virtual devices so
multi-chip sharding paths are exercised without TPU hardware.

Note: the environment's sitecustomize registers an `axon` TPU PJRT plugin and
overwrites jax_platforms at interpreter start, so setting the env var alone
is not enough — we must update jax.config after import, before first use.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
