"""Test harness: force the CPU backend with 8 virtual devices.

Multi-chip sharding is validated on a virtual CPU mesh (the reference
validates "distributed" by patching localhost into node_config,
``zeus/common/util/get_xt_config.py:149-176`` — same spirit, better
coverage).  Note: the axon TPU plugin overrides the JAX_PLATFORMS env var,
so the platform must be forced through jax.config before first use.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
