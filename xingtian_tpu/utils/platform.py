"""Platform quirks.

The development image reaches its TPU through the experimental ``axon``
PJRT tunnel, which (empirically) fails with ``INVALID_ARGUMENT`` or hangs
when large fused programs are compiled with donated input buffers.  On
real TPU/CPU backends donation is safe and saves an HBM copy of the whole
train state per step, so it stays on by default there.
"""

from __future__ import annotations

from typing import Tuple


def default_backend() -> str:
    import jax
    return jax.default_backend()


def is_axon_backend() -> bool:
    """The axon tunnel masquerades as platform 'tpu'; the reliable marker
    is the PJRT platform_version string (and the registered backend list)."""
    import jax
    try:
        if "axon" in jax.devices()[0].client.platform_version.lower():
            return True
    except Exception:
        pass
    try:
        from jax._src import xla_bridge
        return "axon" in xla_bridge.backends()
    except Exception:
        return False


def safe_donate_argnums(argnums: Tuple[int, ...] = (0,)) -> Tuple[int, ...]:
    """Donation argnums, disabled on the axon tunnel backend (large-state
    donation fails there with INVALID_ARGUMENT)."""
    return () if is_axon_backend() else argnums
