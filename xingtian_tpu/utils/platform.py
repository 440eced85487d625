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


def safe_donate_argnums(argnums: Tuple[int, ...] = (0,)) -> Tuple[int, ...]:
    """Donation argnums, disabled on the axon tunnel backend."""
    return () if default_backend() == "axon" else argnums
