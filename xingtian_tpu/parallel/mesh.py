"""Device mesh construction and axis conventions.

This replaces the reference's entire process topology — Controller/Broker
ZMQ routing, node_config SSH bootstrap, plasma stores (SURVEY §2.4, §5.8)
— with a ``jax.sharding.Mesh``.  Axis convention:

* ``dp``  — data parallel: envs and rollouts sharded, gradients psum'd.
           Covers the reference's explorer fan-out (env_num × nodes) AND
           its grad-worker data parallelism (``xt/framework/trainer.py``).
* ``mp``  — reserved model axis (tensor parallelism) so large policies can
           shard later; the reference has no model sharding at all
           (SURVEY §2.5), so ``mp=1`` everywhere today.

Multi-host: ``jax.distributed.initialize()`` + the same mesh over all
hosts' devices — collectives ride ICI/DCN, no broker needed.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DP_AXIS = "dp"
MP_AXIS = "mp"

# The mesh the current training program is being traced/sharded for.
# ``make_dp_step`` sets it so mesh-aware op dispatch (the Pallas kernels'
# shard_map wrappers, ``ops/pallas_scan.py``) can see the axis layout at
# trace time — plain ``jit(in_shardings=...)`` does not expose an ambient
# mesh to the traced function.
_ACTIVE_MESH: Optional[Mesh] = None


def set_active_mesh(mesh: Optional[Mesh]) -> None:
    global _ACTIVE_MESH
    _ACTIVE_MESH = mesh


def active_mesh() -> Optional[Mesh]:
    return _ACTIVE_MESH


def make_mesh(
    n_devices: Optional[int] = None,
    mp_size: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ``(dp, mp)`` mesh over the first ``n_devices`` devices."""
    devs = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if n % mp_size != 0:
        raise ValueError(f"{n} devices not divisible by mp_size={mp_size}")
    arr = np.array(devs).reshape(n // mp_size, mp_size)
    return Mesh(arr, (DP_AXIS, MP_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def dp_sharded(mesh: Mesh, ndim_before: int = 0) -> NamedSharding:
    """Shard the leading axis over ``dp`` (per-env data)."""
    return NamedSharding(mesh, P(*([None] * ndim_before), DP_AXIS)) if ndim_before \
        else NamedSharding(mesh, P(DP_AXIS))
