"""Multi-host launch — replaces the reference's SSH/wheel bootstrap.

The reference starts remote nodes by SCP-ing a wheel and running brokers
over fabric SSH (``xt/framework/remoter.py:40-174``), then routes all
data through ZMQ.  On a TPU pod slice the idiomatic launch is: run the
SAME program on every host (one process per host, e.g. via the TPU VM
launcher or mpirun/srun), call :func:`init_distributed` first, and build
the mesh over ``jax.devices()`` (all chips of the slice).  Rollout and
gradient collectives then ride ICI/DCN via XLA — no broker processes.

Environment contract (standard JAX): either TPU metadata auto-detection
(on real TPU VMs ``jax.distributed.initialize()`` needs no arguments) or
explicit ``coordinator_address``/``num_processes``/``process_id``.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> dict:
    """Initialize multi-host JAX; no-op for single-process runs.

    Arguments default from env vars ``XT_COORDINATOR`` /
    ``XT_NUM_PROCESSES`` / ``XT_PROCESS_ID`` so the same train script
    works single-host and multi-host.
    """
    coordinator_address = coordinator_address or os.environ.get("XT_COORDINATOR")
    num_processes = num_processes or _int_env("XT_NUM_PROCESSES")
    process_id = process_id if process_id is not None else _int_env("XT_PROCESS_ID")

    if coordinator_address is None and num_processes in (None, 1):
        return {"num_processes": 1, "process_id": 0,
                "local_devices": len(jax.local_devices()),
                "global_devices": len(jax.devices())}

    # idempotent: ``import xingtian_tpu`` already initializes when the
    # XT_COORDINATOR contract is in the environment (the package import
    # materializes registry arrays, which would otherwise claim the
    # backend before jax.distributed could)
    if not jax.distributed.is_initialized():
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return {
        "num_processes": jax.process_count(),
        "process_id": jax.process_index(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def _int_env(name: str) -> Optional[int]:
    v = os.environ.get(name)
    return int(v) if v is not None else None
