"""Parallelism package: device mesh + sharded train-step execution."""

from xingtian_tpu.parallel.mesh import DP_AXIS, MP_AXIS, make_mesh, replicated
from xingtian_tpu.parallel.dp import algo_state_shardings, make_dp_step

__all__ = [
    "DP_AXIS", "MP_AXIS", "algo_state_shardings", "make_dp_step",
    "make_mesh", "replicated",
]
