"""Runtime package: trainer loop, workspace, metrics, checkpoints, eval."""

from xingtian_tpu.runtime.trainer import (
    Trainer, build_algorithm, build_env, build_model)
from xingtian_tpu.runtime.workspace import Workspace, find_latest_workspace
from xingtian_tpu.runtime.metrics import StatsRecorder
from xingtian_tpu.runtime.checkpoint import (
    load_weights_npz, prune_old_checkpoints, restore_state,
    save_state, save_weights_npz)

__all__ = [
    "StatsRecorder", "Trainer", "Workspace", "build_algorithm", "build_env",
    "build_model", "find_latest_workspace", "load_weights_npz",
    "prune_old_checkpoints", "restore_state", "save_state",
    "save_weights_npz",
]
