"""Stats recording — console table + CSV + tensorboard.

Capability parity with the reference's ``StatsRecorder`` thread
(``zeus/common/util/logger.py:229-427``): merges learner metrics, prints a
periodic table every ``log_interval`` train steps, writes tensorboard
scalars grouped under ``learner/``/``explorer/``, and feeds the workspace
records.csv.  No thread needed: the trainer calls ``record`` inline (the
whole train step is one device call, there is nothing to overlap with).

Per-stage timing parity (``profile_stats.py:33-276``): the trainer wraps
device-call wall time → ``train_ms``, ``step_per_second``
(``logger.py:161-162``'s metric name is kept).
"""

from __future__ import annotations

import sys
import time
from typing import Any, Dict, Optional


class StatsRecorder:
    def __init__(self, workspace=None, log_interval: int = 20,
                 tensorboard: bool = True, file=None):
        self.workspace = workspace
        self.log_interval = max(1, int(log_interval))
        self.file = file or sys.stdout
        self._tb = None
        if tensorboard and workspace is not None:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(log_dir=workspace.dir)
            except Exception:
                self._tb = None
        self._start = time.time()
        self._last_log_time = self._start
        self._last_log_steps = 0
        self._n_records = 0

    def record(self, update_step: int, env_steps: int,
               metrics: Dict[str, Any],
               force: bool = False) -> Optional[Dict[str, Any]]:
        """Record one train step's metrics; returns the row when logged.

        ``force=True`` logs regardless of the interval and without
        advancing the throughput counters (out-of-band rows: async eval
        results arriving at their own cadence).
        """
        self._n_records += 1
        if not force and update_step % self.log_interval != 0:
            return None
        now = time.time()
        dt = max(now - self._last_log_time, 1e-9)
        sps = (env_steps - self._last_log_steps) / dt
        if not force:
            self._last_log_time = now
            self._last_log_steps = env_steps

        row = {
            "wall_time": round(now - self._start, 2),
            "train_count": int(update_step),
            "env_steps": int(env_steps),
        }
        if not force:
            row["step_per_second"] = round(sps, 1)
        for k, v in metrics.items():
            try:
                row[k] = round(float(v), 5)
            except (TypeError, ValueError):
                pass

        if self.workspace is not None:
            self.workspace.append_record(row)
        if self._tb is not None:
            for k, v in row.items():
                if k in ("wall_time", "train_count"):
                    continue
                self._tb.add_scalar(f"learner/{k}", v, int(update_step))
        self._print_row(row)
        return row

    def _print_row(self, row: Dict[str, Any]) -> None:
        keys = ["train_count", "env_steps", "step_per_second",
                "episode_reward_mean", "loss"]
        parts = [f"{k}={row[k]}" for k in keys if k in row]
        extra = [k for k in ("entropy", "epsilon", "approx_kl") if k in row]
        parts += [f"{k}={row[k]}" for k in extra]
        print("[xt] " + "  ".join(parts), file=self.file, flush=True)

    def close(self) -> None:
        if self._tb is not None:
            self._tb.flush()
            self._tb.close()
        if self.workspace is not None:
            self.workspace.dump_history()
