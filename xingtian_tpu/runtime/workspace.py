"""Run workspace & archive layout.

Parity with the reference's benchmark archive
(``docs/user.en.md:124-138``, ``zeus/common/util/evaluate_xt.py:76-130``,
``local_data.py:52-137``)::

    <archive_root>/<benchmark_id>+<timestamp>T<task>/
        benchmark/
            records.csv            # per-log-interval training records
            train_config.yaml      # the resolved experiment config
        models/                    # weight checkpoints (npz / orbax)
        train_records.json         # full metric history, dumped on close
        events.out.tfevents.*      # tensorboard scalars

Default archive root: ``~/xt_archive`` (same as the reference).
"""

from __future__ import annotations

import csv
import json
import os
import time
from typing import Any, Dict, Optional

import yaml


class Workspace:
    def __init__(self, benchmark_id: str, task: str = "train",
                 archive_root: Optional[str] = None):
        root = archive_root or os.path.join(
            os.path.expanduser("~"), "xt_archive")
        stamp = time.strftime("%y%m%d%H%M%S")
        # concurrent cases (xt_main --workers) can start within one second:
        # claim a unique directory, suffixing the stamp on collision
        for attempt in range(1000):
            suffix = "" if attempt == 0 else f"_{attempt}"
            self.dir = os.path.join(
                root, f"{benchmark_id}+{stamp}{suffix}T{task}")
            try:
                os.makedirs(self.dir, exist_ok=False)
                break
            except FileExistsError:
                continue
        self.bench_dir = os.path.join(self.dir, "benchmark")
        self.model_dir = os.path.join(self.dir, "models")
        os.makedirs(self.bench_dir, exist_ok=True)
        os.makedirs(self.model_dir, exist_ok=True)
        self._records_path = os.path.join(self.bench_dir, "records.csv")
        self._csv_fields: Optional[list] = None
        self._csv_rows: list = []
        self._history: Dict[str, list] = {}

    # -- config snapshot ---------------------------------------------------
    def save_config(self, raw_config: Dict[str, Any]) -> None:
        with open(os.path.join(self.bench_dir, "train_config.yaml"), "w") as f:
            yaml.safe_dump(raw_config, f, sort_keys=False)

    # -- records -----------------------------------------------------------
    def append_record(self, record: Dict[str, Any]) -> None:
        self._csv_rows.append(dict(record))
        new_keys = [k for k in record if
                    self._csv_fields is None or k not in self._csv_fields]
        if new_keys and self._csv_fields is not None:
            # schema widened (e.g. eval_reward rows arriving after the
            # first train row): rewrite with the union of fields so no
            # column is silently dropped
            self._csv_fields += new_keys
            with open(self._records_path, "w", newline="") as f:
                w = csv.DictWriter(f, fieldnames=self._csv_fields)
                w.writeheader()
                w.writerows(self._csv_rows)
        else:
            if self._csv_fields is None:
                self._csv_fields = list(record)
                with open(self._records_path, "w", newline="") as f:
                    csv.DictWriter(
                        f, fieldnames=self._csv_fields).writeheader()
            with open(self._records_path, "a", newline="") as f:
                csv.DictWriter(
                    f, fieldnames=self._csv_fields, extrasaction="ignore"
                ).writerow(record)
        for k, v in record.items():
            self._history.setdefault(k, []).append(v)

    def dump_history(self) -> None:
        """≈ reference Logger json dump on exit (``logger.py:191-195``)."""
        with open(os.path.join(self.dir, "train_records.json"), "w") as f:
            json.dump(self._history, f)

    # -- models ------------------------------------------------------------
    def model_path(self, name: str) -> str:
        return os.path.join(self.model_dir, name)

    def list_models(self):
        return sorted(
            os.path.join(self.model_dir, p) for p in os.listdir(self.model_dir))


def find_latest_workspace(benchmark_id: str, task: str = "train",
                          archive_root: Optional[str] = None) -> Optional[str]:
    root = archive_root or os.path.join(os.path.expanduser("~"), "xt_archive")
    if not os.path.isdir(root):
        return None
    cands = [d for d in os.listdir(root)
             if d.startswith(benchmark_id + "+") and d.endswith("T" + task)]
    if not cands:
        return None
    return os.path.join(root, sorted(cands)[-1])
