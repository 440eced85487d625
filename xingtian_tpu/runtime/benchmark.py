"""``-t benchmark``: replay archived training records into TensorBoard.

Parity with the reference's benchmark task (``xt/benchmarking.py:40-100``
+ ``zeus/visual/visual_rewards.py``): read the ``records.csv`` /
``train_records.json`` of archived runs for a benchmark id and re-emit
them as TensorBoard scalars in a fresh log dir, so finished runs can be
compared visually without the original event files.
"""

from __future__ import annotations

import csv
import os
import time
from typing import List, Optional


def list_archives(benchmark_id: str, archive_root: Optional[str] = None) -> List[str]:
    root = archive_root or os.path.join(os.path.expanduser("~"), "xt_archive")
    if not os.path.isdir(root):
        return []
    return sorted(
        os.path.join(root, d) for d in os.listdir(root)
        if d.startswith(benchmark_id + "+"))


def replay_records_to_tensorboard(
        benchmark_id: str, archive_root: Optional[str] = None,
        out_dir: Optional[str] = None) -> str:
    archives = list_archives(benchmark_id, archive_root)
    if not archives:
        raise FileNotFoundError(
            f"no archived runs for benchmark id {benchmark_id!r}")
    root = archive_root or os.path.join(os.path.expanduser("~"), "xt_archive")
    out_dir = out_dir or os.path.join(
        root, f"{benchmark_id}+{time.strftime('%y%m%d%H%M%S')}Tbenchmark")
    os.makedirs(out_dir, exist_ok=True)

    from torch.utils.tensorboard import SummaryWriter
    for arch in archives:
        records = os.path.join(arch, "benchmark", "records.csv")
        if not os.path.exists(records):
            continue
        run_name = os.path.basename(arch)
        writer = SummaryWriter(log_dir=os.path.join(out_dir, run_name))
        with open(records) as f:
            for row in csv.DictReader(f):
                step = int(float(row.get("train_count", 0)))
                for k, v in row.items():
                    if k in ("train_count", "wall_time"):
                        continue
                    try:
                        writer.add_scalar(f"benchmark/{k}", float(v), step)
                    except (TypeError, ValueError):
                        pass
        writer.flush()
        writer.close()
    return out_dir
