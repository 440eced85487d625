"""CLI entry — ``python -m xingtian_tpu.main -f cfg.yaml -t train``.

Parity with the reference's ``xt_main`` (``xt/main.py:46-106``): same
flags (``-f/--config_file``, ``-t/--task``, ``-v/--verbosity``; ``-s3``
accepted for compatibility, mapped to ``--archive_root``), same tasks
(train / evaluate / train_with_evaluate / benchmark), same multi-case
behaviour for grid configs (the reference spawns up to 10 subprocesses,
``train.py:196-229``; one accelerator per host here, so cases run
sequentially and each gets its own workspace).
"""

from __future__ import annotations

import argparse
import sys

from xingtian_tpu.config import load_config
from xingtian_tpu.runtime.trainer import Trainer


def main(argv=None) -> int:
    parser = argparse.ArgumentParser("xt_main", description=__doc__)
    parser.add_argument("-f", "--config_file", required=True)
    parser.add_argument(
        "-t", "--task", default="train",
        choices=["train", "evaluate", "train_with_evaluate", "benchmark"])
    parser.add_argument("-v", "--verbosity", default="info")
    parser.add_argument("-s3", "--save_to_s3", default=None,
                        help="compat flag; use --archive_root instead")
    parser.add_argument("--archive_root", default=None)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--max_updates", type=int, default=None,
                        help="stop after N updates (smoke/CI runs)")
    args = parser.parse_args(argv)

    configs = load_config(args.config_file)
    if len(configs) > 1:
        print(f"[xt] multi-case config: {len(configs)} experiments "
              f"(running sequentially)")

    for i, cfg in enumerate(configs):
        if len(configs) > 1:
            print(f"[xt] === case {i}: alg_config={cfg.alg_config} "
                  f"agent_config={cfg.agent_config} ===")
        if args.task == "benchmark":
            from xingtian_tpu.runtime.benchmark import (
                replay_records_to_tensorboard)
            out = replay_records_to_tensorboard(
                cfg.benchmark_id, archive_root=args.archive_root)
            print(f"[xt] benchmark replay → {out}")
        elif args.task in ("train", "train_with_evaluate"):
            if args.task == "train_with_evaluate" and not cfg.benchmark.get("eval"):
                cfg.benchmark["eval"] = {"gap": 100, "episodes_per_eval": 1}
            if cfg.use_pbt:
                from xingtian_tpu.runtime.pbt_runner import PBTTrainer
                trainer = PBTTrainer(cfg, seed=args.seed,
                                     archive_root=args.archive_root)
            elif cfg.env_name == "HostFarm":
                # async actor-learner over host (non-JAX) simulators
                from xingtian_tpu.runtime.farm_trainer import FarmTrainer
                trainer = FarmTrainer(cfg, seed=args.seed,
                                      archive_root=args.archive_root)
            else:
                trainer = Trainer(cfg, seed=args.seed,
                                  archive_root=args.archive_root)
            result = trainer.train(max_updates=args.max_updates)
            print(f"[xt] done: {result}")
        elif args.task == "evaluate":
            from xingtian_tpu.runtime.evaluate import evaluate_from_archive
            evaluate_from_archive(cfg, archive_root=args.archive_root)
    return 0


if __name__ == "__main__":
    sys.exit(main())
