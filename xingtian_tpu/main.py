"""CLI entry — ``python -m xingtian_tpu.main -f cfg.yaml -t train``.

Parity with the reference's ``xt_main`` (``xt/main.py:46-106``): same
flags (``-f/--config_file``, ``-t/--task``, ``-v/--verbosity``; ``-s3``
uploads the finished archive via ``runtime/cloud.py`` — the
hw_cloud_helper moxing-sync analog), same tasks
(train / evaluate / train_with_evaluate / benchmark), same multi-case
behaviour for grid configs (the reference spawns up to 10 subprocesses,
``train.py:196-229``): ``--workers N`` runs up to N cases concurrently
as subprocesses (capped at 10 like the reference; default sequential —
the right choice when all cases share one accelerator).
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import tempfile

import yaml

# NOTE: framework imports are deferred into main() — importing the env
# registry materializes jnp constants, which initializes the default
# accelerator backend before a ``--platform`` override could apply (and
# the axon plugin ignores the JAX_PLATFORMS env var).


def _case_to_raw(cfg, anchor_dir: str) -> dict:
    """Serialize one *resolved* grid case back to a single-case raw yaml.

    ``user_modules`` file entries are re-anchored to absolute paths: the
    case yaml lands in a temp dir, so paths relative to the ORIGINAL
    config file would no longer resolve.
    """
    raw = dict(cfg.raw)
    mods = raw.get("user_modules")
    if mods:
        if isinstance(mods, str):
            mods = [mods]
        raw["user_modules"] = [
            m if (not m.endswith(".py") or os.path.isabs(m))
            else os.path.abspath(os.path.join(anchor_dir, m))
            for m in mods
        ]
    raw["alg_para"] = {"alg_name": cfg.alg_name,
                       "alg_config": dict(cfg.alg_config)}
    raw["env_para"] = {"env_name": cfg.env_name,
                       "env_info": dict(cfg.env_info)}
    raw["agent_para"] = {"agent_name": cfg.agent_name,
                         "agent_num": cfg.agent_num,
                         "agent_config": dict(cfg.agent_config)}
    actor = dict(cfg.model_info)
    actor["model_name"] = cfg.model_name
    raw["model_para"] = {"actor": actor}
    raw["env_num"] = cfg.env_num
    return raw


def _run_cases_concurrently(configs, args, workers: int) -> int:
    """Reference multi-case mode (``train.py:196-229``): one subprocess
    per case, ≤``workers`` in flight, each with its own workspace."""
    workers = min(workers, 10, len(configs))   # reference caps at 10
    tmp = tempfile.mkdtemp(prefix="xt_cases_")
    anchor = os.path.dirname(os.path.abspath(args.config_file))
    procs, rc = [], 0
    pending = list(enumerate(configs))

    def launch(i, cfg):
        path = os.path.join(tmp, f"case_{i}.yaml")
        with open(path, "w") as f:
            yaml.safe_dump(_case_to_raw(cfg, anchor), f, sort_keys=False)
        sub = [sys.executable, "-m", "xingtian_tpu.main", "-f", path,
               "-t", args.task, "--seed", str(args.seed + i)]
        if args.archive_root:
            sub += ["--archive_root", args.archive_root]
        if args.save_to_s3:
            sub += ["--save_to_s3", args.save_to_s3]
        if args.max_updates is not None:
            sub += ["--max_updates", str(args.max_updates)]
        if args.platform:
            sub += ["--platform", args.platform]
        print(f"[xt] case {i}: launching {cfg.alg_config}")
        return subprocess.Popen(sub)

    try:
        while pending or procs:
            while pending and len(procs) < workers:
                i, cfg = pending.pop(0)
                procs.append((i, launch(i, cfg)))
            i, p = procs.pop(0)
            p.wait()
            rc = rc or p.returncode
            print(f"[xt] case {i}: exit {p.returncode}")
    finally:
        for i, p in procs:         # don't orphan cases on interrupt
            p.terminate()
        import shutil
        shutil.rmtree(tmp, ignore_errors=True)
    return rc


def main(argv=None) -> int:
    parser = argparse.ArgumentParser("xt_main", description=__doc__)
    parser.add_argument("-f", "--config_file", required=True)
    parser.add_argument(
        "-t", "--task", default="train",
        choices=["train", "evaluate", "train_with_evaluate", "benchmark"])
    parser.add_argument("-v", "--verbosity", default="info")
    parser.add_argument("-s3", "--save_to_s3", default=None,
                        help="sync the finished workspace archive to this "
                             "URL (file://, s3://, obs://, gs://; object "
                             "stores need their client installed)")
    parser.add_argument("--archive_root", default=None)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--max_updates", type=int, default=None,
                        help="stop after N updates (smoke/CI runs)")
    parser.add_argument("--workers", type=int, default=1,
                        help="concurrent multi-case subprocesses (≤10)")
    parser.add_argument("--platform", default=None,
                        help="force a JAX backend (e.g. cpu) — the "
                             "JAX_PLATFORMS env var is overridden by some "
                             "accelerator plugins, this flag is not")
    args = parser.parse_args(argv)

    if args.platform:
        # children (and a fresh interpreter) honor this at package import;
        # in THIS process it only helps if no array has been materialized
        # yet (xt_main under ``python -m`` imports the package first — set
        # XT_PLATFORM in the environment for a guaranteed override)
        os.environ["XT_PLATFORM"] = args.platform
        import jax
        try:
            jax.config.update("jax_platforms", args.platform)
        except Exception:
            pass

    from xingtian_tpu.config import load_config
    from xingtian_tpu.runtime.trainer import Trainer

    configs = load_config(args.config_file)
    if len(configs) > 1:
        mode = (f"{min(args.workers, 10)} concurrent subprocesses"
                if args.workers > 1 else "running sequentially")
        print(f"[xt] multi-case config: {len(configs)} experiments ({mode})")
        if args.workers > 1 and args.task in ("train", "train_with_evaluate"):
            return _run_cases_concurrently(configs, args, args.workers)

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
                # async actor-learner over host (non-JAX) simulators;
                # the unified multi-agent family trains from whole host
                # episodes (real-SMAC path) instead of segment streams
                if cfg.alg_name in ("QMIX", "SCC"):
                    from xingtian_tpu.runtime.farm_trainer import (
                        EpisodicFarmTrainer)
                    trainer = EpisodicFarmTrainer(
                        cfg, seed=args.seed, archive_root=args.archive_root)
                else:
                    from xingtian_tpu.runtime.farm_trainer import FarmTrainer
                    trainer = FarmTrainer(cfg, seed=args.seed,
                                          archive_root=args.archive_root)
            else:
                trainer = Trainer(cfg, seed=args.seed,
                                  archive_root=args.archive_root)
            result = trainer.train(max_updates=args.max_updates)
            print(f"[xt] done: {result}")
            ws = getattr(trainer, "workspace", None)
            if args.save_to_s3 and ws is not None:
                # hw_cloud_helper parity: upload the finished archive
                # (reference syncs the workspace via moxing after train)
                from xingtian_tpu.runtime.cloud import sync_out
                dest = os.path.join(
                    args.save_to_s3, os.path.basename(ws.dir))
                sync_out(ws.dir, dest)
                print(f"[xt] archive synced → {dest}")
        elif args.task == "evaluate":
            from xingtian_tpu.runtime.evaluate import evaluate_from_archive
            evaluate_from_archive(cfg, archive_root=args.archive_root)
    return 0


if __name__ == "__main__":
    sys.exit(main())
