"""Standalone evaluation — ``xt_main -t evaluate`` flow.

Parity with the reference (``xt/evaluate.py:56-169`` +
``EvalResultSummary``, ``evaluate_adapter.py:194-293``): glob
``actor_*.npz`` checkpoints from a model path (every ``gap``-th), run
``episodes_per_eval`` greedy episodes per checkpoint, write
``eval_result_<ts>.csv`` with per-model mean rewards.  No evaluator
process pool: each evaluation is one jitted rollout on the accelerator.
"""

from __future__ import annotations

import csv
import glob
import os
import re
import time
from typing import List, Optional

import jax

from xingtian_tpu.config import ExperimentConfig
from xingtian_tpu.runtime.checkpoint import load_weights_npz
from xingtian_tpu.runtime.trainer import Trainer
from xingtian_tpu.runtime.workspace import find_latest_workspace


def select_models(model_dir: str, gap: int = 1) -> List[str]:
    """Every ``gap``-th checkpoint, sorted by index (``evaluate.py:77-95``)."""
    files = glob.glob(os.path.join(model_dir, "actor_*.npz"))
    def idx(p):
        m = re.search(r"actor_(\d+)", os.path.basename(p))
        return int(m.group(1)) if m else -1
    files = sorted(files, key=idx)
    return files[::max(1, gap)]


def evaluate_from_archive(cfg: ExperimentConfig,
                          model_path: Optional[str] = None,
                          archive_root: Optional[str] = None,
                          out_dir: Optional[str] = None) -> List[dict]:
    bc = cfg.benchmark.get("eval", {}) or {}
    gap = int(bc.get("gap", 1))
    episodes = int(bc.get("episodes_per_eval", 1))

    if model_path is None:
        model_path = bc.get("model_path")
    if model_path is None:
        ws = find_latest_workspace(cfg.benchmark_id, task="train",
                                   archive_root=archive_root)
        if ws is None:
            raise FileNotFoundError(
                f"no workspace found for benchmark id {cfg.benchmark_id!r}")
        model_path = os.path.join(ws, "models")

    models = select_models(model_path, gap)
    if not models:
        raise FileNotFoundError(f"no actor_*.npz checkpoints in {model_path}")

    if cfg.env_name == "HostFarm":
        # farm-trained checkpoints: greedy episodes on the HOST simulator
        # (the reference's Evaluator process drives the same env class the
        # explorers used, ``evaluator.py:46-83``)
        rows = _evaluate_hostfarm(cfg, models, episodes)
    else:
        # a Trainer gives us env/model/alg + the jitted greedy eval fn
        trainer = Trainer(cfg, with_workspace=False)

        rows = []
        for path in models:
            trainer.state = trainer.state.replace(
                params=load_weights_npz(trainer.state.params, path))
            reward = trainer.evaluate(episodes)
            rows.append({"model": os.path.basename(path),
                         "eval_reward": round(reward, 3),
                         "episodes": episodes})
            print(f"[xt-eval] {os.path.basename(path)}: {reward:.2f}")

    out_dir = out_dir or os.path.dirname(model_path)
    return _write_summary(rows, out_dir)


def _write_summary(rows: List[dict], out_dir: str) -> List[dict]:
    out = os.path.join(out_dir, f"eval_result_{time.strftime('%y%m%d%H%M%S')}.csv")
    with open(out, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["model", "eval_reward", "episodes"])
        w.writeheader()
        w.writerows(rows)
    print(f"[xt-eval] summary → {out}")
    return rows


def _evaluate_hostfarm(cfg: ExperimentConfig, models: List[str],
                       episodes: int, max_episode_steps: int = 20000
                       ) -> List[dict]:
    """Greedy host-simulator evaluation for farm-trained checkpoints.

    Builds ONE host env + the model from the config (the same probe the
    FarmTrainer does), loads each checkpoint, and rolls ``episodes``
    greedy episodes per model on the host — device work is just the
    jitted apply per step.
    """
    import numpy as np
    import jax.numpy as jnp

    from xingtian_tpu.registry import Registers

    env_info = dict(cfg.env_info)
    env_name = env_info.pop("name")
    env_info.pop("slim_frames", None)
    env_cls = Registers.host_env.get(env_name)
    batched = bool(getattr(env_cls, "BATCHED", False))
    if batched:
        # a native pool evaluates as a 1-env instance behind the same
        # single-env surface (reset/step below adapt the batch calls)
        env_info.pop("n", None)
        env = env_cls(n=1, **env_info)
    else:
        env = env_cls(**env_info) if env_info else env_cls()

    def env_reset(seed: int):
        if batched:
            return np.asarray(env.reset_batch(seed))[0]
        return np.asarray(env.reset(seed))

    def env_step(a):
        if batched:
            o, r, d = env.step_batch(np.asarray([a], np.int32))
            return np.asarray(o)[0], float(r[0]), bool(d[0])
        return env.step(a)

    try:
        obs0 = env_reset(0)
        action_dim = int(cfg.model_info.get(
            "action_dim", getattr(env, "ACTION_DIM", 0)))
        info = dict(cfg.model_info)
        info.setdefault("state_dim", list(obs0.shape))
        info["action_dim"] = action_dim
        info.setdefault("input_dtype", str(obs0.dtype))
        info.pop("model_name", None)
        model = Registers.model.build(cfg.model_name, **info)
        apply = jax.jit(model.apply)
        is_q = getattr(model, "kind", None) == "q"

        def greedy(params, obs):
            out = apply(params, jnp.asarray(obs[None]))
            logits = out if is_q else out[0]
            return int(np.argmax(np.asarray(logits), axis=-1)[0])

        init_params = model.init_params(jax.random.PRNGKey(0))
        rows = []
        for path in models:
            params = load_weights_npz(init_params, path)
            returns = []
            for e in range(episodes):
                obs = env_reset(e)
                ret = 0.0
                for _ in range(max_episode_steps):
                    obs, r, done = env_step(greedy(params, obs))
                    obs = np.asarray(obs)
                    ret += float(r)
                    if done:
                        break
                returns.append(ret)
            reward = float(np.mean(returns))
            rows.append({"model": os.path.basename(path),
                         "eval_reward": round(reward, 3),
                         "episodes": episodes})
            print(f"[xt-eval] {os.path.basename(path)}: {reward:.2f}")
        return rows
    finally:
        close = getattr(env, "close", None)
        if callable(close):
            close()
