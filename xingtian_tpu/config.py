"""YAML experiment configuration — schema-compatible with the reference.

The reference drives everything from one YAML with four module blocks
(``docs/user.en.md:57-116``): ``alg_para`` / ``env_para`` / ``agent_para``
/ ``model_para`` plus ``env_num``, ``benchmark``, ``node_config`` …  Its
loader also expands *list-valued* leaves under ``alg_config`` /
``agent_config`` / ``model_config`` / ``env_info`` into the cartesian
product of experiments (``zeus/common/util/get_xt_config.py:119-146``) —
the built-in grid search.  Both behaviours are reproduced here, minus the
global-constant mutation (``import_config`` writing into module globals,
``common.py:32-44``): configs stay typed, immutable dataclasses.

Keys that only made sense for the process zoo (``node_config`` SSH
credentials, ``remote_env``, ``speedup`` CPU pinning) are accepted and
recorded but have no effect: there are no remote processes to bootstrap —
multi-host is a ``jax.distributed`` launch of the same program.
"""

from __future__ import annotations

import dataclasses
import importlib
import importlib.util
import itertools
import os
import sys
from typing import Any, Dict, List, Optional

import yaml


@dataclasses.dataclass
class ExperimentConfig:
    """One fully-resolved experiment (one element of the grid product)."""

    alg_name: str
    alg_config: Dict[str, Any]
    env_name: str
    env_info: Dict[str, Any]
    agent_name: str
    agent_config: Dict[str, Any]
    agent_num: int
    model_name: str
    model_info: Dict[str, Any]       # state_dim/action_dim/input_dtype/model_config
    env_num: int
    benchmark: Dict[str, Any]
    use_pbt: bool = False
    pbt_config: Dict[str, Any] = dataclasses.field(default_factory=dict)
    raw: Dict[str, Any] = dataclasses.field(default_factory=dict)

    # -- derived ----------------------------------------------------------
    @property
    def vector_env_size(self) -> int:
        """Reference ``vector_env_size`` (``atari_impala_opt.py``): envs per
        explorer.  Total batched envs = env_num × vector_env_size."""
        return int(self.agent_config.get("vector_env_size", 1))

    @property
    def total_envs(self) -> int:
        return self.env_num * self.vector_env_size

    @property
    def rollout_steps(self) -> int:
        return int(self.agent_config.get("max_steps", 128))

    @property
    def complete_step(self) -> int:
        return int(self.agent_config.get("complete_step", 10_000_000))

    @property
    def complete_episode(self) -> int:
        return int(self.agent_config.get("complete_episode", 0))

    @property
    def benchmark_id(self) -> str:
        default = f"xt_{self.alg_name}".lower()
        return str(self.benchmark.get("id", default))

    @property
    def log_interval(self) -> int:
        return int(self.benchmark.get("log_interval_to_train", 20))

    def merged_alg_config(self) -> Dict[str, Any]:
        """Algorithm config = alg_config ∪ model_config ∪ agent knobs.

        The reference splits training hyperparameters between
        ``model_config`` (LR/BATCH_SIZE/... consumed by the TF model class)
        and ``alg_config``; our algorithms take one dict, so model_config
        keys are merged in (alg_config wins on conflict).
        """
        merged: Dict[str, Any] = {}
        merged.update(self.model_info.get("model_config", {}) or {})
        merged.update(self.alg_config or {})
        merged.setdefault("rollout_steps", self.rollout_steps)
        for k in ("sync_model_interval",):
            if k in (self.agent_config or {}):
                merged.setdefault(k, self.agent_config[k])
        return merged


def _expand_grid(block: Dict[str, Any]) -> List[Dict[str, Any]]:
    """Cartesian product over list-valued leaves (``get_xt_config.py:119-146``).

    Keys whose values are *meant* to be lists (layer sizes, shapes) are
    exempt, matching the reference's behaviour of only expanding
    hyper-search keys: a list counts as a grid axis only if it is a list
    of scalars AND the key is not in the structural allow-list.
    """
    structural = {
        "hidden_sizes", "state_dim", "action_dim", "filters", "fc_layers",
        "init_weights", "agent_ids",
    }
    axes = []
    base = {}
    for k, v in (block or {}).items():
        if (isinstance(v, list) and k not in structural
                and all(not isinstance(e, (list, dict)) for e in v)
                and len(v) > 0):
            axes.append((k, v))
        else:
            base[k] = v
    if not axes:
        return [dict(base)]
    out = []
    for combo in itertools.product(*(v for _, v in axes)):
        d = dict(base)
        d.update({k: val for (k, _), val in zip(axes, combo)})
        out.append(d)
    return out


def load_yaml(path: str) -> Dict[str, Any]:
    with open(path) as f:
        return yaml.safe_load(f)


def parse_config(raw: Dict[str, Any]) -> List[ExperimentConfig]:
    """Parse a reference-schema YAML dict into ≥1 resolved experiments."""
    alg_para = raw.get("alg_para", {})
    env_para = raw.get("env_para", {})
    agent_para = raw.get("agent_para", {})
    model_para = raw.get("model_para", {})
    actor = dict(model_para.get("actor", {}))

    alg_grid = _expand_grid(alg_para.get("alg_config", {}))
    agent_grid = _expand_grid(agent_para.get("agent_config", {}))
    model_grid = _expand_grid(actor.get("model_config", {}))

    configs = []
    for alg_cfg, agent_cfg, model_cfg in itertools.product(
            alg_grid, agent_grid, model_grid):
        model_info = dict(actor)
        model_info["model_config"] = model_cfg
        # archive the RESOLVED case, not the grid template: a workspace's
        # train_config.yaml must identify which grid point produced it
        # (the reference writes the expanded config per case too,
        # ``get_xt_config.py:119-146``)
        case_raw = dict(raw)
        if len(alg_grid) * len(agent_grid) * len(model_grid) > 1:
            case_raw["alg_para"] = {**alg_para, "alg_config": alg_cfg}
            case_raw["agent_para"] = {**agent_para, "agent_config": agent_cfg}
            case_raw["model_para"] = {**model_para, "actor": model_info}
        configs.append(ExperimentConfig(
            alg_name=alg_para.get("alg_name", "PPO"),
            alg_config=alg_cfg,
            env_name=env_para.get("env_name", "GymEnv"),
            env_info=dict(env_para.get("env_info", {})),
            agent_name=agent_para.get("agent_name", alg_para.get("alg_name", "PPO")),
            agent_config=agent_cfg,
            agent_num=int(agent_para.get("agent_num", 1)),
            model_name=model_info.get("model_name", "PpoMlp"),
            model_info=model_info,
            env_num=int(raw.get("env_num", 1)),
            benchmark=dict(raw.get("benchmark", {}) or {}),
            use_pbt=bool(raw.get("use_pbt", False)),
            pbt_config=dict(raw.get("pbt_config", {}) or {}),
            raw=case_raw,
        ))
    if len(configs) > 10:
        # the reference caps concurrent multi-case at 10 (train.py:196-229)
        pass
    return configs


def import_user_modules(mods, anchor_dir: Optional[str] = None) -> None:
    """Import user extension modules so their ``@Registers.*`` decorators run.

    Capability parity with the reference's CWD auto-import
    (``zeus/common/util/register.py:168-200``, which appends CWD to
    ``sys.path`` and imports every ``*.py`` under it) — made explicit:
    the YAML lists what to import under a top-level ``user_modules:`` key.
    Entries may be module names (resolved on ``sys.path``, with the config
    file's directory and CWD prepended) or ``.py`` file paths (absolute or
    relative to the config file).
    """
    if not mods:
        return
    if isinstance(mods, str):
        mods = [mods]
    search = [anchor_dir or os.getcwd(), os.getcwd()]
    for d in search:
        if d and d not in sys.path:
            sys.path.insert(0, d)
    for m in mods:
        if m.endswith(".py"):
            path = m if os.path.isabs(m) else os.path.join(
                anchor_dir or os.getcwd(), m)
            name = os.path.splitext(os.path.basename(path))[0]
            if name in sys.modules:
                continue
            spec = importlib.util.spec_from_file_location(name, path)
            if spec is None or spec.loader is None:
                raise ImportError(f"user_modules: cannot load {path!r}")
            mod = importlib.util.module_from_spec(spec)
            sys.modules[name] = mod
            spec.loader.exec_module(mod)
        else:
            importlib.import_module(m)


def load_config(path: str) -> List[ExperimentConfig]:
    raw = load_yaml(path)
    import_user_modules(raw.get("user_modules"),
                        anchor_dir=os.path.dirname(os.path.abspath(path)))
    return parse_config(raw)
