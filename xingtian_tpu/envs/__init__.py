"""Environment package: pure-JAX envs + YAML-compatible factory shims.

The reference resolves ``env_para.env_name`` (e.g. ``GymEnv``/``AtariEnv``)
and passes ``env_info`` with the concrete game under ``name``
(reference ``xt/environment/__init__.py:15-23``, ``examples/*.yaml``).  We
keep those factory names working: ``GymEnv``/``AtariEnv`` look the concrete
game up in the same registry, so reference YAML configs load unchanged.
"""

from __future__ import annotations

from xingtian_tpu.registry import Registers
from xingtian_tpu.envs.core import (
    AutoReset,
    Box,
    Discrete,
    EnvSpec,
    JaxEnv,
    TimeStep,
    VecEnv,
    Wrapper,
)
from xingtian_tpu.envs import classic  # noqa: F401  (registers CartPole/Pendulum)
from xingtian_tpu.envs import arcade  # noqa: F401  (registers Breakout/Pong/...)
from xingtian_tpu.envs import host  # noqa: F401  (host env farm for non-JAX sims)
from xingtian_tpu.envs import multi_agent  # noqa: F401  (unified-API envs)
from xingtian_tpu.envs import recsys  # noqa: F401  (info-flow recommender)
from xingtian_tpu.envs import native_farm  # noqa: F401  (C++ host farm)
from xingtian_tpu.envs import minigrid  # noqa: F401  (partial-obs gridworlds)
from xingtian_tpu.envs import skirmish  # noqa: F401  (SMAC-analog micro-combat)
from xingtian_tpu.envs import ale  # noqa: F401  (real-ALE host adapter + fake core)
from xingtian_tpu.envs import smac_adapter  # noqa: F401  (real-SMAC adapter + stub)
from xingtian_tpu.envs import minigrid_tasks  # noqa: F401  (ant/dog/traffic analogs)
from xingtian_tpu.envs import mspacman  # noqa: F401  (MsPacman arcade analog)
from xingtian_tpu.envs import gym_adapter  # noqa: F401  (real gymnasium host env)
from xingtian_tpu.envs.async_farm import (  # noqa: F401
    AsyncTrajectoryFarm, ElasticThrottle)


def _strip_version(name: str) -> str:
    """'CartPole-v0' → try exact first, then bare name."""
    return name.split("-v")[0] if "-v" in name else name


def _resolve_game(name: str, **info):
    if name in Registers.env:
        return Registers.env.build(name, **info)
    bare = _strip_version(name)
    if bare in Registers.env:
        version = int(name.rsplit("-v", 1)[1]) if "-v" in name else 0
        return Registers.env.build(bare, version=version, **info)
    raise KeyError(
        f"no JAX environment registered for {name!r}; known: {Registers.env.names()}"
    )


@Registers.env.register(name="GymEnv")
def gym_env(name: str = "CartPole-v0", vision: bool = False, **info):
    """Reference ``GymEnv`` shim (``gym_env.py:35-83``)."""
    del vision
    return _resolve_game(name, **info)


@Registers.env.register(name="AtariEnv")
def atari_env(name: str = "BreakoutNoFrameskip-v4", vision: bool = False, **info):
    """Reference ``AtariEnv`` shim (``atari_env.py:33-103``).

    ALE is not importable in this image; ``BreakoutNoFrameskip-v4`` et al.
    resolve to the pure-JAX arcade family rendered at the reference's
    84×84×4 observation geometry (see ``xingtian_tpu/envs/arcade.py``).
    """
    del vision
    game = name.replace("NoFrameskip", "").replace("Deterministic", "")
    game = _strip_version(game)
    # AtariEnv contract is 84x84x4 uint8 frames (atari_env.py:58-80):
    # prefer the pixel-rendered variant when one is registered
    if f"{game}Pixel" in Registers.env:
        return Registers.env.build(f"{game}Pixel", **info)
    return _resolve_game(game, **info)


def make(name: str, **info) -> JaxEnv:
    """Top-level convenience builder."""
    return _resolve_game(name, **info)


__all__ = [
    "AutoReset", "Box", "Discrete", "EnvSpec", "JaxEnv", "TimeStep",
    "VecEnv", "Wrapper", "make", "gym_env", "atari_env",
]
