"""Real gymnasium simulators behind the host farm (GymEnv parity).

The reference's ``GymEnv`` wraps real OpenAI-gym simulators
(``xt/environment/gym/gym_env.py:30-79``: make/reset/step with
auto-reset handled by the agent loop).  On TPU the classic-control suite
has pure-JAX analogs (``envs/classic.py``) that run on device; this
adapter exists so the SAME host-farm deployment path that serves ALE and
StarCraft II also drives any real ``gymnasium`` env — proving the
device↔host architecture against a genuine third-party simulator rather
than a stub.

Supports every env installed with the local gymnasium build (classic
control, Box2D's LunarLander, …).  Discrete and continuous action spaces
are both surfaced; continuous actions are passed through as float
vectors (the behaviour policy emits them), discrete as ints.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from xingtian_tpu.envs.host import HostEnvProtocol
from xingtian_tpu.registry import Registers


@Registers.host_env.register(name="Gym", aliases=("GymHost", "gymnasium"))
class GymHost(HostEnvProtocol):
    """One real gymnasium instance under the farm's numpy protocol.

    Auto-reset: a ``done`` step returns the reset observation (the farm
    and the on-device ``AutoReset`` wrapper share this convention), with
    ``done = terminated or truncated`` — the reference folds both into
    its single ``done`` flag too (``gym_env.py:68-75``).
    """

    def __init__(self, id: str = "CartPole-v1", **make_kwargs):
        # ``id`` matches gym.make's keyword; ``env_info.name`` is taken
        # by the host_env registry key, so the YAML says ``id: ...``
        import gymnasium as gym
        self._env = gym.make(id, **make_kwargs)
        space = self._env.action_space
        if hasattr(space, "n"):                       # Discrete
            self.ACTION_DIM = int(space.n)
            self._discrete = True
        else:                                         # Box
            self.ACTION_DIM = int(np.prod(space.shape))
            self._discrete = False
            self._low = np.asarray(space.low, np.float32)
            self._high = np.asarray(space.high, np.float32)

    def reset(self, seed: int) -> np.ndarray:
        obs, _ = self._env.reset(seed=int(seed) & 0x7FFFFFFF)
        return np.asarray(obs, np.float32)

    def step(self, action) -> Tuple[np.ndarray, float, bool]:
        if self._discrete:
            act = int(np.asarray(action).reshape(()))
        else:
            act = np.clip(np.asarray(action, np.float32).reshape(
                self._env.action_space.shape), self._low, self._high)
        obs, reward, terminated, truncated, _ = self._env.step(act)
        done = bool(terminated or truncated)
        if done:
            obs, _ = self._env.reset()
        return np.asarray(obs, np.float32), float(reward), done

    def close(self):
        self._env.close()
