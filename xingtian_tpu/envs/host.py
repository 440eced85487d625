"""Host environment farm — run non-JAX simulators behind the device boundary.

Capability parity with the reference's explorer processes driving native
sims (ALE/StarCraft II — ``xt/framework/explorer.py``,
``xt/environment/ma/env_starcraft.py``): simulators that cannot be
expressed in JAX run in the host process (optionally a pool of worker
threads/processes), and are surfaced to the jitted actor–learner program
through ``jax.pure_callback`` / ``io_callback`` with *batched* step calls —
one device↔host round trip per vectorized step, not per env instance.

In steady state the on-device arcade/classic envs are the fast path; this
module exists so external sims keep working (the reference's "Environment"
block is user-extensible, ``docs/user.en.md``).
"""

from __future__ import annotations

import concurrent.futures as _fut
from typing import Any, Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from xingtian_tpu.registry import Registers
from xingtian_tpu.envs.core import Discrete, EnvSpec, JaxEnv, TimeStep


class HostEnvProtocol:
    """Duck-typed host env: numpy in/out, auto-reset on done.

    ``reset(seed) -> obs``; ``step(action) -> (obs, reward, done)`` where a
    done step must already return the *reset* observation (matching
    on-device :class:`~xingtian_tpu.envs.core.AutoReset` semantics).
    """

    def reset(self, seed: int) -> np.ndarray:
        raise NotImplementedError

    def step(self, action) -> Tuple[np.ndarray, float, bool]:
        raise NotImplementedError


@struct.dataclass
class HostVecState:
    tick: jax.Array  # monotonically-increasing token ordering the callbacks


class HostVecEnv(JaxEnv):
    """A batch of host envs exposed as one jittable vector env.

    The worker pool steps instances concurrently (the reference pins one
    explorer process per core, ``broker.py:496-505``; here a thread pool
    suffices because sims release the GIL or are cheap).  State on device is
    just an ordering token: the actual sim state lives host-side, which is
    exactly the reference's situation with its Python env objects.
    """

    def __init__(self, env_fns: Sequence[Callable[[], HostEnvProtocol]],
                 spec: EnvSpec, num_threads: int = 8, seed: int = 0):
        self.spec = spec
        self._envs = [fn() for fn in env_fns]
        self.n = len(self._envs)
        self._pool = _fut.ThreadPoolExecutor(max_workers=num_threads)
        self._seed = seed
        self._obs_sds = jax.ShapeDtypeStruct(
            (self.n, *spec.obs_shape), spec.obs_dtype)

    # -- host-side batched ops --------------------------------------------
    def _host_reset(self, tick) -> np.ndarray:
        del tick
        obs = list(self._pool.map(
            lambda ie: ie[1].reset(self._seed + ie[0]), enumerate(self._envs)))
        return np.stack(obs).astype(self.spec.obs_dtype)

    def _host_step(self, tick, actions) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        del tick
        outs = list(self._pool.map(
            lambda ea: ea[0].step(np.asarray(ea[1])), zip(self._envs, actions)))
        obs = np.stack([o[0] for o in outs]).astype(self.spec.obs_dtype)
        rew = np.asarray([o[1] for o in outs], np.float32)
        done = np.asarray([o[2] for o in outs], bool)
        return obs, rew, done

    # -- jittable surface --------------------------------------------------
    def _reset(self, key):
        del key
        tick = jnp.zeros((), jnp.int32)
        obs = jax.experimental.io_callback(
            self._host_reset, self._obs_sds, tick, ordered=True)
        return HostVecState(tick=tick + 1), obs

    def _step(self, state: HostVecState, action):
        out_sds = (
            self._obs_sds,
            jax.ShapeDtypeStruct((self.n,), jnp.float32),
            jax.ShapeDtypeStruct((self.n,), bool),
        )
        obs, rew, done = jax.experimental.io_callback(
            self._host_step, out_sds, state.tick, action, ordered=True)
        return HostVecState(tick=state.tick + 1), TimeStep(
            obs=obs, reward=rew, done=done, info={})

    def close(self):
        self._pool.shutdown(wait=False)


# ---------------------------------------------------------------------------
# A tiny host-side reference env (numpy CartPole) used by tests to prove the
# farm works without gym in the image.
# ---------------------------------------------------------------------------

@Registers.host_env.register(name="NumpyCartPole")
class NumpyCartPole(HostEnvProtocol):
    """Numpy CartPole-v0 with internal auto-reset (test fixture for the farm)."""

    ACTION_DIM = 2  # host protocol classes declare this for model probing

    def __init__(self):
        self._rng = np.random.RandomState(0)
        self._s = None
        self._t = 0

    def reset(self, seed: int) -> np.ndarray:
        self._rng = np.random.RandomState(seed)
        self._s = self._rng.uniform(-0.05, 0.05, size=4).astype(np.float32)
        self._t = 0
        return self._s.copy()

    def step(self, action):
        x, x_dot, th, th_dot = self._s
        force = 10.0 if int(action) == 1 else -10.0
        cos_t, sin_t = np.cos(th), np.sin(th)
        temp = (force + 0.05 * th_dot ** 2 * sin_t) / 1.1
        th_acc = (9.8 * sin_t - cos_t * temp) / (0.5 * (4.0 / 3.0 - 0.1 * cos_t ** 2 / 1.1))
        x_acc = temp - 0.05 * th_acc * cos_t / 1.1
        self._s = np.asarray(
            [x + 0.02 * x_dot, x_dot + 0.02 * x_acc,
             th + 0.02 * th_dot, th_dot + 0.02 * th_acc], np.float32)
        self._t += 1
        done = bool(abs(self._s[0]) > 2.4 or abs(self._s[2]) > 0.2094
                    or self._t >= 200)
        obs = self._s.copy()
        if done:
            obs = self.reset(self._rng.randint(0, 2 ** 31 - 1))
        return obs, 1.0, done


@Registers.env.register(name="HostCartPole")
def host_cartpole(env_num: int = 4, num_threads: int = 4, seed: int = 0, **_kw):
    spec = EnvSpec(
        name="HostCartPole",
        obs_shape=(4,),
        obs_dtype=jnp.float32,
        action_spec=Discrete(2),
        max_steps=200,
    )
    return HostVecEnv(
        [NumpyCartPole for _ in range(env_num)], spec,
        num_threads=num_threads, seed=seed)
