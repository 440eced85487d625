"""Functional environment API — the TPU-native replacement for the
reference's ``Environment`` base class (reference
``xt/environment/environment.py:25-117``).

The reference steps one Python env object per explorer process; here an
environment is a *pure function pair* over pytrees so that thousands of
instances vectorize with ``jax.vmap`` and the whole rollout compiles into a
single ``lax.scan`` on device.  The reference's ``get_env_info`` contract
(``environment.py:95-108``: ``{n_agents, api_type, action_type, agent_ids}``)
maps onto :class:`EnvSpec`.

API summary::

    env = CartPole()
    state, obs = env.reset(key)             # state: pytree, obs: Array
    state, ts  = env.step(state, action)    # ts: TimeStep(obs, reward, done, info)

Auto-reset semantics (matching the vectorized reference path
``xt/environment/gym/atari_env.py:106-164`` where each sub-env resets
in-place on done): ``step`` of :class:`VecEnv` returns the *reset* obs when
``done`` is True; bootstrapping code must therefore use ``done`` to cut the
return, never the post-done obs.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import struct

Array = jax.Array
PRNGKey = jax.Array


# ---------------------------------------------------------------------------
# Action / observation specs
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class Discrete:
    """Discrete action space of ``n`` choices (reference infers this as
    action_type="Categorical", ``xt/environment/gym/__init__.py``)."""

    n: int

    @property
    def action_type(self) -> str:
        return "Categorical"

    @property
    def shape(self) -> Tuple[int, ...]:
        return ()

    @property
    def dtype(self):
        return jnp.int32

    def sample(self, key: PRNGKey) -> Array:
        return jax.random.randint(key, (), 0, self.n)


@dataclasses.dataclass(frozen=True)
class Box:
    """Continuous action space (action_type="DiagGaussian")."""

    low: float
    high: float
    shape: Tuple[int, ...] = (1,)

    @property
    def action_type(self) -> str:
        return "DiagGaussian"

    @property
    def dtype(self):
        return jnp.float32

    def sample(self, key: PRNGKey) -> Array:
        return jax.random.uniform(key, self.shape, jnp.float32, self.low, self.high)


@dataclasses.dataclass(frozen=True)
class EnvSpec:
    """Static environment metadata (≈ reference ``get_env_info``)."""

    name: str
    obs_shape: Tuple[int, ...]
    obs_dtype: Any
    action_spec: Any                 # Discrete | Box
    max_steps: int                   # episode time limit (0 = unlimited)
    n_agents: int = 1
    api_type: str = "standalone"     # standalone | unified (environment.py:36-39)

    @property
    def action_type(self) -> str:
        return self.action_spec.action_type

    @property
    def action_dim(self) -> int:
        if isinstance(self.action_spec, Discrete):
            return self.action_spec.n
        return int(jnp.prod(jnp.asarray(self.action_spec.shape)))


# ---------------------------------------------------------------------------
# Step output
# ---------------------------------------------------------------------------

@struct.dataclass
class TimeStep:
    """One transition's worth of outputs.

    ``done`` is episode end (true termination OR time-limit, undistinguished —
    matching the reference which treats gym's TimeLimit done as done,
    ``xt/environment/gym/gym_env.py:63-77``).  ``info`` carries per-env
    diagnostics such as ``real_done`` for Atari life-loss envs
    (``atari_wrappers.py:84-101``).
    """

    obs: Array
    reward: Array
    done: Array
    info: Dict[str, Array] = struct.field(default_factory=dict)


class JaxEnv:
    """Base class for pure-JAX environments.

    Subclasses implement ``spec``, ``_reset(key) -> (state, obs)`` and
    ``_step(state, action) -> (state, TimeStep)``, all jittable.  The public
    ``reset``/``step`` simply forward; wrappers compose by overriding them.
    """

    spec: EnvSpec

    def reset(self, key: PRNGKey):
        return self._reset(key)

    def step(self, state, action):
        return self._step(state, action)

    def _reset(self, key: PRNGKey):
        raise NotImplementedError

    def _step(self, state, action):
        raise NotImplementedError

    # -- convenience -------------------------------------------------------
    def init_env(self, *_args, **_kwargs):  # parity shim (environment.py:52)
        return self

    def avail_actions(self, state):
        """Per-agent available-action mask ``[n_agents, n_actions]``.

        SMAC-style envs (``xt/environment/ma/env_starcraft.py``) override
        this; the default is "everything available", which unified algos
        (QMIX/SCC) rely on for envs without action masking."""
        del state
        return jnp.ones(
            (self.spec.n_agents, self.spec.action_spec.n), jnp.float32)


# ---------------------------------------------------------------------------
# Wrappers
# ---------------------------------------------------------------------------

class Wrapper(JaxEnv):
    def __init__(self, env: JaxEnv):
        self.env = env
        self.spec = env.spec

    def _reset(self, key):
        return self.env.reset(key)

    def _step(self, state, action):
        return self.env.step(state, action)


@struct.dataclass
class AutoResetState:
    inner: Any
    key: PRNGKey


class AutoReset(Wrapper):
    """On done, reset the env in the same step and return the fresh obs.

    Equivalent of the reference's per-sub-env auto-reset inside
    ``VectorAtariEnv.step`` (``atari_env.py:138-158``).  The pre-reset
    terminal observation is exposed in ``info['terminal_obs']`` so losses
    that bootstrap through truncation could use it.
    """

    def _reset(self, key):
        key, sub = jax.random.split(key)
        inner, obs = self.env.reset(sub)
        return AutoResetState(inner=inner, key=key), obs

    def _step(self, state: AutoResetState, action):
        inner, ts = self.env.step(state.inner, action)
        key, sub = jax.random.split(state.key)
        reset_inner, reset_obs = self.env.reset(sub)
        new_inner = jax.tree_util.tree_map(
            lambda r, c: jnp.where(_bshape(ts.done, r), r, c), reset_inner, inner
        )
        # obs may itself be a pytree (dict observations)
        new_obs = jax.tree_util.tree_map(
            lambda r, c: jnp.where(_bshape(ts.done, r), r, c), reset_obs, ts.obs)
        info = dict(ts.info)
        info["terminal_obs"] = ts.obs
        return (
            AutoResetState(inner=new_inner, key=key),
            ts.replace(obs=new_obs, info=info),
        )


def _bshape(done: Array, like: Array) -> Array:
    """Broadcast scalar/batched ``done`` against an arbitrary-rank leaf."""
    return jnp.reshape(done, done.shape + (1,) * (like.ndim - done.ndim))


class ActionRepeat(Wrapper):
    """Repeat each action ``k`` times, summing rewards (≈ the reference's
    atari 4× action-repeat wrapper, ``atari_wrappers.py:57-82``; the
    2-frame max-pool exists to defeat ALE sprite flicker and has no
    equivalent for flicker-free JAX envs)."""

    def __init__(self, env: JaxEnv, repeat: int = 4):
        super().__init__(env)
        self.repeat = int(repeat)

    def _step(self, state, action):
        def body(carry, _):
            state, total, done = carry
            state, ts = self.env.step(state, action)
            # freeze accumulation once the episode ended mid-repeat
            total = total + ts.reward * (1.0 - done.astype(ts.reward.dtype))
            done = done | ts.done
            return (state, total, done), ts

        (state, total, done), ts_seq = jax.lax.scan(
            body, (state, jnp.zeros((), jnp.float32), jnp.zeros((), bool)),
            None, length=self.repeat)
        last = jax.tree_util.tree_map(lambda x: x[-1], ts_seq)
        return state, last.replace(reward=total, done=done)


class RewardClip(Wrapper):
    """Clip rewards to ±bound (``clip_by_value`` in the reference's IMPALA
    graph, ``impala_cnn_opt.py:193``, exposed as an env wrapper too)."""

    def __init__(self, env: JaxEnv, bound: float = 1.0):
        super().__init__(env)
        self.bound = float(bound)

    def _step(self, state, action):
        state, ts = self.env.step(state, action)
        return state, ts.replace(
            obs=ts.obs, reward=jnp.clip(ts.reward, -self.bound, self.bound))


class RandomStarts(Wrapper):
    """Take 0..max_noops random actions after reset (≈ noop-reset,
    ``atari_wrappers.py:26-47``) so vectorized envs desynchronize."""

    def __init__(self, env: JaxEnv, max_noops: int = 30):
        super().__init__(env)
        self.max_noops = int(max_noops)

    def _reset(self, key):
        key, k_n, k_act = jax.random.split(key, 3)
        state, obs = self.env.reset(key)
        n = jax.random.randint(k_n, (), 0, self.max_noops + 1)

        def body(i, carry):
            state, obs = carry
            a = self.env.spec.action_spec.sample(jax.random.fold_in(k_act, i))
            new_state, ts = self.env.step(state, a)
            take = i < n
            state = jax.tree_util.tree_map(
                lambda new, old: jnp.where(
                    jnp.reshape(take, (1,) * new.ndim), new, old)
                if hasattr(new, "ndim") else new,
                new_state, state)
            obs = jnp.where(take, ts.obs, obs)
            return state, obs

        state, obs = jax.lax.fori_loop(0, self.max_noops, body, (state, obs))
        return state, obs


@struct.dataclass
class VecState:
    inner: Any


class VecEnv(Wrapper):
    """``n`` independent instances stepped in lockstep via ``vmap``.

    The TPU-native equivalent of both the reference's explorer fan-out
    (``env_num`` processes, ``xt/framework/broker.py:478-505``) and its
    ``VectorAtariEnv`` (``atari_env.py:106-164``) — here both collapse into
    one batched pytree living in device memory.
    """

    def __init__(self, env: JaxEnv, n: int, auto_reset: bool = True):
        if auto_reset:
            env = AutoReset(env)
        super().__init__(env)
        self.n = n
        self._vreset = jax.vmap(env.reset)
        self._vstep = jax.vmap(env.step)

    def _reset(self, key):
        keys = jax.random.split(key, self.n)
        inner, obs = self._vreset(keys)
        return VecState(inner=inner), obs

    def _step(self, state: VecState, action):
        inner, ts = self._vstep(state.inner, action)
        return VecState(inner=inner), ts
