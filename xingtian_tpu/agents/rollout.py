"""On-device rollout — the TPU-native Agent interaction loop.

The reference's ``Agent.run_one_episode`` / ``do_one_interaction``
(``xt/agent/agent.py:100-155``) is a Python loop: sess.run inference →
env.step → trajectory append, one process per explorer.  Here the whole
interaction is a ``lax.scan`` over a batched env pytree: policy apply and
env dynamics fuse into one XLA program, and the "trajectory" is the scan's
stacked output living in HBM — there is nothing to serialize or ship
(replaces the explorer→broker→learner plasma/zmq data plane,
``xt/framework/explorer.py:116-126``).

Episode-return accounting runs on device too (≈ ``AgentGroupStats``,
``zeus/common/util/profile_stats.py:127-229``): per-env running return +
completed-episode aggregates come back as part of the scan carry.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import struct

Array = jax.Array


@struct.dataclass
class Trajectory:
    """Time-major ``[T, B, ...]`` stacked transitions.

    ``obs`` is the observation the action was computed from; ``done`` marks
    episode end at that step; ``last_obs`` is the observation after the
    final step (bootstrap input).  ``extras`` carries per-algorithm policy
    outputs (logp/value/behaviour logits …).
    """

    obs: Array
    action: Array
    reward: Array
    done: Array
    last_obs: Array
    extras: Dict[str, Array]


@struct.dataclass
class EpisodeStats:
    """Device-side episode bookkeeping across rollout boundaries."""

    running_return: Array   # [B] return of the in-flight episode per env
    running_len: Array      # [B]
    completed_return: Array  # [] sum of returns of episodes completed this rollout
    completed_len: Array     # []
    completed_count: Array   # []

    @classmethod
    def init(cls, n_envs: int) -> "EpisodeStats":
        z = jnp.zeros((), jnp.float32)
        return cls(
            running_return=jnp.zeros((n_envs,), jnp.float32),
            running_len=jnp.zeros((n_envs,), jnp.float32),
            completed_return=z, completed_len=z, completed_count=z,
        )

    def fresh_window(self) -> "EpisodeStats":
        """Zero the completed-episode aggregates, keep in-flight returns."""
        z = jnp.zeros((), jnp.float32)
        return self.replace(completed_return=z, completed_len=z, completed_count=z)

    def update(self, reward: Array, done: Array) -> "EpisodeStats":
        run_ret = self.running_return + reward
        run_len = self.running_len + 1.0
        d = done.astype(jnp.float32)
        return EpisodeStats(
            running_return=run_ret * (1.0 - d),
            running_len=run_len * (1.0 - d),
            completed_return=self.completed_return + jnp.sum(run_ret * d),
            completed_len=self.completed_len + jnp.sum(run_len * d),
            completed_count=self.completed_count + jnp.sum(d),
        )

    def summary(self) -> Dict[str, Array]:
        denom = jnp.maximum(self.completed_count, 1.0)
        return {
            "episode_reward_mean": self.completed_return / denom,
            "episode_len_mean": self.completed_len / denom,
            "episodes": self.completed_count,
        }


PolicyFn = Callable[[Any, Array, Array], Tuple[Array, Dict[str, Array]]]
# (params, obs, key) -> (action, extras)


def rollout(
    env,
    policy_fn: PolicyFn,
    params,
    env_state,
    obs: Array,
    ep_stats: EpisodeStats,
    key: Array,
    num_steps: int,
) -> Tuple[Any, Array, EpisodeStats, Trajectory]:
    """Unroll ``num_steps`` of (infer → step) under ``lax.scan``.

    Returns ``(env_state, last_obs, ep_stats, trajectory)``.  ``env`` must
    be a vectorized auto-resetting env (:class:`~xingtian_tpu.envs.core.VecEnv`).
    """

    def body(carry, _):
        env_state, obs, stats, key = carry
        key, act_key = jax.random.split(key)
        action, extras = policy_fn(params, obs, act_key)
        env_state, ts = env.step(env_state, action)
        stats = stats.update(ts.reward, ts.done)
        out = (obs, action, ts.reward, ts.done, extras)
        return (env_state, ts.obs, stats, key), out

    (env_state, last_obs, ep_stats, _), (obs_seq, act_seq, rew_seq, done_seq, extras_seq) = (
        jax.lax.scan(body, (env_state, obs, ep_stats.fresh_window(), key),
                     None, length=num_steps)
    )
    traj = Trajectory(
        obs=obs_seq, action=act_seq, reward=rew_seq, done=done_seq,
        last_obs=last_obs, extras=extras_seq,
    )
    return env_state, last_obs, ep_stats, traj
