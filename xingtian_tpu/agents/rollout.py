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
    """Device-side episode bookkeeping across rollout boundaries.

    Window aggregates (``completed_*``) reset each rollout; ``recent_*``
    is an EMA over completed episodes that persists across windows so
    short rollouts (which may complete zero episodes) still report a
    meaningful reward metric.
    """

    running_return: Array   # [B] return of the in-flight episode per env
    running_len: Array      # [B]
    completed_return: Array  # [] sum of returns of episodes completed this rollout
    completed_len: Array     # []
    completed_count: Array   # []
    recent_return: Array     # [] EMA over completed episode returns
    recent_len: Array        # [] EMA over completed episode lengths
    episodes_total: Array    # [] lifetime completed episodes

    EMA_ALPHA = 0.05  # per completed episode

    @classmethod
    def init(cls, n_envs: int) -> "EpisodeStats":
        def z():
            # fresh array per field: sharing one zero-scalar buffer across
            # fields breaks buffer donation ("donate the same buffer twice")
            return jnp.zeros((), jnp.float32)
        return cls(
            running_return=jnp.zeros((n_envs,), jnp.float32),
            running_len=jnp.zeros((n_envs,), jnp.float32),
            completed_return=z(), completed_len=z(), completed_count=z(),
            recent_return=z(), recent_len=z(), episodes_total=z(),
        )

    def fresh_window(self) -> "EpisodeStats":
        """Zero the completed-episode aggregates, keep in-flight returns."""
        z = jnp.zeros((), jnp.float32)
        return self.replace(completed_return=z, completed_len=z, completed_count=z)

    def update(self, reward: Array, done: Array) -> "EpisodeStats":
        run_ret = self.running_return + reward
        run_len = self.running_len + 1.0
        d = done.astype(jnp.float32)
        n_done = jnp.sum(d)
        step_ret_mean = jnp.sum(run_ret * d) / jnp.maximum(n_done, 1.0)
        step_len_mean = jnp.sum(run_len * d) / jnp.maximum(n_done, 1.0)
        # EMA blend, weighted by how many episodes completed this step;
        # the very first completions seed the EMA directly.
        w = jnp.minimum(self.EMA_ALPHA * n_done, 1.0)
        w = jnp.where(self.episodes_total == 0, jnp.minimum(n_done, 1.0), w)
        has = n_done > 0
        recent_return = jnp.where(
            has, (1.0 - w) * self.recent_return + w * step_ret_mean,
            self.recent_return)
        recent_len = jnp.where(
            has, (1.0 - w) * self.recent_len + w * step_len_mean,
            self.recent_len)
        return self.replace(
            running_return=run_ret * (1.0 - d),
            running_len=run_len * (1.0 - d),
            completed_return=self.completed_return + jnp.sum(run_ret * d),
            completed_len=self.completed_len + jnp.sum(run_len * d),
            completed_count=self.completed_count + n_done,
            recent_return=recent_return,
            recent_len=recent_len,
            episodes_total=self.episodes_total + n_done,
        )

    def summary(self) -> Dict[str, Array]:
        has = self.completed_count > 0
        denom = jnp.maximum(self.completed_count, 1.0)
        return {
            # window mean when episodes completed this rollout, else the EMA
            "episode_reward_mean": jnp.where(
                has, self.completed_return / denom, self.recent_return),
            "episode_len_mean": jnp.where(
                has, self.completed_len / denom, self.recent_len),
            "episodes": self.completed_count,
            "episode_reward_recent": self.recent_return,
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
