"""Algorithm base — the TPU-native contract replacing the reference's
``Algorithm`` class (``xt/algorithm/algorithm.py:34-237``).

The reference contract is imperative: ``prepare_data`` ingests pickled
trajectories, ``train`` runs sess.run, ``get/set_weights`` ships numpy
lists through plasma.  Here an algorithm is a *pure-function factory*: it
owns static config plus a :class:`~xingtian_tpu.models.policy.ModelSpec`
and a vectorized env, and exposes

* ``init_state(key) -> AlgoState``   (params, opt state, env state — one pytree)
* ``train_step(state) -> (state, metrics)``  — rollout + update fused,
  jittable, the unit the runtime jits/shards.

Because params live inside the state pytree, the reference's weight
distribution machinery (``dist_model_policy``, ShareBuf buf-ids,
``alg_utils.py:37-117``) reduces to: the state is already on every chip
that needs it (replicated or sharded by the mesh).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from xingtian_tpu.agents.rollout import EpisodeStats
from xingtian_tpu.models.policy import ModelSpec

Array = jax.Array


@struct.dataclass
class AlgoState:
    """Common train-state layout; algorithms may subclass with extra fields."""

    params: Any
    opt_state: Any
    env_state: Any
    obs: Array
    ep_stats: EpisodeStats
    key: Array
    update_step: Array       # number of train_step calls
    env_steps: Array         # total env transitions consumed


class Algorithm:
    """Base: holds (model, env, config); subclasses implement the two fns."""

    name: str = "base"
    async_flag: bool = False     # parity tag (``algorithm.py:74``)
    DEFAULTS: Dict[str, Any] = {}

    def __init__(self, model: ModelSpec, env, config: Optional[dict] = None):
        self.model = model
        self.env = env
        cfg = dict(self.DEFAULTS)
        cfg.update(config or {})
        self.config = cfg
        # save cadence parity: ``Algorithm.if_save`` (``algorithm.py:83-87``)
        self.save_interval = int(cfg.get("save_interval", 500))
        # ``train_ready`` gate parity (``algorithm.py:137-154``)
        self.learning_starts = int(cfg.get("learning_starts", 0))
        # user-extensible interaction hooks (``xt/agent/agent.py:35-220``
        # analog, see xingtian_tpu/agents/agent.py); None = native behaviour
        self.agent = None

    # -- agent extension point ---------------------------------------------
    def set_agent(self, agent) -> None:
        """Install YAML-selected agent hooks (action selection + trajectory
        post-processing).  Must be called before the train step is traced."""
        self.agent = agent

    def _policy(self, params_pack, obs, key):
        """Rollout action selection, routed through the agent when set."""
        if self.agent is not None:
            return self.agent.infer_action(params_pack, obs, key)
        return self.policy_fn(params_pack, obs, key)

    def _post_traj(self, traj):
        """Trajectory post-processing between rollout and update."""
        if self.agent is not None:
            return self.agent.transform_trajectory(traj)
        return traj

    # -- host-farm bridge ---------------------------------------------------
    @staticmethod
    def batch_to_trajectory(batch):
        """``AsyncTrajectoryFarm.drain_arrays`` output → device Trajectory
        (shared by every algorithm with a ``train_step_from_batch``)."""
        from xingtian_tpu.agents.rollout import Trajectory
        extras = {k: jnp.asarray(v)
                  for k, v in batch.get("extras", {}).items()}
        if "frame_prefix" in batch:      # slim pixel transport (see below)
            extras["frame_prefix"] = jnp.asarray(batch["frame_prefix"])
        return Trajectory(
            obs=jnp.asarray(batch["obs"]),
            action=jnp.asarray(batch["action"]),
            reward=jnp.asarray(batch["reward"], jnp.float32),
            done=jnp.asarray(batch["done"]),
            last_obs=jnp.asarray(batch["last_obs"]),
            extras=extras,
        )

    @staticmethod
    def restack_pixels(traj):
        """Reconstruct full frame-stacked observations from the farm's
        slim pixel transport (``AsyncTrajectoryFarm(slim_pixel_frames=
        True)``) — runs inside the jitted learner step, so the 4×-larger
        stacked tensor only ever materializes in device HBM, never on the
        wire.

        Wire format: ``traj.obs[T, B, H, W, 1]`` is each step's newest
        frame, ``traj.last_obs[B, H, W, 1]`` the bootstrap frame, and
        ``extras["frame_prefix"][B, H, W, S-1]`` the older stack slots at
        segment start (already boundary-zeroed by the host preprocessor).
        Episode boundaries inside the segment re-zero older slots exactly
        as the host's stack-clear does (``envs/ale.py`` AtariPreprocessor:
        obs after a done starts from a cleared stack).  No-op when the
        trajectory carries no ``frame_prefix``.
        """
        if "frame_prefix" not in traj.extras:
            return traj
        extras = dict(traj.extras)
        prefix = extras.pop("frame_prefix")          # [B, H, W, S-1]
        frames = traj.obs                            # [T, B, H, W, 1]
        T = frames.shape[0]
        S = prefix.shape[-1] + 1
        # full[i] = frame with step index i−(S−1)  (prefix occupies i<S−1)
        full = jnp.concatenate([
            jnp.moveaxis(prefix, -1, 0)[..., None],  # [S-1, B, H, W, 1]
            frames,
            traj.last_obs[None],                     # bootstrap frame
        ], axis=0)                                   # [T+S, B, H, W, 1]
        # cum[t] = number of dones in steps < t  (done_t ⇒ obs_{t+1} fresh)
        cum = jnp.concatenate([
            jnp.zeros((1,) + traj.done.shape[1:], jnp.int32),
            jnp.cumsum(traj.done.astype(jnp.int32), axis=0)], axis=0)
        ts = jnp.arange(T + 1)

        def slot(k):
            # obs_t slot k (oldest→newest) is the frame of step t+k−(S−1),
            # zeroed iff an episode boundary lies in [that step, t)
            fr = full[ts + k]                        # [T+1, B, H, W, 1]
            j = jnp.clip(ts + k - (S - 1), 0, None)
            keep = (cum[ts] - cum[j]) == 0           # [T+1, B]
            return fr * keep[..., None, None, None].astype(fr.dtype)

        obs_full = jnp.concatenate([slot(k) for k in range(S)], axis=-1)
        return traj.replace(
            obs=obs_full[:T], last_obs=obs_full[T], extras=extras)

    # -- required ---------------------------------------------------------
    def init_state(self, key: Array) -> AlgoState:
        raise NotImplementedError

    def train_step(self, state: AlgoState) -> Tuple[AlgoState, Dict[str, Array]]:
        raise NotImplementedError

    # -- shared helpers ---------------------------------------------------
    def if_save(self, update_step: int) -> bool:
        return self.save_interval > 0 and update_step % self.save_interval == 0

    def cfg(self, key: str):
        return self.config[key]

    def _init_common(self, key: Array, params, opt_state) -> AlgoState:
        env_key, state_key = jax.random.split(key)
        if self.env is None:
            # external-data mode (host farm feeds trajectories; the
            # learner never steps an on-device env): placeholder fields
            # keep the state pytree structurally complete
            return AlgoState(
                params=params,
                opt_state=opt_state,
                env_state=(),
                obs=jnp.zeros((1, *self.model.obs_shape), self.model.obs_dtype),
                ep_stats=EpisodeStats.init(1),
                key=state_key,
                update_step=jnp.zeros((), jnp.int32),
                env_steps=jnp.zeros((), jnp.int32),
            )
        env_state, obs = self.env.reset(env_key)
        # obs may be a pytree (dict observations, e.g. recommender envs);
        # copy it: envs whose _obs passes state arrays through by reference
        # would otherwise alias env_state leaves and break buffer donation
        obs = jax.tree_util.tree_map(jnp.copy, obs)
        n_envs = jax.tree_util.tree_leaves(obs)[0].shape[0]
        return AlgoState(
            params=params,
            opt_state=opt_state,
            env_state=env_state,
            obs=obs,
            ep_stats=EpisodeStats.init(n_envs),
            key=state_key,
            update_step=jnp.zeros((), jnp.int32),
            env_steps=jnp.zeros((), jnp.int32),
        )
