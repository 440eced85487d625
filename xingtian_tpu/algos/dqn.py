"""DQN / DoubleDQN — off-policy Q-learning with on-device replay.

Parity with the reference (``xt/algorithm/dqn/dqn.py:40-110`` +
``default_config.py``): target network updated every
``TARGET_UPDATE_FREQ`` gradient steps, TD targets
``r + γ·max_a' Q_target(s', a')`` (Double-DQN: argmax under the online
net, ``dqn.py:79-84``), ``learning_starts`` gating
(``algorithm.py:137-154``), ε-greedy exploration with a linear decay
schedule (the reference decays per-episode in the agent,
``xt/agent/dqn/cartpole_dqn.py:37-62``; here the schedule is a pure
function of global env_steps so it is identical across vectorized envs).

TPU shape: one fused ``train_step`` = T×B env transitions collected under
``lax.scan`` (ε-greedy on device) → ring-buffer insert → ``n_updates``
sampled minibatch gradient steps — reproducing the reference's 1 update
per ``UPDATE_FREQ`` transitions cadence without any host round trip.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from xingtian_tpu.agents.rollout import EpisodeStats, rollout
from xingtian_tpu.algos.base import Algorithm, AlgoState
from xingtian_tpu.ops.replay import (
    FrameRingState,
    PackedReplayState,
    ReplayState,
    frame_ring_add,
    frame_ring_init,
    frame_ring_sample,
    packed_add,
    packed_init,
    packed_sample,
    replay_add_batch,
    replay_init,
    replay_sample,
)


def _find_n_stack(env) -> int:
    """Frame-stack depth of the env's PixelObs wrapper, or 0."""
    e = env
    while e is not None:
        if hasattr(e, "n_stack"):
            return int(e.n_stack)
        e = getattr(e, "env", None)
    return 0
from xingtian_tpu.registry import Registers

Array = jax.Array

# Hyperparameters carried in the train state as traced scalars so a PBT
# population can vmap over members with different values in one compiled
# program (same mechanism as PPO's DYNAMIC_HYPERS; the reference's PBT
# mutates LR/BUFFER_SIZE for DQN, ``examples/evolution/
# pbt_spaceinvader_dqn.yaml`` — BUFFER_SIZE changes compiled shapes and
# therefore stays static here).
DYNAMIC_HYPERS = ("LRC", "GAMMA", "EPS_END", "EPS_DECAY_STEPS")


@struct.dataclass
class DQNState(AlgoState):
    target_params: dict = None
    replay: ReplayState = None
    train_count: Array = None    # gradient steps taken
    hypers: dict = None          # {name: f32 scalar} for DYNAMIC_HYPERS


@Registers.algorithm.register(name="DQN", aliases=("DDQN", "DoubleDQN"))
class DQN(Algorithm):
    name = "dqn"
    async_flag = True    # parity tag: reference DQN is an async algorithm

    DEFAULTS = dict(
        GAMMA=0.99,
        LRC=0.001,                # reference's critic LR name
        BATCH_SIZE=32,
        BUFFER_SIZE=100000,
        TARGET_UPDATE_FREQ=1000,  # in gradient steps
        UPDATE_FREQ=64,           # env transitions per gradient step
        learning_starts=10000,
        double_dqn=False,
        EPS_START=1.0,
        EPS_END=0.01,
        EPS_DECAY_STEPS=100000,   # env steps to anneal ε over
        rollout_steps=16,         # T per train_step (B comes from the env)
    )

    def __init__(self, model, env, config=None):
        super().__init__(model, env, config)
        c = self.config
        # LRC applied dynamically from state.hypers (see DYNAMIC_HYPERS)
        self.optimizer = optax.scale_by_adam()
        self.rollout_steps = int(c["rollout_steps"])
        # HOST_REPLAY: park the buffer in host RAM (C++ ring,
        # native/hostreplay.cpp) for capacities beyond HBM — the
        # reference's host-RAM Atari replay (atari_dqn.py:39-44)
        self.host_replay = None
        if c.get("HOST_REPLAY"):
            from xingtian_tpu.ops.host_replay import HostReplay
            if self.model.obs_dtype != jnp.uint8:
                raise ValueError(
                    "HOST_REPLAY stores uint8 observations; got "
                    f"{self.model.obs_dtype} (use the pixel env variants)")
            self.host_replay = HostReplay(
                int(c["BUFFER_SIZE"]), self.model.obs_shape,
                explicit_next=True)
        # single-copy packed ring (obs stored once, next_obs = successor
        # slot — reference parity: atari_dqn.py:39-44 stores each uint8
        # frame once).  Needs a persistent on-device env whose lanes step
        # contiguously; the farm path (env=None) keeps the explicit ring.
        self.packed = (env is not None and self.host_replay is None
                       and bool(c.get("PACKED_REPLAY", True)))
        # frame ring: for frame-stacked uint8 pixel obs, store ONE frame
        # per transition and rebuild stacks at sample time — 4× less HBM
        # than even the packed ring (ops/replay.py FrameRingState)
        self.frame_stack = 0
        if self.packed and bool(c.get("FRAME_RING", True)):
            S = _find_n_stack(env)
            shape = tuple(self.model.obs_shape) \
                if not hasattr(self.model, "obs_example") else ()
            if (S >= 2 and len(shape) == 3 and shape[-1] == S
                    and self.model.obs_dtype == jnp.uint8):
                self.frame_stack = S

    # ------------------------------------------------------------------
    def default_hypers(self):
        return {k: jnp.asarray(float(self.config[k]), jnp.float32)
                for k in DYNAMIC_HYPERS}

    def epsilon(self, env_steps: Array, hypers=None) -> Array:
        c = self.config
        eps_end = hypers["EPS_END"] if hypers else float(c["EPS_END"])
        decay = hypers["EPS_DECAY_STEPS"] if hypers else float(c["EPS_DECAY_STEPS"])
        frac = jnp.clip(env_steps.astype(jnp.float32) / decay, 0.0, 1.0)
        return c["EPS_START"] + frac * (eps_end - c["EPS_START"])

    # ------------------------------------------------------------------
    def init_state(self, key: Array, hypers=None) -> DQNState:
        pkey, skey = jax.random.split(key)
        params = self.model.init_params(pkey)
        opt_state = self.optimizer.init(params)
        base = self._init_common(skey, params, opt_state)

        if hasattr(self.model, "obs_example"):
            obs_example = self.model.obs_example()   # pytree observations
        else:
            obs_example = jnp.zeros(self.model.obs_shape, self.model.obs_dtype)
        if self.frame_stack:
            B = self.env.n
            cap_per_env = max(1, int(self.config["BUFFER_SIZE"]) // B)
            replay = frame_ring_init(
                self.model.obs_shape[:-1], B, cap_per_env,
                dtype=self.model.obs_dtype)
        elif self.packed:
            B = self.env.n
            cap_per_env = max(1, int(self.config["BUFFER_SIZE"]) // B)
            replay = packed_init(obs_example, B, cap_per_env)
        else:
            transition = {
                "obs": obs_example,
                "action": jnp.zeros((), jnp.int32),
                "reward": jnp.zeros((), jnp.float32),
                "next_obs": obs_example,
                "done": jnp.zeros((), jnp.float32),
            }
            # host-RAM mode keeps a 1-slot device ring only to preserve the
            # state pytree structure (checkpoints stay loadable either way)
            device_capacity = 1 if self.host_replay is not None else int(
                self.config["BUFFER_SIZE"])
            replay = replay_init(transition, device_capacity)
        return DQNState(
            **{f: getattr(base, f) for f in base.__dataclass_fields__},
            # independent copy: sharing buffers with params breaks donation
            target_params=jax.tree_util.tree_map(jnp.copy, params),
            replay=replay,
            train_count=jnp.zeros((), jnp.int32),
            hypers=hypers if hypers is not None else self.default_hypers(),
        )

    # ------------------------------------------------------------------
    def policy_fn(self, params_and_steps, obs, key):
        """ε-greedy over Q values (device-side schedule)."""
        params, env_steps, hypers = params_and_steps
        q = self.model.apply(params, obs)
        greedy = jnp.argmax(q, axis=-1)
        k1, k2 = jax.random.split(key)
        rand = jax.random.randint(k1, greedy.shape, 0, self.model.action_dim)
        eps = self.epsilon(env_steps, hypers)
        explore = jax.random.uniform(k2, greedy.shape) < eps
        action = jnp.where(explore, rand, greedy)
        return action, {"q": jnp.max(q, axis=-1)}

    # ------------------------------------------------------------------
    def _td_loss(self, params, target_params, batch, hypers
                 ) -> Tuple[Array, Dict[str, Array]]:
        c = self.config
        q = self.model.apply(params, batch["obs"])
        q_taken = jnp.take_along_axis(
            q, batch["action"][..., None], axis=-1)[..., 0]

        q_next_target = self.model.apply(target_params, batch["next_obs"])
        if c["double_dqn"]:
            q_next_online = self.model.apply(params, batch["next_obs"])
            best = jnp.argmax(q_next_online, axis=-1)
            max_next = jnp.take_along_axis(
                q_next_target, best[..., None], axis=-1)[..., 0]
        else:
            max_next = jnp.max(q_next_target, axis=-1)

        target = batch["reward"] + hypers["GAMMA"] * (1.0 - batch["done"]) * \
            jax.lax.stop_gradient(max_next)
        td = q_taken - target
        loss = jnp.mean(jnp.square(td))
        return loss, {"loss": loss, "q_mean": jnp.mean(q_taken),
                      "td_abs": jnp.mean(jnp.abs(td))}

    # ------------------------------------------------------------------
    def train_step(self, state: DQNState) -> Tuple[DQNState, Dict[str, Array]]:
        c = self.config
        T = self.rollout_steps

        key, rollout_key, sample_key = jax.random.split(state.key, 3)

        env_state, last_obs, ep_stats, traj = rollout(
            self.env, self._policy,
            (state.params, state.env_steps, state.hypers),
            state.env_state, state.obs, state.ep_stats, rollout_key, T,
        )
        traj = self._post_traj(traj)
        B = traj.reward.shape[1]

        tmap = jax.tree_util.tree_map
        if self.frame_stack:
            # single-FRAME insert: only obs[..., -1] is stored; stacks are
            # rebuilt at sample time from consecutive slots
            replay = frame_ring_add(state.replay, traj.obs, traj.action,
                                    traj.reward, traj.done)
        elif self.packed:
            # single-copy insert: obs stored once per transition; the
            # successor chain across chunks is closed by the next rollout
            # (its obs[0] == this chunk's last_obs)
            replay = packed_add(state.replay, traj.obs, traj.action,
                                traj.reward, traj.done)
        else:
            # next_obs: within the rollout it's obs[t+1] — except at a
            # done, where obs[t+1] is the auto-reset obs; the (1-done) mask
            # in the TD target zeroes the bootstrap there so the stored
            # value is unused.
            next_obs = tmap(
                lambda o, last: jnp.concatenate([o[1:], last[None]], axis=0),
                traj.obs, traj.last_obs)

            def flat(x):
                return tmap(lambda a: a.reshape((T * B,) + a.shape[2:]), x)

            batch_tr = {
                "obs": flat(traj.obs),
                "action": flat(traj.action).astype(jnp.int32),
                "reward": flat(traj.reward),
                "next_obs": flat(next_obs),
                "done": flat(traj.done).astype(jnp.float32),
            }
            if self.host_replay is not None:
                replay = state.replay      # placeholder ring, untouched
                self.host_replay.add_callback(
                    batch_tr["obs"], batch_tr["action"], batch_tr["reward"],
                    batch_tr["done"], next_obs=batch_tr["next_obs"])
            else:
                replay = replay_add_batch(state.replay, batch_tr)

        n_updates = max(1, (T * B) // int(c["UPDATE_FREQ"]))
        mb = int(c["BATCH_SIZE"])

        def one_update(carry, k):
            params, target_params, opt_state, train_count = carry
            if self.host_replay is not None:
                seed = jax.random.randint(k, (), 0, jnp.iinfo(jnp.int32).max)
                batch = self.host_replay.sample_callback(mb, seed)
            elif self.frame_stack:
                batch = frame_ring_sample(replay, k, mb, self.frame_stack)
            elif self.packed:
                batch = packed_sample(replay, k, mb)
            else:
                batch = replay_sample(replay, k, mb)
            (_, aux), grads = jax.value_and_grad(
                self._td_loss, has_aux=True)(
                    params, target_params, batch, state.hypers)
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            # dynamic learning rate (adam's -lr scaling applied here)
            updates = jax.tree_util.tree_map(
                lambda u: -state.hypers["LRC"] * u, updates)
            params = optax.apply_updates(params, updates)
            train_count = train_count + 1
            # periodic hard target sync (``dqn.py:101-103``)
            sync = (train_count % int(c["TARGET_UPDATE_FREQ"])) == 0
            target_params = jax.tree_util.tree_map(
                lambda t, p: jnp.where(sync, p, t), target_params, params)
            return (params, target_params, opt_state, train_count), aux

        def do_updates(operand):
            params, target_params, opt_state, train_count = operand
            keys = jax.random.split(sample_key, n_updates)
            return jax.lax.scan(
                one_update, (params, target_params, opt_state, train_count), keys)

        def skip_updates(operand):
            zero_aux = {
                "loss": jnp.zeros((n_updates,)),
                "q_mean": jnp.zeros((n_updates,)),
                "td_abs": jnp.zeros((n_updates,)),
            }
            return operand, zero_aux

        env_steps = state.env_steps + T * B
        ready = env_steps >= self.learning_starts   # ``train_ready`` parity
        (params, target_params, opt_state, train_count), auxes = jax.lax.cond(
            ready, do_updates, skip_updates,
            (state.params, state.target_params, state.opt_state, state.train_count),
        )

        metrics = {k: jnp.mean(v) for k, v in auxes.items()}
        metrics["epsilon"] = self.epsilon(env_steps, state.hypers)
        buf_total = replay.size * B if self.packed else replay.size
        metrics["buffer_size"] = buf_total.astype(jnp.float32)
        metrics.update(ep_stats.summary())

        new_state = state.replace(
            params=params, opt_state=opt_state,
            env_state=env_state, obs=last_obs, ep_stats=ep_stats, key=key,
            update_step=state.update_step + 1,
            env_steps=env_steps,
            target_params=target_params,
            replay=replay,
            train_count=train_count,
        )
        return new_state, metrics


    # ------------------------------------------------------------------
    def train_step_from_batch(self, state: DQNState, traj
                              ) -> Tuple[DQNState, Dict[str, Array]]:
        """Learner update on externally-collected time-major transitions.

        The host-env-farm path (reference: explorer processes stream DQN
        transitions through broker queues into the learner's replay,
        ``learner.py:298-380``): segments from
        :class:`~xingtian_tpu.envs.async_farm.AsyncTrajectoryFarm` become
        a Trajectory (``batch_to_trajectory``); this jitted step inserts
        them into the device ring and runs the update cadence.
        """
        if self.packed:
            raise ValueError(
                "train_step_from_batch needs the explicit-next ring — farm "
                "segments arrive in arbitrary worker order, breaking the "
                "packed ring's successor chain (construct DQN with env=None "
                "or PACKED_REPLAY=False for the host-farm path)")
        traj = self.restack_pixels(traj)   # slim pixel transport → stacks
        c = self.config
        T, B = traj.reward.shape
        key, sample_key = jax.random.split(state.key)

        tmap = jax.tree_util.tree_map
        next_obs = tmap(
            lambda o, last: jnp.concatenate([o[1:], last[None]], axis=0),
            traj.obs, traj.last_obs)

        def flat(x):
            return tmap(lambda a: a.reshape((T * B,) + a.shape[2:]), x)

        batch_tr = {
            "obs": flat(traj.obs),
            "action": flat(traj.action).astype(jnp.int32),
            "reward": flat(traj.reward),
            "next_obs": flat(next_obs),
            "done": flat(traj.done).astype(jnp.float32),
        }
        replay = replay_add_batch(state.replay, batch_tr)

        n_updates = max(1, (T * B) // int(c["UPDATE_FREQ"]))
        mb = int(c["BATCH_SIZE"])

        def one_update(carry, k):
            params, target_params, opt_state, train_count = carry
            batch = replay_sample(replay, k, mb)
            (_, aux), grads = jax.value_and_grad(
                self._td_loss, has_aux=True)(
                    params, target_params, batch, state.hypers)
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            updates = jax.tree_util.tree_map(
                lambda u: -state.hypers["LRC"] * u, updates)
            params = optax.apply_updates(params, updates)
            train_count = train_count + 1
            sync = (train_count % int(c["TARGET_UPDATE_FREQ"])) == 0
            target_params = jax.tree_util.tree_map(
                lambda t, p: jnp.where(sync, p, t), target_params, params)
            return (params, target_params, opt_state, train_count), aux

        def do_updates(operand):
            return jax.lax.scan(
                one_update, operand, jax.random.split(sample_key, n_updates))

        def skip_updates(operand):
            zero = {k: jnp.zeros((n_updates,))
                    for k in ("loss", "q_mean", "td_abs")}
            return operand, zero

        env_steps = state.env_steps + T * B
        ready = env_steps >= self.learning_starts
        (params, target_params, opt_state, train_count), auxes = jax.lax.cond(
            ready, do_updates, skip_updates,
            (state.params, state.target_params, state.opt_state,
             state.train_count))

        metrics = {k: jnp.mean(v) for k, v in auxes.items()}
        metrics["epsilon"] = self.epsilon(env_steps, state.hypers)
        metrics["buffer_size"] = replay.size.astype(jnp.float32)
        return state.replace(
            params=params, opt_state=opt_state, key=key,
            update_step=state.update_step + 1, env_steps=env_steps,
            target_params=target_params, replay=replay,
            train_count=train_count,
        ), metrics


@Registers.algorithm.register(name="DQNInfoFlowAlg", aliases=("DqnInfoFlow",))
class DQNInfoFlowAlg(DQN):
    """Recommender ("info flow") DQN variant (reference
    ``xt/algorithm/dqn/dqn_infoflw_alg.py``): Q over a per-step candidate
    item set via :class:`~xingtian_tpu.models.recsys.RecQNetwork`.  The
    base DQN machinery is unchanged — dict observations flow through the
    pytree replay buffer and the model scores all candidates at once.
    """

    name = "info_flow_dqn"
    async_flag = False   # parity: infoflow variant is synchronous

    DEFAULTS = dict(DQN.DEFAULTS)
    DEFAULTS.update(
        BUFFER_SIZE=20000,
        learning_starts=500,
        EPS_DECAY_STEPS=20000,
        rollout_steps=8,
    )
