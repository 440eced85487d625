"""QMIX — cooperative multi-agent Q-learning with a monotonic mixer.

Parity targets (reference ``xt/algorithm/qmix/qmix.py`` (823 LoC TF graph),
``qmix_alg.py``, ``episode_buffer_np.py``; pymarl-derived):

* parameter-shared GRU agent net over (obs ⊕ last-action ⊕ agent-id);
* hypernetwork mixer on the global state (``qmix.py:161-230``);
* ε-greedy with ``DecayThenFlatSchedule`` (linear → flat,
  ``qmix_alg.py:24-99``);
* episodic replay: whole padded episodes ``[T_max]`` with ``filled``
  masks (``episode_buffer_np.py``), sampled in episode batches;
* double-Q target through the target agent net + target mixer, hard
  target sync on a train-count interval (``qmix.py:565-590``).

TPU shape: collection is ``E`` parallel envs scanned for ``T_max`` steps
(no auto-reset; post-done steps masked) — the reference steps ONE SMAC
episode at a time per explorer.  The episodic buffer is the generic
on-device ring (:mod:`xingtian_tpu.ops.replay`) whose "transition" is an
entire episode pytree.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from xingtian_tpu.envs.core import VecEnv
from xingtian_tpu.models.qmix import QMixAgentNet, QMixer
from xingtian_tpu.ops.replay import (
    ReplayState, replay_add_batch, replay_init, replay_sample)
from xingtian_tpu.registry import Registers

Array = jax.Array


@struct.dataclass
class QMIXState:
    params: dict
    target_params: dict
    opt_state: object
    buffer: ReplayState
    key: Array
    update_step: Array
    env_steps: Array
    train_count: Array
    recent_return: Array      # EMA of episode team return
    recent_catch: Array       # EMA of success flag


@Registers.algorithm.register(name="QMIX")
class QMIX:
    """Unified-API episodic trainer (constructed from a raw unified env)."""

    name = "qmix"
    AUX_KEYS = ("loss", "qtot_mean", "td_abs")

    DEFAULTS = dict(
        GAMMA=0.99,
        LR=5e-4,
        BATCH_SIZE=32,             # episodes per gradient step
        BUFFER_SIZE=2000,          # episodes
        TARGET_UPDATE_FREQ=200,    # gradient steps between hard target syncs
        EPS_START=1.0,
        EPS_END=0.05,
        EPS_ANNEAL_STEPS=50000,    # env steps, linear then flat
        GRAD_NORM_CLIP=10.0,
        AGENT_HIDDEN=64,
        MIXER_EMBED=32,
        learning_starts=32,        # episodes in buffer before training
        episodes_per_collect=8,    # E parallel envs per train_step
        train_per_collect=2,       # gradient steps per collect
    )

    def __init__(self, env, config=None):
        """``env``: a raw unified-API JaxEnv (api_type='unified'), or None
        for external-episode (host SMAC) mode — see :meth:`from_env_info`."""
        cfg = dict(self.DEFAULTS)
        cfg.update(config or {})
        self.config = cfg
        if env is not None:
            if env.spec.api_type != "unified":
                raise ValueError("QMIX requires a unified (multi-agent) env")
            self.raw_env = env
            self.n_agents = env.spec.n_agents
            self.n_actions = env.spec.action_spec.n
            self.obs_dim = int(jnp.prod(jnp.asarray(env.spec.obs_shape)))
            self.state_dim = env.global_state_dim
            self.T = env.spec.max_steps
            self.E = int(cfg["episodes_per_collect"])
            self.env = VecEnv(env, self.E, auto_reset=False)
        else:
            # external-episode mode: geometry comes from _env_info
            # (set by from_env_info); on-device collection unavailable
            info = cfg.pop("_env_info")
            self.raw_env = self.env = None
            self.n_agents = int(info["n_agents"])
            self.n_actions = int(info["n_actions"])
            self.obs_dim = int(np.prod(info["obs_shape"]))
            self.state_dim = int(np.prod(info["state_shape"]))
            self.T = int(info["episode_limit"])
            self.E = int(cfg["episodes_per_collect"])

        self.agent_net = QMixAgentNet(
            n_actions=self.n_actions, hidden_dim=int(cfg["AGENT_HIDDEN"]))
        self.mixer = QMixer(
            n_agents=self.n_agents, embed_dim=int(cfg["MIXER_EMBED"]))
        self.optimizer = optax.chain(
            optax.clip_by_global_norm(cfg["GRAD_NORM_CLIP"]),
            optax.rmsprop(cfg["LR"], decay=0.99, eps=1e-5),
        )

    @classmethod
    def from_env_info(cls, env_info: dict, config=None) -> "QMIX":
        """Build a learner for *host-collected* episodes from a smac-style
        info dict (``get_env_info()`` of ``StarCraft2Xt`` — the real-SC2
        path, ``xt/environment/ma/env_starcraft.py:66-77``)."""
        cfg = dict(config or {})
        cfg["_env_info"] = dict(env_info)
        return cls(None, cfg)

    # -- agent-input assembly ------------------------------------------
    @property
    def input_dim(self) -> int:
        return self.obs_dim + self.n_actions + self.n_agents

    def _agent_inputs(self, obs: Array, last_action: Array) -> Array:
        """[..., A, obs_dim] ⊕ last-action one-hot ⊕ agent-id one-hot."""
        a_onehot = jax.nn.one_hot(last_action, self.n_actions)
        ids = jnp.broadcast_to(
            jnp.eye(self.n_agents), (*obs.shape[:-2], self.n_agents, self.n_agents))
        return jnp.concatenate([obs, a_onehot, ids], axis=-1)

    def _apply_agent(self, params, inputs: Array, h: Array):
        """inputs [..., A, D], h [..., A, H] → (q [..., A, nact], h')."""
        flat_in = inputs.reshape(-1, self.input_dim)
        flat_h = h.reshape(-1, h.shape[-1])
        q, new_h = self.agent_net.apply(params, flat_in, flat_h)
        return (q.reshape(*inputs.shape[:-1], self.n_actions),
                new_h.reshape(h.shape))

    # ------------------------------------------------------------------
    def epsilon(self, env_steps: Array) -> Array:
        c = self.config
        frac = jnp.clip(
            env_steps.astype(jnp.float32) / float(c["EPS_ANNEAL_STEPS"]), 0.0, 1.0)
        return c["EPS_START"] + frac * (c["EPS_END"] - c["EPS_START"])

    # ------------------------------------------------------------------
    def init_state(self, key: Array) -> QMIXState:
        k_agent, k_mixer, k_state = jax.random.split(key, 3)
        dummy_in = jnp.zeros((1, self.input_dim))
        dummy_h = jnp.zeros((1, int(self.config["AGENT_HIDDEN"])))
        agent_params = self.agent_net.init(k_agent, dummy_in, dummy_h)
        mixer_params = self.mixer.init(
            k_mixer, jnp.zeros((1, self.n_agents)), jnp.zeros((1, self.state_dim)))
        params = {"agent": agent_params, "mixer": mixer_params}
        opt_state = self.optimizer.init(params)

        episode_example = {
            "obs": jnp.zeros((self.T + 1, self.n_agents, self.obs_dim)),
            "gstate": jnp.zeros((self.T + 1, self.state_dim)),
            "avail": jnp.zeros((self.T + 1, self.n_agents, self.n_actions)),
            "action": jnp.zeros((self.T, self.n_agents), jnp.int32),
            "reward": jnp.zeros((self.T,)),
            "terminated": jnp.zeros((self.T,)),   # true termination (not padding)
            "filled": jnp.zeros((self.T,)),
        }
        buffer = replay_init(episode_example, int(self.config["BUFFER_SIZE"]))
        z = lambda dt=jnp.float32: jnp.zeros((), dt)
        return QMIXState(
            params=params,
            target_params=jax.tree_util.tree_map(jnp.copy, params),
            opt_state=opt_state,
            buffer=buffer,
            key=k_state,
            update_step=z(jnp.int32), env_steps=z(jnp.int32),
            train_count=z(jnp.int32),
            recent_return=z(), recent_catch=z(),
        )

    # ------------------------------------------------------------------
    def _collect(self, params, key, epsilon):
        """Run E parallel full episodes → episode-batch pytree [E, ...]."""
        env_key, act_key = jax.random.split(key)
        env_state, obs = self.env.reset(env_key)       # obs [E, A, obs]
        gstate0 = jax.vmap(self.raw_env.global_state)(env_state.inner)
        avail0 = jax.vmap(self.raw_env.avail_actions)(env_state.inner)
        h0 = jnp.zeros((self.E, self.n_agents, int(self.config["AGENT_HIDDEN"])))
        last_a0 = jnp.zeros((self.E, self.n_agents), jnp.int32)
        alive0 = jnp.ones((self.E,), bool)

        def body(carry, key_t):
            env_state, obs, gstate, avail, h, last_a, alive = carry
            inputs = self._agent_inputs(obs, last_a)
            q, h = self._apply_agent(params["agent"], inputs, h)
            k1, k2 = jax.random.split(key_t)
            # SMAC semantics: ε-greedy restricted to available actions
            # (EpsilonGreedyActionSelector masking, ``qmix_alg.py:60-99``)
            greedy = jnp.argmax(jnp.where(avail > 0, q, -1e9), axis=-1)
            rand = jax.random.categorical(
                k1, jnp.where(avail > 0, 0.0, -1e9))   # uniform over avail
            explore = jax.random.uniform(k2, greedy.shape) < epsilon
            actions = jnp.where(explore, rand, greedy)

            new_env_state, ts = self.env.step(env_state, actions)
            new_avail = jax.vmap(self.raw_env.avail_actions)(
                new_env_state.inner)
            filled = alive.astype(jnp.float32)
            terminated = ts.done.astype(jnp.float32) * filled
            out = (obs, gstate, avail, actions, ts.reward * filled,
                   terminated, filled)
            new_alive = alive & ~ts.done
            return ((new_env_state, ts.obs, ts.info["global_state"],
                     new_avail, h, actions, new_alive), out)

        keys = jax.random.split(act_key, self.T)
        (env_state, obs_T, gstate_T, avail_T, _, _, _), seq = jax.lax.scan(
            body, (env_state, obs, gstate0, avail0, h0, last_a0, alive0), keys)
        (obs_seq, gstate_seq, avail_seq, act_seq, rew_seq, term_seq,
         filled_seq) = seq

        # time-major [T, E, ...] → episode-major [E, T, ...], append final obs
        def em(x):
            return jnp.swapaxes(x, 0, 1)
        episodes = {
            "obs": jnp.concatenate([em(obs_seq), obs_T[:, None]], axis=1),
            "gstate": jnp.concatenate([em(gstate_seq), gstate_T[:, None]], axis=1),
            "avail": jnp.concatenate([em(avail_seq), avail_T[:, None]], axis=1),
            "action": em(act_seq),
            "reward": em(rew_seq),
            "terminated": em(term_seq),
            "filled": em(filled_seq),
        }
        return episodes

    # ------------------------------------------------------------------
    def _unroll_q(self, agent_params, obs_seq, action_seq):
        """Q values for every step of a batch of episodes.

        obs_seq [B, T+1, A, obs], action_seq [B, T, A] →
        q [B, T+1, A, n_actions] (hidden state threaded through time).
        """
        B = obs_seq.shape[0]
        h0 = jnp.zeros((B, self.n_agents, int(self.config["AGENT_HIDDEN"])))
        last_a = jnp.concatenate(
            [jnp.zeros((B, 1, self.n_agents), jnp.int32),
             action_seq], axis=1)                      # [B, T+1, A]

        def body(h, t_slice):
            obs_t, la_t = t_slice
            inputs = self._agent_inputs(obs_t, la_t)
            q_t, h = self._apply_agent(agent_params, inputs, h)
            return h, q_t

        tm = lambda x: jnp.swapaxes(x, 0, 1)           # episode→time major
        _, q_seq = jax.lax.scan(body, h0, (tm(obs_seq), tm(last_a)))
        return jnp.swapaxes(q_seq, 0, 1)               # [B, T+1, A, nact]

    # ------------------------------------------------------------------
    def _loss(self, params, target_params, batch, key=None
              ) -> Tuple[Array, Dict[str, Array]]:
        """``key`` is unused here; subclasses with stochastic losses (SCC's
        Monte-Carlo Shapley coalitions) resample from it every update."""
        c = self.config
        q_online = self._unroll_q(params["agent"], batch["obs"], batch["action"])
        q_target = self._unroll_q(
            target_params["agent"], batch["obs"], batch["action"])

        chosen = jnp.take_along_axis(
            q_online[:, :-1], batch["action"][..., None], axis=-1)[..., 0]
        q_tot = self.mixer.apply(
            params["mixer"], chosen, batch["gstate"][:, :-1])    # [B, T]

        # double-Q: online argmax at t+1 (over AVAILABLE actions only —
        # pymarl masks unavailable with -inf), target net evaluates
        best_next = jnp.argmax(
            jnp.where(batch["avail"][:, 1:] > 0, q_online[:, 1:], -1e9),
            axis=-1)
        target_next = jnp.take_along_axis(
            q_target[:, 1:], best_next[..., None], axis=-1)[..., 0]
        target_tot = self.mixer.apply(
            target_params["mixer"], target_next, batch["gstate"][:, 1:])

        y = batch["reward"] + c["GAMMA"] * (1.0 - batch["terminated"]) * \
            jax.lax.stop_gradient(target_tot)
        td = (q_tot - jax.lax.stop_gradient(y)) * batch["filled"]
        denom = jnp.maximum(jnp.sum(batch["filled"]), 1.0)
        loss = jnp.sum(jnp.square(td)) / denom
        return loss, {"loss": loss,
                      "qtot_mean": jnp.sum(q_tot * batch["filled"]) / denom,
                      "td_abs": jnp.sum(jnp.abs(td)) / denom}

    # ------------------------------------------------------------------
    def train_step(self, state: QMIXState) -> Tuple[QMIXState, Dict[str, Array]]:
        c = self.config
        key, k_collect, k_sample = jax.random.split(state.key, 3)
        eps = self.epsilon(state.env_steps)

        episodes = self._collect(state.params, k_collect, eps)
        buffer = replay_add_batch(state.buffer, episodes)
        steps_collected = jnp.sum(episodes["filled"]).astype(jnp.int32)
        env_steps = state.env_steps + steps_collected

        # episode-return bookkeeping (team reward; catch flag = any +1 step)
        ep_ret = jnp.mean(jnp.sum(episodes["reward"], axis=1))
        catch = jnp.mean(
            jnp.max((episodes["reward"] > 0.5).astype(jnp.float32), axis=1))
        alpha = 0.2
        recent_return = jnp.where(
            state.update_step == 0, ep_ret,
            (1 - alpha) * state.recent_return + alpha * ep_ret)
        recent_catch = jnp.where(
            state.update_step == 0, catch,
            (1 - alpha) * state.recent_catch + alpha * catch)

        n_updates = int(c["train_per_collect"])
        mb = int(c["BATCH_SIZE"])

        def one_update(carry, k):
            params, target_params, opt_state, train_count = carry
            batch = replay_sample(buffer, k, mb)
            (_, aux), grads = jax.value_and_grad(self._loss, has_aux=True)(
                params, target_params, batch, jax.random.fold_in(k, 1))
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            train_count = train_count + 1
            sync = (train_count % int(c["TARGET_UPDATE_FREQ"])) == 0
            target_params = jax.tree_util.tree_map(
                lambda t, p: jnp.where(sync, p, t), target_params, params)
            return (params, target_params, opt_state, train_count), aux

        def do_updates(operand):
            return jax.lax.scan(
                one_update, operand, jax.random.split(k_sample, n_updates))

        def skip(operand):
            zeros = {k: jnp.zeros((n_updates,)) for k in self.AUX_KEYS}
            return operand, zeros

        ready = buffer.size >= int(c["learning_starts"])
        (params, target_params, opt_state, train_count), auxes = jax.lax.cond(
            ready, do_updates, skip,
            (state.params, state.target_params, state.opt_state, state.train_count))

        metrics = {k: jnp.mean(v) for k, v in auxes.items()}
        metrics.update(
            episode_reward_mean=ep_ret,
            episode_reward_recent=recent_return,
            catch_rate=recent_catch,
            epsilon=eps,
            buffer_episodes=buffer.size.astype(jnp.float32),
        )
        new_state = QMIXState(
            params=params, target_params=target_params, opt_state=opt_state,
            buffer=buffer, key=key,
            update_step=state.update_step + 1,
            env_steps=env_steps, train_count=train_count,
            recent_return=recent_return, recent_catch=recent_catch,
        )
        return new_state, metrics

    # ------------------------------------------------------------------
    def train_step_from_episodes(self, state: QMIXState, episodes
                                 ) -> Tuple[QMIXState, Dict[str, Array]]:
        """Learner update on externally-collected padded episodes.

        The host-SMAC path: complete episodes arrive from
        :func:`xingtian_tpu.envs.smac_adapter.collect_episodes` (the
        reference streams them from SC2 explorer processes,
        ``learner.py:298-380``) with the same schema the on-device ring
        stores; this is the jitted insert→sample→TD-update step.
        """
        c = self.config
        key, k_sample = jax.random.split(state.key)
        episodes = {k: jnp.asarray(v) for k, v in episodes.items()
                    if k in state.buffer.data}
        buffer = replay_add_batch(state.buffer, episodes)
        steps = jnp.sum(episodes["filled"]).astype(jnp.int32)
        env_steps = state.env_steps + steps

        ep_ret = jnp.mean(jnp.sum(episodes["reward"], axis=1))
        alpha = 0.2
        recent_return = jnp.where(
            state.update_step == 0, ep_ret,
            (1 - alpha) * state.recent_return + alpha * ep_ret)

        n_updates = int(c["train_per_collect"])
        mb = int(c["BATCH_SIZE"])

        def one_update(carry, k):
            params, target_params, opt_state, train_count = carry
            batch = replay_sample(buffer, k, mb)
            (_, aux), grads = jax.value_and_grad(self._loss, has_aux=True)(
                params, target_params, batch, jax.random.fold_in(k, 1))
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            train_count = train_count + 1
            sync = (train_count % int(c["TARGET_UPDATE_FREQ"])) == 0
            target_params = jax.tree_util.tree_map(
                lambda t, p: jnp.where(sync, p, t), target_params, params)
            return (params, target_params, opt_state, train_count), aux

        def do_updates(operand):
            return jax.lax.scan(
                one_update, operand, jax.random.split(k_sample, n_updates))

        def skip(operand):
            zeros = {k: jnp.zeros((n_updates,)) for k in self.AUX_KEYS}
            return operand, zeros

        ready = buffer.size >= int(c["learning_starts"])
        (params, target_params, opt_state, train_count), auxes = jax.lax.cond(
            ready, do_updates, skip,
            (state.params, state.target_params, state.opt_state,
             state.train_count))

        metrics = {k: jnp.mean(v) for k, v in auxes.items()}
        metrics.update(episode_reward_mean=ep_ret,
                       episode_reward_recent=recent_return,
                       buffer_episodes=buffer.size.astype(jnp.float32))
        return state.replace(
            params=params, target_params=target_params, opt_state=opt_state,
            buffer=buffer, key=key, update_step=state.update_step + 1,
            env_steps=env_steps, train_count=train_count,
            recent_return=recent_return,
        ), metrics

    def make_host_act_fn(self, params, epsilon: float = 0.05, seed: int = 0):
        """Batched action-selection callable for the host collector.

        Returns ``act_fn(obs, avail, h, last_action, t) -> (actions, h')``
        with the GRU hidden state threaded through — jitted once, reused
        across episodes (≈ the explorer's per-step inference,
        ``starcraft_qmix.py``).
        """
        rng = np.random.RandomState(seed)

        # ONE jitted greedy per algorithm instance: a fresh jax.jit per
        # collect would re-trace (and re-hit the compile cache through
        # the tunnel) on every learner update — the act_fn closure only
        # carries params/ε/rng around the shared compiled fn
        greedy = getattr(self, "_host_greedy", None)
        if greedy is None:
            @jax.jit
            def greedy(p, obs, avail, h, last_a):
                inputs = self._agent_inputs(obs, last_a)
                q, h2 = self._apply_agent(p["agent"], inputs, h)
                masked = jnp.where(avail > 0, q, -1e9)
                return jnp.argmax(masked, axis=-1), h2
            self._host_greedy = greedy

        H = int(self.config["AGENT_HIDDEN"])

        def act_fn(obs, avail, h, last_a, t):
            if h is None:
                h = jnp.zeros((self.n_agents, H))
            a, h = greedy(params, jnp.asarray(obs, jnp.float32),
                          jnp.asarray(avail, jnp.float32), h,
                          jnp.asarray(last_a, jnp.int32))
            a = np.asarray(a)
            explore = rng.uniform(size=a.shape) < epsilon
            rand = np.stack([
                rng.choice(np.flatnonzero(np.asarray(avail)[i] > 0))
                for i in range(a.shape[0])])
            return np.where(explore, rand, a).astype(np.int32), h

        return act_fn
