"""MuZero — learned-model planning with on-device MCTS.

Parity targets (reference ``xt/algorithm/muzero/muzero.py`` +
``prioritized_replay_buffer_muzero.py`` + ``xt/agent/muzero/mcts.py``):

* acting: MCTS from the current observation, action sampled from root
  visit counts with a temperature (``util.py`` soft_max_sample);
* N-step unroll targets (``make_target``, ``muzero.py:103-123``):
  value = Σ γ^i r + γ^n·(search root value), policy = visit distribution,
  reward = observed reward, for K unroll steps;
* prioritized replay with priority = |search value − value target|
  (``muzero.py:125-146``), sum-tree sampling + importance weights;
* training: unroll the dynamics K steps from the represented root, MSE
  value/reward + CE policy, hidden-gradient scaled ½ (MuZero appendix).

TPU shape: targets are computed *at insert time* (the whole rollout and
its root values are on device), so a buffer entry is a self-contained
training example — sampling is one sum-tree walk + gather, no host
trajectory reconstruction like the reference's pickled deque.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from xingtian_tpu.agents.rollout import EpisodeStats
from xingtian_tpu.models.muzero import MuZeroModel
from xingtian_tpu.ops.mcts import run_mcts, select_action_from_visits
from xingtian_tpu.ops.replay import (
    ReplayState, SumTree, replay_init)
from xingtian_tpu.registry import Registers

Array = jax.Array


@struct.dataclass
class MuZeroState:
    params: dict
    opt_state: object
    env_state: object
    obs: Array
    ep_stats: EpisodeStats
    key: Array
    update_step: Array
    env_steps: Array
    replay: ReplayState
    tree: SumTree


@Registers.algorithm.register(name="MuZero", aliases=("Muzero",))
class MuZero:
    name = "muzero"

    DEFAULTS = dict(
        GAMMA=0.997,
        LR=3e-3,
        BATCH_SIZE=128,
        BUFFER_SIZE=4096,          # positions (power of 2 for the sum tree)
        NUM_SIMULATIONS=30,
        UNROLL_K=5,
        TD_STEPS=10,
        ROLLOUT_T=32,              # env steps per fused train step
        TEMPERATURE=1.0,
        DIRICHLET_ALPHA=0.3,
        EXPLORATION_FRACTION=0.25,
        PER_ALPHA=0.6,             # priority exponent
        PER_BETA=0.4,              # importance-weight exponent
        REANALYZE_FRACTION=0.0,    # opt-in policy reanalyse (see below)
        VALUE_COEF=0.25,
        HIDDEN_DIM=64,
        learning_starts=512,       # positions before training
        train_per_collect=4,
    )

    def __init__(self, model: MuZeroModel, env, config=None):
        cfg = dict(self.DEFAULTS)
        cfg.update(config or {})
        # YAML front-end supplies agent max_steps as ``rollout_steps``
        if "rollout_steps" in cfg and "ROLLOUT_T" not in (config or {}):
            cfg["ROLLOUT_T"] = cfg["rollout_steps"]
        self.config = cfg
        self.model = model
        self.env = env
        self.optimizer = optax.adam(cfg["LR"])
        cap = int(cfg["BUFFER_SIZE"])
        assert cap & (cap - 1) == 0, "BUFFER_SIZE must be a power of 2"
        self.K = int(cfg["UNROLL_K"])
        self.n_td = int(cfg["TD_STEPS"])
        self.T = int(cfg["ROLLOUT_T"])

    # ------------------------------------------------------------------
    def init_state(self, key: Array) -> MuZeroState:
        pkey, ekey, skey = jax.random.split(key, 3)
        params = self.model.init_params(pkey)
        opt_state = self.optimizer.init(params)
        env_state, obs = self.env.reset(ekey)
        # copy: pixel envs return the state's frame buffer as obs by
        # reference; aliased leaves break buffer donation (same guard as
        # Algorithm._init_common)
        obs = jax.tree_util.tree_map(jnp.copy, obs)
        B = obs.shape[0]
        A = self.model.action_dim
        K = self.K
        example = {
            "obs": jnp.zeros(self.model.obs_shape),
            "actions": jnp.zeros((K,), jnp.int32),
            "target_values": jnp.zeros((K + 1,)),
            "target_rewards": jnp.zeros((K,)),
            "target_policies": jnp.zeros((K + 1, A)),
            "mask": jnp.zeros((K + 1,)),     # valid unroll steps
        }
        replay = replay_init(example, int(self.config["BUFFER_SIZE"]))
        return MuZeroState(
            params=params, opt_state=opt_state,
            env_state=env_state, obs=obs,
            ep_stats=EpisodeStats.init(B),
            key=skey,
            update_step=jnp.zeros((), jnp.int32),
            env_steps=jnp.zeros((), jnp.int32),
            replay=replay,
            tree=SumTree.init(int(self.config["BUFFER_SIZE"])),
        )

    # ------------------------------------------------------------------
    def _collect(self, params, env_state, obs, ep_stats, key):
        """T steps of MCTS-driven acting; returns rollout arrays [T, B, ...]."""
        c = self.config

        def body(carry, key_t):
            env_state, obs, stats = carry
            k_mcts, k_act = jax.random.split(key_t)
            out = run_mcts(
                params, self.model, obs, k_mcts,
                num_simulations=int(c["NUM_SIMULATIONS"]),
                discount=float(c["GAMMA"]),
                dirichlet_alpha=float(c["DIRICHLET_ALPHA"]),
                exploration_fraction=float(c["EXPLORATION_FRACTION"]))
            action = select_action_from_visits(
                out.visit_counts, k_act, float(c["TEMPERATURE"]))
            policy = out.visit_counts / jnp.maximum(
                jnp.sum(out.visit_counts, -1, keepdims=True), 1.0)
            env_state, ts = self.env.step(env_state, action)
            stats = stats.update(ts.reward, ts.done)
            return ((env_state, ts.obs, stats),
                    (obs, action, ts.reward, ts.done, policy, out.root_value))

        keys = jax.random.split(key, self.T)
        (env_state, obs, ep_stats), seq = jax.lax.scan(
            body, (env_state, obs, ep_stats.fresh_window()), keys)
        return env_state, obs, ep_stats, seq

    # ------------------------------------------------------------------
    def _make_targets(self, seq):
        """Per-position training examples from a rollout (``make_target``).

        Only positions with a full K-unroll + n-step lookahead window are
        emitted: t ∈ [0, T − K − n).  Episode boundaries inside the
        window cut both the value bootstrap and the unroll mask.
        """
        obs_seq, act_seq, rew_seq, done_seq, pol_seq, rootv_seq = seq
        T, B = rew_seq.shape
        K, n = self.K, self.n_td
        gamma = float(self.config["GAMMA"])
        n_pos = T - K - n
        assert n_pos > 0, "ROLLOUT_T must exceed UNROLL_K + TD_STEPS"

        done_f = done_seq.astype(jnp.float32)
        # alive[t0, t] = 1 while no done in [t0, t) (within-episode mask)
        def win(x, t0, length):
            return jax.lax.dynamic_slice_in_dim(x, t0, length, axis=0)

        def targets_at(t0):
            # masks: cumulative product of (1-done) gives same-episode flags
            d = win(done_f, t0, K + n + 1)                    # [K+n+1, B]
            alive = jnp.cumprod(1.0 - d, axis=0)              # alive AFTER step t0+i
            alive_before = jnp.concatenate(
                [jnp.ones((1, B)), alive[:-1]], axis=0)       # valid at t0+i

            r = win(rew_seq, t0, K + n)                       # [K+n, B]
            rootv = win(rootv_seq, t0, K + n + 1)             # [K+n+1, B]
            pol = win(pol_seq, t0, K + 1)                     # [K+1, B, A]
            acts = win(act_seq, t0, K)                        # [K, B]

            # n-step value target for each unroll offset k = 0..K
            def value_target(k):
                # G = sum_{i=0}^{n-1} γ^i r_{t0+k+i} * alive + γ^n v_root
                idx = jnp.arange(n)
                discounts = gamma ** idx
                rr = jax.lax.dynamic_slice_in_dim(r, k, n, axis=0)
                aa = jax.lax.dynamic_slice_in_dim(alive_before, k, n, axis=0)
                # rewards already stop accruing after done (alive mask)
                g = jnp.sum(discounts[:, None] * rr * aa, axis=0)
                boot_alive = jax.lax.dynamic_slice_in_dim(
                    alive_before, k + n, 1, axis=0)[0]
                g = g + (gamma ** n) * rootv[k + n] * boot_alive
                return g

            tv = jnp.stack([value_target(k) for k in range(K + 1)])  # [K+1, B]
            tr = jax.lax.dynamic_slice_in_dim(r, 0, K, axis=0)       # [K, B]
            mask = jax.lax.dynamic_slice_in_dim(
                alive_before, 0, K + 1, axis=0)                       # [K+1, B]
            return {
                "obs": obs_seq[t0],                                   # [B, obs]
                "actions": jnp.swapaxes(acts, 0, 1),                  # [B, K]
                "target_values": jnp.swapaxes(tv, 0, 1),
                "target_rewards": jnp.swapaxes(tr, 0, 1),
                "target_policies": jnp.swapaxes(pol, 0, 1),
                "mask": jnp.swapaxes(mask, 0, 1),
            }

        per_pos = [targets_at(t0) for t0 in range(n_pos)]
        batch = jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(xs, axis=0), *per_pos)
        # priority = |search value − target value| at k=0 (muzero.py:125-146)
        rootv_flat = jnp.concatenate(
            [rootv_seq[t0] for t0 in range(n_pos)], axis=0)
        prio = jnp.abs(rootv_flat - batch["target_values"][:, 0])
        return batch, prio

    # ------------------------------------------------------------------
    def _reanalyze_batch(self, params, batch, key):
        """Refresh the ROOT policy targets of a sampled batch with fresh
        MCTS under the CURRENT params (MuZero Reanalyse, Schrittwieser et
        al. 2021 — policy component; the reference ships no reanalyse).

        Buffer entries store only the root observation (targets are
        computed at insert time, module docstring), so the k≥1 unroll
        policies and the n-step value bootstraps cannot be recomputed
        without the later observations — this is deliberately the
        policy-at-root variant: stale root search distributions are
        replaced by ``REANALYZE_FRACTION``-weighted fresh ones.  With the
        default fraction 0.0 the batch is returned untouched.
        """
        frac = float(self.config["REANALYZE_FRACTION"])
        if frac <= 0.0:
            return batch
        c = self.config
        out = run_mcts(
            params, self.model, batch["obs"], key,
            num_simulations=int(c["NUM_SIMULATIONS"]),
            discount=float(c["GAMMA"]),
            dirichlet_alpha=float(c["DIRICHLET_ALPHA"]),
            exploration_fraction=float(c["EXPLORATION_FRACTION"]))
        fresh = out.visit_counts / jnp.maximum(
            jnp.sum(out.visit_counts, -1, keepdims=True), 1.0)
        pol = batch["target_policies"]
        root = (1.0 - frac) * pol[:, 0] + frac * fresh
        return {**batch, "target_policies": pol.at[:, 0].set(root)}

    # ------------------------------------------------------------------
    def _loss(self, params, batch, is_weights) -> Tuple[Array, Dict[str, Array]]:
        from xingtian_tpu.models.muzero import scalar_to_support

        c = self.config
        K = self.K
        S = int(getattr(self.model, "support_size", 0))
        out0 = self.model.initial_inference(params, batch["obs"])

        def scale_grad_half(h):
            return 0.5 * h + 0.5 * jax.lax.stop_gradient(h)

        def support_ce(logits, target_scalar):
            """CE between predicted support logits and the two-hot of the
            compressed target (the reference's Atari heads,
            ``muzero_model.py:200-218`` + ``muzero_atari.py:127-145``)."""
            t = scalar_to_support(target_scalar, S)
            return -jnp.sum(t * jax.nn.log_softmax(logits, -1), axis=-1)

        v_losses, p_losses, r_losses = [], [], []
        v_pred0 = out0.value
        hidden = out0.hidden
        logits, v_logits = out0.policy_logits, out0.value_logits
        for k in range(K + 1):
            m = batch["mask"][:, k]
            v_losses.append(m * support_ce(v_logits,
                                           batch["target_values"][:, k]))
            logp = jax.nn.log_softmax(logits, axis=-1)
            p_losses.append(-m * jnp.sum(batch["target_policies"][:, k] * logp, -1))
            if k < K:
                hidden = scale_grad_half(hidden)
                out = self.model.recurrent_inference(
                    params, hidden, batch["actions"][:, k])
                r_losses.append(m * support_ce(
                    out.reward_logits, batch["target_rewards"][:, k]))
                hidden, logits, v_logits = (out.hidden, out.policy_logits,
                                            out.value_logits)

        unroll_scale = 1.0 / K
        v_loss = jnp.stack([v_losses[0]] + [u * unroll_scale for u in v_losses[1:]]).sum(0)
        p_loss = jnp.stack([p_losses[0]] + [u * unroll_scale for u in p_losses[1:]]).sum(0)
        r_loss = jnp.stack(r_losses).sum(0) * unroll_scale
        per_example = c["VALUE_COEF"] * v_loss + p_loss + r_loss
        loss = jnp.mean(is_weights * per_example)
        new_prio = jnp.abs(v_pred0 - batch["target_values"][:, 0])
        return loss, {"loss": loss, "value_loss": jnp.mean(v_loss),
                      "policy_loss": jnp.mean(p_loss),
                      "reward_loss": jnp.mean(r_loss),
                      "new_priority": new_prio}

    # ------------------------------------------------------------------
    def train_step(self, state: MuZeroState) -> Tuple[MuZeroState, Dict[str, Array]]:
        c = self.config
        key, k_collect, k_train = jax.random.split(state.key, 3)

        env_state, obs, ep_stats, seq = self._collect(
            state.params, state.env_state, state.obs, state.ep_stats, k_collect)
        batch_new, prio = self._make_targets(seq)

        # ring-insert + matching sum-tree priority writes
        n_new = prio.shape[0]
        cap = state.replay.capacity
        idx = (state.replay.insert_pos + jnp.arange(n_new, dtype=jnp.int32)) % cap
        data = jax.tree_util.tree_map(
            lambda buf, val: buf.at[idx].set(val), state.replay.data, batch_new)
        replay = ReplayState(
            data=data,
            insert_pos=(state.replay.insert_pos + n_new) % cap,
            size=jnp.minimum(state.replay.size + n_new, cap))
        alpha = float(c["PER_ALPHA"])
        tree = state.tree.update(idx, jnp.power(prio + 1e-3, alpha))

        mb = int(c["BATCH_SIZE"])
        beta = float(c["PER_BETA"])

        def one_update(carry, k):
            params, opt_state, tree = carry
            k_sample, k_reanalyze = jax.random.split(k)
            sample_idx, sample_p = tree.sample(k_sample, mb)
            batch = jax.tree_util.tree_map(
                lambda buf: buf[sample_idx], replay.data)
            batch = self._reanalyze_batch(params, batch, k_reanalyze)
            probs = sample_p / jnp.maximum(tree.total, 1e-9)
            w = jnp.power(
                1.0 / (jnp.maximum(replay.size, 1) * jnp.maximum(probs, 1e-9)),
                beta)
            w = w / jnp.maximum(jnp.max(w), 1e-9)
            (_, aux), grads = jax.value_and_grad(self._loss, has_aux=True)(
                params, batch, w)
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            tree = tree.update(
                sample_idx, jnp.power(aux.pop("new_priority") + 1e-3, alpha))
            return (params, opt_state, tree), aux

        n_updates = int(c["train_per_collect"])

        def do_updates(operand):
            return jax.lax.scan(
                one_update, operand, jax.random.split(k_train, n_updates))

        def skip(operand):
            zeros = {k: jnp.zeros((n_updates,))
                     for k in ("loss", "value_loss", "policy_loss", "reward_loss")}
            return operand, zeros

        ready = replay.size >= int(c["learning_starts"])
        (params, opt_state, tree), auxes = jax.lax.cond(
            ready, do_updates, skip, (state.params, state.opt_state, tree))

        B = state.obs.shape[0]
        metrics = {k: jnp.mean(v) for k, v in auxes.items()}
        metrics.update(ep_stats.summary())
        metrics["buffer_size"] = replay.size.astype(jnp.float32)
        new_state = MuZeroState(
            params=params, opt_state=opt_state,
            env_state=env_state, obs=obs, ep_stats=ep_stats, key=key,
            update_step=state.update_step + 1,
            env_steps=state.env_steps + self.T * B,
            replay=replay, tree=tree)
        return new_state, metrics
