"""PPO — clipped-surrogate policy optimization, fused rollout+update.

Loss parity with the reference (``xt/model/ppo/__init__.py:4-25``):

* actor: −mean(min(ρ·A, clip(ρ, 1±ε)·A)) − ent_coef·mean(H)
* critic: 0.5·mean(max((V−V̂)², (clip(V−V_old, ±vf_clip)+V_old−V̂)²))
* total: actor + critic_coef·critic; Adam + global-norm clip 5.0
  (``xt/model/ppo/ppo.py:96-102``).

GAE runs on device (``xingtian_tpu/ops/gae.py`` ≈ agent-side numpy loop
``xt/agent/ppo/ppo.py:88-107``), minibatch SGD epochs replicate
``model/ppo/ppo.py:111-132`` (shuffle per epoch, minibatches of
``BATCH_SIZE``) as nested ``lax.scan`` so the whole
rollout→GAE→epochs pipeline is one XLA program — there is no host in the
loop at all, unlike the reference where trajectories cross 3 process
boundaries per update (SURVEY §3.2).

Config keys keep the reference's names (``xt/algorithm/ppo/
default_config.py`` + ``xt/model/ppo/default_config.py``).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from xingtian_tpu.agents.rollout import rollout
from xingtian_tpu.algos.base import Algorithm, AlgoState
from xingtian_tpu.models.distributions import make_dist
from xingtian_tpu.ops.gae import gae
from xingtian_tpu.registry import Registers

Array = jax.Array

# Hyperparameters that live in the train state as traced scalars rather
# than compile-time constants.  This costs nothing at runtime and lets a
# PBT population vmap over members with different hypers in ONE compiled
# program (the reference swaps whole algorithm instances instead,
# ``xt/algorithm/pbt.py:299-303``).
DYNAMIC_HYPERS = ("LR", "ENTROPY_LOSS", "LOSS_CLIPPING", "GAMMA", "LAM")


@struct.dataclass
class PPOState(AlgoState):
    hypers: dict = None   # {name: f32 scalar} for DYNAMIC_HYPERS


@Registers.algorithm.register(name="PPO")
class PPO(Algorithm):
    name = "ppo"
    async_flag = False   # parity: ``ppo/ppo.py:50``

    DEFAULTS = dict(
        GAMMA=0.99,
        LAM=0.95,
        BATCH_SIZE=200,          # minibatch size (reference semantics)
        CRITIC_LOSS_COEF=1.0,
        ENTROPY_LOSS=1e-3,
        LOSS_CLIPPING=0.2,
        LR=3e-4,
        NUM_SGD_ITER=4,
        MAX_GRAD_NORM=5.0,
        VF_CLIP=5.0,
        NORMALIZE_ADV=False,     # reference does not normalize advantages
        rollout_steps=128,       # agent_config.max_steps analog
    )

    def __init__(self, model, env, config=None):
        super().__init__(model, env, config)
        c = self.config
        # LR applied dynamically from state.hypers (see DYNAMIC_HYPERS)
        self.optimizer = optax.chain(
            optax.clip_by_global_norm(c["MAX_GRAD_NORM"]),
            optax.scale_by_adam(),
        )
        self.rollout_steps = int(c["rollout_steps"])

    # ------------------------------------------------------------------
    def default_hypers(self):
        return {k: jnp.asarray(float(self.config[k]), jnp.float32)
                for k in DYNAMIC_HYPERS}

    def init_state(self, key: Array, hypers=None) -> PPOState:
        pkey, skey = jax.random.split(key)
        params = self.model.init_params(pkey)
        opt_state = self.optimizer.init(params)
        base = self._init_common(skey, params, opt_state)
        return PPOState(
            **{f: getattr(base, f) for f in base.__dataclass_fields__},
            hypers=hypers if hypers is not None else self.default_hypers())

    # ------------------------------------------------------------------
    def policy_fn(self, params, obs, key):
        """Sample action + (logp, value) — ≈ ``PPO.predict`` sess.run
        (``model/ppo/ppo.py:104-109``)."""
        pi_params, value = self.model.apply(params, obs)
        dist = make_dist(self.model.action_type, pi_params, self.model.action_dim)
        action = dist.sample(key)
        return action, {"logp": dist.log_prob(action), "value": value}

    # ------------------------------------------------------------------
    def _loss(self, params, batch, hypers) -> Tuple[Array, Dict[str, Array]]:
        c = self.config
        obs, action, old_logp, adv, old_v, target_v = batch
        pi_params, value = self.model.apply(params, obs)
        dist = make_dist(self.model.action_type, pi_params, self.model.action_dim)

        logp = dist.log_prob(action)
        ratio = jnp.exp(logp - old_logp)
        clip_ratio = hypers["LOSS_CLIPPING"]
        surr = jnp.mean(jnp.minimum(
            ratio * adv,
            jnp.clip(ratio, 1.0 - clip_ratio, 1.0 + clip_ratio) * adv,
        ))
        entropy = jnp.mean(dist.entropy())
        actor_loss = -surr - hypers["ENTROPY_LOSS"] * entropy

        vf1 = jnp.square(value - target_v)
        v_clipped = old_v + jnp.clip(value - old_v, -c["VF_CLIP"], c["VF_CLIP"])
        vf2 = jnp.square(v_clipped - target_v)
        critic_loss = 0.5 * jnp.mean(jnp.maximum(vf1, vf2))

        loss = actor_loss + c["CRITIC_LOSS_COEF"] * critic_loss
        aux = {
            "loss": loss, "actor_loss": actor_loss, "critic_loss": critic_loss,
            "entropy": entropy,
            "approx_kl": jnp.mean(old_logp - logp),
            "clip_frac": jnp.mean(
                (jnp.abs(ratio - 1.0) > clip_ratio).astype(jnp.float32)),
        }
        return loss, aux

    # ------------------------------------------------------------------
    def _fit(self, state: PPOState, traj, train_key: Array
             ) -> Tuple[Any, Any, Dict[str, Array]]:
        """GAE + minibatch SGD epochs over one on-policy ``[T, B]``
        trajectory (``extras`` must carry behaviour ``logp``/``value``).
        Shared between the fused on-device step and the host-farm step —
        the learner math is identical either way (≈ ``model/ppo/
        ppo.py:111-132`` minibatch SGD fed by agent-side GAE fields,
        ``xt/agent/ppo/ppo.py:77-107``)."""
        c = self.config
        T, B = traj.reward.shape

        # bootstrap + GAE on device
        _, last_value = self.model.apply(state.params, traj.last_obs)
        adv, target_v = gae(
            traj.reward, traj.extras["value"], last_value, traj.done,
            gamma=state.hypers["GAMMA"], lam=state.hypers["LAM"],
        )
        if c["NORMALIZE_ADV"]:
            adv = (adv - jnp.mean(adv)) / (jnp.std(adv) + 1e-8)

        raw = (traj.obs, traj.action, traj.extras["logp"], adv,
               traj.extras["value"], target_v)
        n = T * B
        mb = min(int(c["BATCH_SIZE"]), n)

        def sgd_minibatch(carry, batch):
            params, opt_state = carry
            (_, aux), grads = jax.value_and_grad(
                self._loss, has_aux=True)(params, batch, state.hypers)
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            # dynamic learning rate (adam's -lr scaling applied here)
            updates = jax.tree_util.tree_map(
                lambda u: -state.hypers["LR"] * u, updates)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), aux

        if c.get("SHARD_LOCAL_MINIBATCH"):
            # Multi-chip minibatching: the default global-permutation
            # gather below indexes randomly across the dp-sharded env
            # axis, which forces XLA to all-gather the WHOLE rollout per
            # minibatch (measured 2× per-process cost at 2 processes).
            # Here each minibatch is a random set of TIME steps × ALL
            # envs: the time axis is unsharded (gather is local) and the
            # env axis is untouched (stays sharded), so the SGD phase
            # moves zero rollout bytes between devices.  Opt-in because
            # minibatch composition differs from the reference's global
            # shuffle (``model/ppo/ppo.py:111-132``) — same math, dp-
            # friendly sampling, like Podracer/Anakin-style learners.
            n_mb = max(1, n // mb)
            t_mb = max(1, T // n_mb)
            n_mb = T // t_mb

            def mb_of(x, idx_t):
                sl = jnp.swapaxes(x[idx_t], 0, 1)      # [B, t_mb, ...]
                return sl.reshape((B * t_mb,) + sl.shape[2:])

            def epoch(carry, epoch_key):
                perm_t = jax.random.permutation(epoch_key, T)[
                    : n_mb * t_mb].reshape(n_mb, t_mb)

                def minibatch(carry, idx_t):
                    return sgd_minibatch(
                        carry, tuple(mb_of(x, idx_t) for x in raw))

                return jax.lax.scan(minibatch, carry, perm_t)
        else:
            # reference semantics: full shuffle over all T*B rows
            # (``model/ppo/ppo.py:111-132``)
            def flat(x):
                return x.reshape((T * B,) + x.shape[2:])

            data = tuple(map(flat, raw))
            n_mb = n // mb
            n_used = n_mb * mb

            def epoch(carry, epoch_key):
                perm = jax.random.permutation(epoch_key, n)[:n_used]

                def minibatch(carry, idx):
                    return sgd_minibatch(carry, tuple(x[idx] for x in data))

                idxs = perm.reshape(n_mb, mb)
                return jax.lax.scan(minibatch, carry, idxs)

        epoch_keys = jax.random.split(train_key, int(c["NUM_SGD_ITER"]))
        (params, opt_state), auxes = jax.lax.scan(
            epoch, (state.params, state.opt_state), epoch_keys)
        metrics = {k: jnp.mean(v) for k, v in auxes.items()}
        return params, opt_state, metrics

    # ------------------------------------------------------------------
    def train_step(self, state: AlgoState) -> Tuple[AlgoState, Dict[str, Array]]:
        T = self.rollout_steps

        key, rollout_key, train_key = jax.random.split(state.key, 3)

        env_state, last_obs, ep_stats, traj = rollout(
            self.env, self._policy, state.params,
            state.env_state, state.obs, state.ep_stats, rollout_key, T,
        )
        traj = self._post_traj(traj)
        B = traj.reward.shape[1]

        params, opt_state, metrics = self._fit(state, traj, train_key)
        metrics.update(ep_stats.summary())
        new_state = state.replace(
            params=params,
            opt_state=opt_state,
            env_state=env_state,
            obs=last_obs,
            ep_stats=ep_stats,
            key=key,
            update_step=state.update_step + 1,
            env_steps=state.env_steps + T * B,
        )
        return new_state, metrics

    # ------------------------------------------------------------------
    def train_step_from_batch(self, state: PPOState, traj
                              ) -> Tuple[PPOState, Dict[str, Array]]:
        """Learner update on an externally-collected on-policy batch.

        The host-env-farm path for the reference's flagship deployment —
        PPO over explorer-driven native simulators
        (``examples/breakout_ppo.yaml`` + ``xt/framework/explorer.py:
        57-93``).  PPO is on-policy (``async_flag=False``, ``xt/algorithm/
        ppo/ppo.py:50``), so the farm must collect in sync-epoch mode:
        behaviour params frozen for exactly one segment per env, update,
        refresh, release the next epoch (:class:`~xingtian_tpu.runtime.
        farm_trainer.FarmTrainer` enforces the single-policy-version
        invariant).  ``traj.extras`` must carry the behaviour ``logp`` and
        ``value`` (:func:`~xingtian_tpu.runtime.export.
        make_behaviour_policy` ships both).
        """
        traj = self.restack_pixels(traj)   # slim pixel transport → stacks
        T, B = traj.reward.shape
        key, train_key = jax.random.split(state.key)
        params, opt_state, metrics = self._fit(state, traj, train_key)
        return state.replace(
            params=params, opt_state=opt_state, key=key,
            update_step=state.update_step + 1,
            env_steps=state.env_steps + T * B,
        ), metrics
