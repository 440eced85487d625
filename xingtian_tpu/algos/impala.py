"""IMPALA — V-trace actor–learner with controlled policy staleness.

Parity targets (reference ``xt/algorithm/impala/impala_opt.py`` +
``xt/model/impala/impala_cnn_opt.py``):

* V-trace from behaviour/target logits (``vtrace.py:39-115``) — here the
  ``lax.scan`` form in :mod:`xingtian_tpu.ops.vtrace`;
* loss = Σ ce·pg_adv + 0.5·(0.5·Σ(vs−V)²) + 0.01·(−Σ entropy)
  (``impala_cnn_opt.py:300-351``), reward clip ±1 (``:193``), Adam or
  centered RMSProp(decay .99, eps .1) + global-norm clip (``:198-217``);
* the async actor/learner split with ``sync_model_interval``
  (``xt/agent/atari_impala_opt.py:41-42,111-128``): in the reference,
  explorers keep acting on weights that lag the learner by up to
  ``sync_model_interval`` train steps.  Here the same semantics live
  *inside one program*: a second params pytree (``actor_params``) collects
  the rollout and is refreshed from the learner params every
  ``sync_model_interval`` updates — off-policy-ness is real (V-trace has
  actual work to do) but no weights ever cross a process boundary.

Time-major [T, B] throughout (≈ ``split_batches``,
``impala_cnn_opt.py:167-196``).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from xingtian_tpu.agents.rollout import rollout
from xingtian_tpu.algos.base import Algorithm, AlgoState
from xingtian_tpu.models.distributions import make_dist
from xingtian_tpu.ops.vtrace import vtrace_from_logits
from xingtian_tpu.registry import Registers

Array = jax.Array


def linear_cosine_decay(lr0: float, decay_steps: float,
                        num_periods: float = 0.5, alpha: float = 0.0,
                        beta: float = 0.001):
    """TF1 ``linear_cosine_decay`` as an optax schedule."""
    def schedule(step):
        t = jnp.minimum(step.astype(jnp.float32), decay_steps) / decay_steps
        linear = 1.0 - t
        cosine = 0.5 * (1.0 + jnp.cos(jnp.pi * 2.0 * num_periods * t))
        return lr0 * ((alpha + linear) * cosine + beta)
    return schedule


# Hyperparameters carried as traced scalars in the state so a PBT
# population vmaps over members with different values (the reference's
# PBT mutates LR/grad_norm_clip for IMPALA, ``examples/evolution/
# pbt_breakout_impala.yaml`` — grad_norm_clip stays static here because
# optax's clip is a compile-time parameter).
DYNAMIC_HYPERS = ("LR", "ENTROPY_COEF", "GAMMA")


@struct.dataclass
class IMPALAState(AlgoState):
    actor_params: dict = None     # lagged params driving the rollout
    hypers: dict = None           # {name: f32 scalar} for DYNAMIC_HYPERS


@Registers.algorithm.register(name="IMPALA", aliases=("IMPALAOpt",))
class IMPALA(Algorithm):
    name = "impala"
    async_flag = False   # parity: IMPALAOpt sets async_flag=False (impala_opt.py:52)

    DEFAULTS = dict(
        GAMMA=0.99,
        LR=0.0003,
        BATCH_SIZE=512,            # parity name (impala default_config.py)
        ENTROPY_COEF=0.01,         # impala_cnn_opt.py:351
        VALUE_COEF=0.5,            # outer 0.5 on the 0.5*sum-of-squares baseline loss
        GRAD_NORM_CLIP=40.0,       # deepmind default; reference exposes grad_norm_clip
        OPT_TYPE="adam",           # adam | rmsprop (impala_cnn_opt.py:205-210)
        REWARD_CLIP=1.0,           # clip_by_value(rewards, -1, 1) (:193)
        sync_model_interval=2,     # pong_impala_speedup.yaml
        rollout_steps=50,          # sample_batch_step analog
        NORMALIZE_BY_N=True,       # divide sum-losses by T*B (keeps LR scale
                                   # invariant to batch; set False for the
                                   # reference's raw-sum behaviour)
    )

    def __init__(self, model, env, config=None):
        # the reference names this knob ENTROPY_LOSS (impala
        # default_config.py:2); IMPALA-family YAMLs in the wild also say
        # ENTROPY_COST — accept both so the knob is never silently dropped
        if config:
            config = dict(config)
            for alias in ("ENTROPY_COST", "ENTROPY_LOSS"):
                if alias in config and "ENTROPY_COEF" not in config:
                    config["ENTROPY_COEF"] = config.pop(alias)
                else:
                    config.pop(alias, None)
        super().__init__(model, env, config)
        c = self.config
        # LR applied dynamically from state.hypers (see DYNAMIC_HYPERS);
        # with LR_SCHEDULE, hypers["LR"] scales the unit-amplitude schedule
        # (tf.train.linear_cosine_decay parity, impala_cnn_opt.py:276-285)
        self._lr_schedule = None
        if c.get("LR_SCHEDULE"):
            self._lr_schedule = linear_cosine_decay(
                1.0, decay_steps=float(c.get("DECAY_STEP", 20000.0)))
        if c["OPT_TYPE"] == "rmsprop":
            opt = optax.scale_by_stddev(decay=0.99, eps=0.1)  # centered RMS
        else:
            opt = optax.scale_by_adam()
        self.optimizer = optax.chain(
            optax.clip_by_global_norm(c["GRAD_NORM_CLIP"]), opt)
        self.rollout_steps = int(c["rollout_steps"])

    def _effective_lr(self, hypers, update_step):
        lr = hypers["LR"]
        if self._lr_schedule is not None:
            lr = lr * self._lr_schedule(update_step)
        return lr

    # ------------------------------------------------------------------
    def default_hypers(self):
        return {k: jnp.asarray(float(self.config[k]), jnp.float32)
                for k in DYNAMIC_HYPERS}

    def init_state(self, key: Array, hypers=None) -> IMPALAState:
        pkey, skey = jax.random.split(key)
        params = self.model.init_params(pkey)
        opt_state = self.optimizer.init(params)
        base = self._init_common(skey, params, opt_state)
        return IMPALAState(
            **{f: getattr(base, f) for f in base.__dataclass_fields__},
            actor_params=jax.tree_util.tree_map(jnp.copy, params),
            hypers=hypers if hypers is not None else self.default_hypers(),
        )

    # ------------------------------------------------------------------
    def policy_fn(self, actor_params, obs, key):
        logits, value = self.model.apply(actor_params, obs)
        dist = make_dist(self.model.action_type, logits, self.model.action_dim)
        action = dist.sample(key)
        return action, {"logits": logits}

    # ------------------------------------------------------------------
    def _loss(self, params, traj, behaviour_logits, discounts, rewards, hypers):
        """V-trace loss over the whole time-major [T, B] batch."""
        c = self.config
        T, B = rewards.shape
        obs_flat = traj.obs.reshape((T * B,) + traj.obs.shape[2:])
        logits_flat, values_flat = self.model.apply(params, obs_flat)
        target_logits = logits_flat.reshape(T, B, -1)
        values = values_flat.reshape(T, B)
        _, bootstrap = self.model.apply(params, traj.last_obs)

        vt = vtrace_from_logits(
            behaviour_logits, target_logits, traj.action,
            discounts, rewards, values, bootstrap)

        logp_all = jax.nn.log_softmax(target_logits, axis=-1)
        ce = -jnp.take_along_axis(
            logp_all, traj.action[..., None].astype(jnp.int32), axis=-1)[..., 0]
        pi_loss = jnp.sum(ce * vt.pg_advantages)
        val_loss = 0.5 * jnp.sum(jnp.square(vt.vs - values))
        entropy = jnp.sum(-jnp.exp(logp_all) * logp_all, axis=-1)
        ent_loss = -jnp.sum(entropy)

        loss = pi_loss + c["VALUE_COEF"] * val_loss + hypers["ENTROPY_COEF"] * ent_loss
        if c["NORMALIZE_BY_N"]:
            loss = loss / (T * B)
        aux = {
            "loss": loss,
            "pi_loss": pi_loss / (T * B),
            "value_loss": val_loss / (T * B),
            "entropy": jnp.mean(entropy),
            "mean_rho": jnp.mean(jnp.exp(
                jnp.take_along_axis(logp_all, traj.action[..., None].astype(jnp.int32),
                                    axis=-1)[..., 0]
                - jnp.take_along_axis(jax.nn.log_softmax(behaviour_logits, -1),
                                      traj.action[..., None].astype(jnp.int32),
                                      axis=-1)[..., 0])),
        }
        return loss, aux

    # ------------------------------------------------------------------
    def train_step(self, state: IMPALAState) -> Tuple[IMPALAState, Dict[str, Array]]:
        c = self.config
        T = self.rollout_steps

        key, rollout_key = jax.random.split(state.key)

        # rollout under the LAGGED actor params — real off-policy staleness
        env_state, last_obs, ep_stats, traj = rollout(
            self.env, self._policy, state.actor_params,
            state.env_state, state.obs, state.ep_stats, rollout_key, T,
        )
        traj = self._post_traj(traj)

        rc = float(c["REWARD_CLIP"])
        rewards = jnp.clip(traj.reward, -rc, rc) if rc > 0 else traj.reward
        discounts = (1.0 - traj.done.astype(jnp.float32)) * state.hypers["GAMMA"]

        (_, aux), grads = jax.value_and_grad(self._loss, has_aux=True)(
            state.params, traj, traj.extras["logits"], discounts, rewards,
            state.hypers)
        updates, opt_state = self.optimizer.update(grads, state.opt_state, state.params)
        updates = jax.tree_util.tree_map(
            lambda u: -self._effective_lr(state.hypers, state.update_step) * u,
            updates)
        params = optax.apply_updates(state.params, updates)

        update_step = state.update_step + 1
        # refresh the actors' weights every sync_model_interval learner steps
        sync = (update_step % int(c["sync_model_interval"])) == 0
        actor_params = jax.tree_util.tree_map(
            lambda a, p: jnp.where(sync, p, a), state.actor_params, params)

        B = traj.reward.shape[1]
        metrics = dict(aux)
        metrics.update(ep_stats.summary())
        new_state = state.replace(
            params=params, opt_state=opt_state,
            env_state=env_state, obs=last_obs, ep_stats=ep_stats, key=key,
            update_step=update_step,
            env_steps=state.env_steps + T * B,
            actor_params=actor_params,
        )
        return new_state, metrics

    # ------------------------------------------------------------------
    def train_step_from_batch(self, state: IMPALAState, traj
                              ) -> Tuple[IMPALAState, Dict[str, Array]]:
        """Learner update on an externally-collected time-major batch.

        This is the host-env-farm path: in the reference, trajectories
        from explorer processes arrive through broker queues and the
        learner trains on whatever was behaviour-collected
        (``learner.py:298-380``); here segments from
        :class:`~xingtian_tpu.envs.async_farm.AsyncTrajectoryFarm` become
        a :class:`Trajectory` (``batch_to_trajectory``) and this method is
        the jitted learner step.  ``traj.extras['logits']`` must carry the
        behaviour logits for the V-trace correction.
        """
        traj = self.restack_pixels(traj)   # slim pixel transport → stacks
        c = self.config
        rc = float(c["REWARD_CLIP"])
        rewards = jnp.clip(traj.reward, -rc, rc) if rc > 0 else traj.reward
        discounts = (1.0 - traj.done.astype(jnp.float32)) * state.hypers["GAMMA"]

        (_, aux), grads = jax.value_and_grad(self._loss, has_aux=True)(
            state.params, traj, traj.extras["logits"], discounts, rewards,
            state.hypers)
        updates, opt_state = self.optimizer.update(
            grads, state.opt_state, state.params)
        updates = jax.tree_util.tree_map(
            lambda u: -self._effective_lr(state.hypers, state.update_step) * u,
            updates)
        params = optax.apply_updates(state.params, updates)

        update_step = state.update_step + 1
        sync = (update_step % int(c["sync_model_interval"])) == 0
        actor_params = jax.tree_util.tree_map(
            lambda a, p: jnp.where(sync, p, a), state.actor_params, params)

        T, B = traj.reward.shape
        return state.replace(
            params=params, opt_state=opt_state,
            update_step=update_step,
            env_steps=state.env_steps + T * B,
            actor_params=actor_params,
        ), dict(aux)

