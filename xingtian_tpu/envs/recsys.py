"""Recommender ("info flow") environment — pure JAX.

The reference's info-flow DQN (``xt/algorithm/dqn/dqn_infoflw_alg.py``)
serves recommendation sessions: state = {user features, clicked/viewed
item histories, candidate items}, action = which candidate to show,
reward = click.  The concrete env is user-supplied in the reference; this
module provides a jittable synthetic version with the same observation
contract so the algorithm + model pipeline is exercised end-to-end.

Dynamics: each user has a latent preference vector; showing item ``i``
clicks with probability ``sigmoid(scale·(u·f_i + bias))``.  Clicked items
enter the click history, skipped ones the view history; sessions last
``session_len`` impressions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from xingtian_tpu.registry import Registers
from xingtian_tpu.envs.core import Discrete, EnvSpec, JaxEnv, TimeStep


@struct.dataclass
class InfoFlowState:
    user: jax.Array           # [user_dim] observable user features
    latent: jax.Array         # [item_dim] hidden preference vector
    clicked: jax.Array        # [hist_len, item_dim] ring of clicked items
    viewed: jax.Array         # [hist_len, item_dim] ring of viewed items
    clicked_pos: jax.Array
    viewed_pos: jax.Array
    candidates: jax.Array     # [n_candidates, item_dim]
    time: jax.Array
    key: jax.Array


@Registers.env.register(name="InfoFlow", aliases=("InfoFlowRec",))
class InfoFlowEnv(JaxEnv):
    def __init__(self, user_dim: int = 16, item_dim: int = 16,
                 n_candidates: int = 10, hist_len: int = 8,
                 session_len: int = 20, click_scale: float = 3.0,
                 user_noise: float = 0.3, **_kw):
        if user_dim != item_dim:
            raise ValueError(
                "user features are a noisy view of the latent preference; "
                "user_dim must equal item_dim")
        self.user_noise = float(user_noise)
        self.user_dim = user_dim
        self.item_dim = item_dim
        self.n_candidates = n_candidates
        self.hist_len = hist_len
        self.click_scale = click_scale
        self.spec = EnvSpec(
            name="InfoFlow",
            obs_shape=(user_dim,),          # nominal; obs is a dict pytree
            obs_dtype=jnp.float32,
            action_spec=Discrete(n_candidates),
            max_steps=session_len,
        )

    def _obs(self, s: InfoFlowState):
        return {
            "user": s.user,
            "clicked": s.clicked,
            "viewed": s.viewed,
            "candidates": s.candidates,
        }

    def _sample_candidates(self, key, latent):
        # candidates correlated with the user so good actions exist
        base = jax.random.normal(key, (self.n_candidates, self.item_dim))
        pull = jnp.linspace(0.0, 0.6, self.n_candidates)[:, None]
        return base * (1 - pull) + latent[None, :] * pull

    def _reset(self, key):
        key, k_u, k_l, k_c = jax.random.split(key, 4)
        latent = jax.random.normal(k_l, (self.item_dim,))
        latent = latent / jnp.linalg.norm(latent)
        # observable user features: noisy view of the true preference (a
        # learnable task; histories sharpen the estimate within a session)
        user = latent + self.user_noise * jax.random.normal(
            k_u, (self.user_dim,))
        state = InfoFlowState(
            user=user,
            latent=latent,
            clicked=jnp.zeros((self.hist_len, self.item_dim)),
            viewed=jnp.zeros((self.hist_len, self.item_dim)),
            clicked_pos=jnp.zeros((), jnp.int32),
            viewed_pos=jnp.zeros((), jnp.int32),
            candidates=self._sample_candidates(k_c, latent),
            time=jnp.zeros((), jnp.int32),
            key=key,
        )
        return state, self._obs(state)

    def _step(self, s: InfoFlowState, action):
        item = s.candidates[jnp.asarray(action, jnp.int32)]
        key, k_click, k_cand = jax.random.split(s.key, 3)
        affinity = self.click_scale * jnp.dot(s.latent, item) - 1.0
        p_click = jax.nn.sigmoid(affinity)
        click = jax.random.bernoulli(k_click, p_click)

        clicked = jnp.where(
            click,
            s.clicked.at[s.clicked_pos % self.hist_len].set(item),
            s.clicked)
        viewed = jnp.where(
            click, s.viewed,
            s.viewed.at[s.viewed_pos % self.hist_len].set(item))
        time = s.time + 1
        new_state = InfoFlowState(
            user=s.user, latent=s.latent,
            clicked=clicked, viewed=viewed,
            clicked_pos=s.clicked_pos + click.astype(jnp.int32),
            viewed_pos=s.viewed_pos + (1 - click.astype(jnp.int32)),
            candidates=self._sample_candidates(k_cand, s.latent),
            time=time, key=key,
        )
        done = time >= self.spec.max_steps
        return new_state, TimeStep(
            obs=self._obs(new_state),
            reward=click.astype(jnp.float32),
            done=done,
            info={"truncated": done},
        )
