"""Info-flow recommendation Q model (``DqnInfoFlowModel`` parity,
reference ``xt/model/dqn/dqn_rec_model.py``): multi-tower network scoring
every candidate item against a state embedding built from user features
and mean-pooled click/view histories.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from xingtian_tpu.registry import Registers

Array = jax.Array


class RecQNetwork(nn.Module):
    """Q(state, item) for every candidate at once.

    obs dict: user [U], clicked [H, I], viewed [H, I], candidates [C, I]
    (leading batch dims allowed) → Q [.., C].
    """

    embed_dim: int = 64

    @nn.compact
    def __call__(self, obs: Dict[str, Array]) -> Array:
        user = obs["user"]
        clicked = jnp.mean(obs["clicked"], axis=-2)
        viewed = jnp.mean(obs["viewed"], axis=-2)
        state_in = jnp.concatenate([user, clicked, viewed], axis=-1)
        state_emb = nn.relu(nn.Dense(self.embed_dim, name="state_l1")(state_in))
        state_emb = nn.Dense(self.embed_dim, name="state_l2")(state_emb)

        item_emb = nn.relu(nn.Dense(self.embed_dim, name="item_l1")(obs["candidates"]))
        item_emb = nn.Dense(self.embed_dim, name="item_l2")(item_emb)

        # broadcast state against the candidate axis, score each pair
        s = jnp.broadcast_to(
            state_emb[..., None, :], item_emb.shape[:-1] + (self.embed_dim,))
        pair = jnp.concatenate([s, item_emb, s * item_emb], axis=-1)
        h = nn.relu(nn.Dense(self.embed_dim, name="q_l1")(pair))
        return nn.Dense(1, name="q_head")(h)[..., 0]


class RecModelSpec:
    """Duck-typed ModelSpec over dict observations."""

    kind = "q"
    action_type = "Value"

    def __init__(self, user_dim: int, item_dim: int, n_candidates: int,
                 hist_len: int, embed_dim: int = 64):
        self.module = RecQNetwork(embed_dim=embed_dim)
        self.user_dim = user_dim
        self.item_dim = item_dim
        self.n_candidates = n_candidates
        self.hist_len = hist_len
        self.action_dim = n_candidates
        self.obs_shape = (user_dim,)          # nominal
        self.obs_dtype = jnp.float32

    def obs_example(self) -> Dict[str, Array]:
        return {
            "user": jnp.zeros((self.user_dim,)),
            "clicked": jnp.zeros((self.hist_len, self.item_dim)),
            "viewed": jnp.zeros((self.hist_len, self.item_dim)),
            "candidates": jnp.zeros((self.n_candidates, self.item_dim)),
        }

    def init_params(self, key: Array):
        dummy = jax.tree_util.tree_map(
            lambda x: x[None], self.obs_example())
        return self.module.init(key, dummy)

    def apply(self, params, obs):
        return self.module.apply(params, obs)


@Registers.model.register(name="DqnRecModel", aliases=("DqnInfoFlowModel",))
def dqn_rec_model(state_dim=None, action_dim=10, model_config=None, **_kw):
    cfg = dict(model_config or {})
    return RecModelSpec(
        user_dim=int(cfg.get("user_dim", 8)),
        item_dim=int(cfg.get("item_dim", 16)),
        n_candidates=int(action_dim),
        hist_len=int(cfg.get("hist_len", 8)),
        embed_dim=int(cfg.get("embed_dim", 64)),
    )
