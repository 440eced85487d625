"""QMIX networks — recurrent per-agent Q net + monotonic mixing network.

Parity with the reference's TF graph implementation
(``xt/model/qmix/qmix_tf.py``, pymarl-derived): a parameter-shared
GRU agent network (obs ⊕ last-action-one-hot ⊕ agent-id-one-hot → GRU →
per-action Q) and a hypernetwork mixer whose weights are generated from
the global state with absolute-value monotonicity constraints
(``xt/algorithm/qmix/qmix.py:161-230``).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


class QMixAgentNet(nn.Module):
    """GRU agent network, parameters shared across agents.

    Input: per-agent feature vector (caller concatenates obs, previous
    action one-hot, and agent-id one-hot — the pymarl convention the
    reference follows).  Carries an explicit GRU hidden state.
    """

    n_actions: int
    hidden_dim: int = 64

    @nn.compact
    def __call__(self, inputs: Array, h: Array) -> Tuple[Array, Array]:
        x = nn.relu(nn.Dense(self.hidden_dim, name="fc1")(inputs))
        new_h, _ = nn.GRUCell(self.hidden_dim, name="gru")(h, x)
        q = nn.Dense(self.n_actions, name="fc2")(new_h)
        return q, new_h

    def initial_state(self, batch_shape: Tuple[int, ...]) -> Array:
        return jnp.zeros((*batch_shape, self.hidden_dim), jnp.float32)


class QMixer(nn.Module):
    """Monotonic mixing network: Q_tot = f_state(q_1..q_n).

    Hypernetworks generate |W1| ∈ R^{n×e}, b1 ∈ R^e, |w2| ∈ R^e, and a
    2-layer value head v(s) (``qmix.py:161-230``).  abs() on the generated
    weights enforces ∂Q_tot/∂q_i ≥ 0.
    """

    n_agents: int
    embed_dim: int = 32
    hypernet_embed: int = 64

    @nn.compact
    def __call__(self, agent_qs: Array, state: Array) -> Array:
        """agent_qs: [..., n_agents]; state: [..., state_dim] → [...]"""
        # 2-layer hypernets (pymarl's stable configuration); small-scale
        # output init keeps |W| near 0 early so Q_tot starts ≈ Σ-free and
        # the monotone weights grow only as the state signal warrants.
        small = nn.initializers.variance_scaling(0.1, "fan_in", "truncated_normal")

        def hyper(n_out, name):
            h = nn.relu(nn.Dense(self.hypernet_embed, name=f"{name}_l1")(state))
            return nn.Dense(n_out, kernel_init=small, name=f"{name}_l2")(h)

        w1 = jnp.abs(hyper(self.n_agents * self.embed_dim, "hyper_w1"))
        w1 = w1.reshape(*state.shape[:-1], self.n_agents, self.embed_dim)
        b1 = nn.Dense(self.embed_dim, kernel_init=small, name="hyper_b1")(state)
        hidden = nn.elu(
            jnp.einsum("...a,...ae->...e", agent_qs, w1) + b1)

        w2 = jnp.abs(hyper(self.embed_dim, "hyper_w2"))
        v = nn.Dense(1, kernel_init=small, name="v2")(
            nn.relu(nn.Dense(self.hypernet_embed, name="v1")(state)))
        return jnp.sum(hidden * w2, axis=-1) + v[..., 0]
