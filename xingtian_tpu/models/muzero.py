"""MuZero networks — representation / dynamics / prediction triple.

Parity with the reference's ``MuzeroBase`` (``xt/model/muzero/
muzero_model.py:38-255``): ``initial_inference(obs) → (hidden, policy,
value)`` and ``recurrent_inference(hidden, action) → (hidden, reward,
policy, value)``.  ``MuzeroMlp``/``MuzeroCnn`` mirror the registered
reference variants (``muzero_mlp.py``/``muzero_cnn.py``).

Values/rewards are scalars trained with MSE (the reference's default
heads); hidden states are normalized to [0,1] per MuZero appendix G —
the reference does the same min-max scaling.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from xingtian_tpu.models.torso import ACTIVATIONS, CNNTorso, MLPTorso

Array = jax.Array


class NetworkOutput(NamedTuple):
    hidden: Array          # [..., H]
    reward: Array          # [...]
    policy_logits: Array   # [..., A]
    value: Array           # [...]


def _normalize_hidden(h: Array) -> Array:
    """Min-max scale each hidden vector to [0, 1] (MuZero appendix G)."""
    mn = jnp.min(h, axis=-1, keepdims=True)
    mx = jnp.max(h, axis=-1, keepdims=True)
    return (h - mn) / jnp.maximum(mx - mn, 1e-5)


class MuZeroNets(nn.Module):
    """The three heads in one module (single param pytree).

    Call with ``method=``: ``represent(obs)``, ``dynamics(hidden, action)``,
    ``predict(hidden)``.
    """

    action_dim: int
    hidden_dim: int = 64
    fc_layers: Sequence[int] = (64,)
    obs_shape: Tuple[int, ...] = (4,)
    conv_torso: bool = False

    def setup(self):
        if self.conv_torso:
            self.repr_torso = CNNTorso(
                obs_shape=self.obs_shape, hidden_sizes=(self.hidden_dim,),
                activation="relu", dtype=jnp.float32)
        else:
            self.repr_torso = MLPTorso(
                hidden_sizes=(*self.fc_layers, self.hidden_dim),
                activation="relu")
        self.dyn_torso = MLPTorso(
            hidden_sizes=(*self.fc_layers, self.hidden_dim), activation="relu")
        self.reward_head = nn.Dense(1)
        self.policy_head = nn.Dense(self.action_dim)
        self.value_head = nn.Dense(1)
        self.pred_torso = MLPTorso(
            hidden_sizes=self.fc_layers, activation="relu")

    def represent(self, obs: Array) -> Array:
        return _normalize_hidden(self.repr_torso(obs))

    def dynamics(self, hidden: Array, action: Array) -> Tuple[Array, Array]:
        a = jax.nn.one_hot(action, self.action_dim)
        x = jnp.concatenate([hidden, a], axis=-1)
        new_hidden = _normalize_hidden(self.dyn_torso(x))
        reward = self.reward_head(new_hidden)[..., 0]
        return new_hidden, reward

    def predict(self, hidden: Array) -> Tuple[Array, Array]:
        x = self.pred_torso(hidden)
        return self.policy_head(x), self.value_head(x)[..., 0]


class MuZeroModel:
    """Convenience wrapper: params + the two inference entry points
    (``initial_inference``/``recurrent_inference`` parity,
    ``muzero_model.py:198-232``)."""

    def __init__(self, action_dim: int, obs_shape, hidden_dim: int = 64,
                 fc_layers: Sequence[int] = (64,), conv_torso: bool = False):
        self.net = MuZeroNets(
            action_dim=action_dim, hidden_dim=hidden_dim,
            fc_layers=tuple(fc_layers), obs_shape=tuple(obs_shape),
            conv_torso=conv_torso)
        self.action_dim = action_dim
        self.obs_shape = tuple(obs_shape)
        self.hidden_dim = hidden_dim

    def init_params(self, key: Array):
        obs = jnp.zeros((1, *self.obs_shape))
        k1, k2, k3 = jax.random.split(key, 3)
        params = self.net.init(k1, obs, method="represent")
        hidden = jnp.zeros((1, self.hidden_dim))
        params_d = self.net.init(k2, hidden, jnp.zeros((1,), jnp.int32),
                                 method="dynamics")
        params_p = self.net.init(k3, hidden, method="predict")
        # merge the three collections (disjoint submodules)
        merged = {"params": {**params["params"], **params_d["params"],
                             **params_p["params"]}}
        return merged

    def initial_inference(self, params, obs: Array) -> NetworkOutput:
        hidden = self.net.apply(params, obs, method="represent")
        logits, value = self.net.apply(params, hidden, method="predict")
        return NetworkOutput(
            hidden=hidden, reward=jnp.zeros_like(value),
            policy_logits=logits, value=value)

    def recurrent_inference(self, params, hidden: Array, action: Array) -> NetworkOutput:
        new_hidden, reward = self.net.apply(
            params, hidden, action, method="dynamics")
        logits, value = self.net.apply(params, new_hidden, method="predict")
        return NetworkOutput(
            hidden=new_hidden, reward=reward,
            policy_logits=logits, value=value)


# ---------------------------------------------------------------------------
# Registry entries (reference names: MuzeroMlp / MuzeroCnn / MuzeroAtari)
# ---------------------------------------------------------------------------

from xingtian_tpu.registry import Registers  # noqa: E402


@Registers.model.register(name="MuzeroMlp")
def muzero_mlp(state_dim, action_dim, model_config=None, **_kw):
    cfg = dict(model_config or {})
    return MuZeroModel(
        action_dim=action_dim, obs_shape=tuple(state_dim),
        hidden_dim=int(cfg.get("hidden_dim", 64)),
        fc_layers=tuple(cfg.get("fc_layers", [64])),
        conv_torso=False)


@Registers.model.register(name="MuzeroCnn", aliases=("MuzeroAtari",))
def muzero_cnn(state_dim, action_dim, model_config=None, **_kw):
    cfg = dict(model_config or {})
    return MuZeroModel(
        action_dim=action_dim, obs_shape=tuple(state_dim),
        hidden_dim=int(cfg.get("hidden_dim", 128)),
        fc_layers=tuple(cfg.get("fc_layers", [128])),
        conv_torso=True)
