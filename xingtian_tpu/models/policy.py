"""Registered model zoo — the reference's ``xt/model`` inventory rebuilt as
flax modules returning pure pytree params.

The reference's ``XTModel`` owns a per-process tf.Graph + Session
(``xt/model/model.py:47-54``); here a "model" is a
:class:`ModelSpec` — a flax ``nn.Module`` plus static metadata — and all
state (params) lives in the algorithm's TrainState pytree, so weights
"distribution" is just device-resident arrays (no ShareBuf/plasma needed).

Registered names mirror the reference zoo so YAML configs resolve
unchanged: ``PpoMlp``/``PpoCnn`` (``xt/model/ppo/``), ``DqnMlp``/``DqnCnn``/
``DqnCnnPong`` (``xt/model/dqn/``), ``ImpalaMlp``/``ImpalaCnn``/
``ImpalaCnnOpt`` (``xt/model/impala/``).

Initialization: hidden layers orthogonal(√2), policy head orthogonal(0.01),
value head orthogonal(1.0) — the standard PPO-family scheme (the reference
uses Keras glorot_uniform; orthogonal is the deliberate TPU-rebuild
default, configurable via ``model_config["init"]="glorot"``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from xingtian_tpu.registry import Registers
from xingtian_tpu.models.torso import CNNTorso, MLPTorso

Array = jax.Array


def _inits(scheme: str):
    if scheme == "glorot":
        g = nn.initializers.glorot_uniform()
        return g, g, g
    return (
        nn.initializers.orthogonal(jnp.sqrt(2.0)),
        nn.initializers.orthogonal(0.01),
        nn.initializers.orthogonal(1.0),
    )


@dataclasses.dataclass(frozen=True)
class ModelSpec:
    """A built model: flax module + static metadata the algorithms need."""

    module: nn.Module
    obs_shape: Tuple[int, ...]
    obs_dtype: Any
    action_dim: int
    action_type: str              # Categorical | DiagGaussian | Value(Q)
    kind: str                     # actor_critic | q

    def init_params(self, key: jax.Array):
        dummy = jnp.zeros((1, *self.obs_shape), self.obs_dtype)
        return self.module.init(key, dummy)

    def apply(self, params, obs):
        return self.module.apply(params, obs)


# ---------------------------------------------------------------------------
# Actor–critic head (PPO / IMPALA families)
# ---------------------------------------------------------------------------

class ActorCritic(nn.Module):
    """Torso(s) → (pi_params, value).

    ``vf_share_layers`` mirrors the reference's ``VF_SHARE_LAYERS``
    (CNN default True, MLP default False —
    ``xt/model/ppo/default_config.py``).  For DiagGaussian the log_std is a
    state-independent learned parameter appended to the mean, exactly the
    reference's layout (``xt/model/ppo/ppo.py:75-79``).
    """

    torso_fn: Callable[[], nn.Module]
    action_dim: int
    action_type: str = "Categorical"
    vf_share_layers: bool = False
    init_scheme: str = "orthogonal"

    @nn.compact
    def __call__(self, obs: Array) -> Tuple[Array, Array]:
        _, pi_init, v_init = _inits(self.init_scheme)
        latent_pi = self.torso_fn()(obs)
        latent_v = latent_pi if self.vf_share_layers else self.torso_fn()(obs)

        pi_out = nn.Dense(self.action_dim, kernel_init=pi_init, name="pi_head")(latent_pi)
        value = nn.Dense(1, kernel_init=v_init, name="v_head")(latent_v)[..., 0]

        if self.action_type == "DiagGaussian":
            log_std = self.param(
                "pi_logstd", nn.initializers.zeros, (self.action_dim,))
            pi_out = jnp.concatenate(
                [pi_out, jnp.broadcast_to(log_std, pi_out.shape)], axis=-1)
        return pi_out, value


class QNetwork(nn.Module):
    """Torso → per-action Q values (DQN family, ``xt/model/dqn/``)."""

    torso_fn: Callable[[], nn.Module]
    action_dim: int
    init_scheme: str = "orthogonal"

    @nn.compact
    def __call__(self, obs: Array) -> Array:
        _, _, v_init = _inits(self.init_scheme)
        latent = self.torso_fn()(obs)
        return nn.Dense(self.action_dim, kernel_init=v_init, name="q_head")(latent)


# ---------------------------------------------------------------------------
# Factory helpers
# ---------------------------------------------------------------------------

def _mlp_torso(cfg: dict):
    hidden = tuple(cfg.get("hidden_sizes", [64, 64]))
    activation = cfg.get("activation", "tanh")
    return lambda: MLPTorso(hidden_sizes=hidden, activation=activation)


def _cnn_torso(state_dim, cfg: dict):
    hidden = tuple(cfg.get("hidden_sizes", [512]))
    activation = cfg.get("activation", "relu")
    dtype = jnp.bfloat16 if cfg.get("use_bf16", True) else jnp.float32
    return lambda: CNNTorso(
        obs_shape=tuple(state_dim), hidden_sizes=hidden,
        activation=activation, dtype=dtype)


def _dtype(name: str):
    return {"uint8": jnp.uint8, "float32": jnp.float32,
            "float16": jnp.float16}[str(name)]


def _ac_model(torso_fn, state_dim, action_dim, input_dtype, action_type, cfg) -> ModelSpec:
    return ModelSpec(
        module=ActorCritic(
            torso_fn=torso_fn,
            action_dim=action_dim,
            action_type=action_type,
            vf_share_layers=bool(cfg.get("VF_SHARE_LAYERS", False)),
            init_scheme=cfg.get("init", "orthogonal"),
        ),
        obs_shape=tuple(state_dim),
        obs_dtype=_dtype(input_dtype),
        action_dim=action_dim,
        action_type=action_type,
        kind="actor_critic",
    )


def _q_model(torso_fn, state_dim, action_dim, input_dtype, cfg) -> ModelSpec:
    return ModelSpec(
        module=QNetwork(
            torso_fn=torso_fn,
            action_dim=action_dim,
            init_scheme=cfg.get("init", "orthogonal"),
        ),
        obs_shape=tuple(state_dim),
        obs_dtype=_dtype(input_dtype),
        action_dim=action_dim,
        action_type="Value",
        kind="q",
    )


# -- PPO family -------------------------------------------------------------

@Registers.model.register(name="PpoMlp")
def ppo_mlp(state_dim, action_dim, input_dtype="float32",
            action_type="Categorical", model_config: Optional[dict] = None, **_kw):
    cfg = dict(model_config or {})
    cfg.setdefault("VF_SHARE_LAYERS", False)   # MLP_SHARE_LAYERS default
    return _ac_model(_mlp_torso(cfg),
                     state_dim, action_dim, input_dtype, action_type, cfg)


@Registers.model.register(name="PpoCnn")
def ppo_cnn(state_dim, action_dim, input_dtype="uint8",
            action_type="Categorical", model_config: Optional[dict] = None, **_kw):
    cfg = dict(model_config or {})
    cfg.setdefault("VF_SHARE_LAYERS", True)    # CNN_SHARE_LAYERS default
    return _ac_model(_cnn_torso(state_dim, cfg),
                     state_dim, action_dim, input_dtype, action_type, cfg)


class _ReshapeTorso(nn.Module):
    """Reshape a flat observation to a grid before a CNN torso (CatchPigs
    ships flattened plane observations; the reference's ``PpoCnnPigs``
    consumes the grid form, ``xt/model/ppo/ppo_cnn_pigs.py``)."""

    grid_shape: Tuple[int, ...]
    inner_fn: Callable[[], nn.Module]

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = x.reshape(*x.shape[:-1], *self.grid_shape)
        return self.inner_fn()(x)


@Registers.model.register(name="PpoCnnPigs")
def ppo_cnn_pigs(state_dim, action_dim, input_dtype="float32",
                 action_type="Categorical", model_config: Optional[dict] = None,
                 **_kw):
    cfg = dict(model_config or {})
    cfg.setdefault("VF_SHARE_LAYERS", True)
    cfg.setdefault("hidden_sizes", [128])
    grid = tuple(cfg.get("grid_shape", (7, 7, 3)))
    if int(jnp.prod(jnp.asarray(state_dim))) != int(jnp.prod(jnp.asarray(grid))):
        raise ValueError(
            f"PpoCnnPigs: obs {state_dim} does not flatten to grid {grid}")
    inner = _cnn_torso(grid, cfg)
    torso_fn = lambda: _ReshapeTorso(grid_shape=grid, inner_fn=inner)  # noqa: E731
    return _ac_model(torso_fn, state_dim, action_dim, input_dtype,
                     action_type, cfg)


# -- IMPALA family ----------------------------------------------------------

@Registers.model.register(name="ImpalaMlp")
def impala_mlp(state_dim, action_dim, input_dtype="float32",
               action_type="Categorical", model_config: Optional[dict] = None, **_kw):
    cfg = dict(model_config or {})
    return _ac_model(_mlp_torso(cfg),
                     state_dim, action_dim, input_dtype, action_type, cfg)


@Registers.model.register(name="ImpalaCnn", aliases=("ImpalaCnnOpt",))
def impala_cnn(state_dim, action_dim, input_dtype="uint8",
               action_type="Categorical", model_config: Optional[dict] = None, **_kw):
    cfg = dict(model_config or {})
    cfg.setdefault("VF_SHARE_LAYERS", True)
    cfg.setdefault("hidden_sizes", [256])      # impala_cnn_opt.py hidden
    return _ac_model(_cnn_torso(state_dim, cfg),
                     state_dim, action_dim, input_dtype, action_type, cfg)


# -- DQN family -------------------------------------------------------------

@Registers.model.register(name="DqnMlp")
def dqn_mlp(state_dim, action_dim, input_dtype="float32",
            model_config: Optional[dict] = None, **_kw):
    cfg = dict(model_config or {})
    cfg.setdefault("hidden_sizes", [256, 256])
    return _q_model(_mlp_torso(cfg),
                    state_dim, action_dim, input_dtype, cfg)


@Registers.model.register(name="DqnCnn", aliases=("DqnCnnPong",))
def dqn_cnn(state_dim, action_dim, input_dtype="uint8",
            model_config: Optional[dict] = None, **_kw):
    cfg = dict(model_config or {})
    cfg.setdefault("hidden_sizes", [256])
    return _q_model(_cnn_torso(state_dim, cfg),
                    state_dim, action_dim, input_dtype, cfg)
