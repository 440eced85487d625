"""Classic-control environments in pure JAX.

Capability parity with the reference's ``GymEnv`` wrapper over
``CartPole-v0`` / ``Pendulum-v0`` (reference ``xt/environment/gym/
gym_env.py:35-83``) — but implemented as jittable dynamics so thousands of
instances vectorize on a TPU core instead of one Python object per explorer
process.  Dynamics follow the public OpenAI Gym classic-control equations.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from xingtian_tpu.registry import Registers
from xingtian_tpu.envs.core import (
    Box,
    Discrete,
    EnvSpec,
    JaxEnv,
    TimeStep,
)


# ---------------------------------------------------------------------------
# CartPole (CartPole-v0 semantics: 200-step limit, +1 reward per step)
# ---------------------------------------------------------------------------

@struct.dataclass
class CartPoleState:
    x: jax.Array
    x_dot: jax.Array
    theta: jax.Array
    theta_dot: jax.Array
    time: jax.Array


@Registers.env.register(name="CartPole")
class CartPole(JaxEnv):
    """Cart-pole swing-keep task, Euler-integrated at 0.02 s.

    ``version=0`` → 200-step limit (the reference benchmark config
    ``examples/cartpole_ppo.yaml`` uses CartPole-v0 with max_steps 200);
    ``version=1`` → 500-step limit.
    """

    GRAVITY = 9.8
    CART_MASS = 1.0
    POLE_MASS = 0.1
    TOTAL_MASS = CART_MASS + POLE_MASS
    POLE_HALF_LEN = 0.5
    POLEMASS_LEN = POLE_MASS * POLE_HALF_LEN
    FORCE_MAG = 10.0
    TAU = 0.02
    THETA_LIMIT = 12 * 2 * jnp.pi / 360
    X_LIMIT = 2.4

    def __init__(self, version: int = 0, **_kwargs):
        limit = 200 if version == 0 else 500
        self.spec = EnvSpec(
            name=f"CartPole-v{version}",
            obs_shape=(4,),
            obs_dtype=jnp.float32,
            action_spec=Discrete(2),
            max_steps=limit,
        )

    def _obs(self, s: CartPoleState) -> jax.Array:
        return jnp.stack([s.x, s.x_dot, s.theta, s.theta_dot]).astype(jnp.float32)

    def _reset(self, key):
        init = jax.random.uniform(key, (4,), jnp.float32, -0.05, 0.05)
        state = CartPoleState(
            x=init[0], x_dot=init[1], theta=init[2], theta_dot=init[3],
            time=jnp.zeros((), jnp.int32),
        )
        return state, self._obs(state)

    def _step(self, state: CartPoleState, action):
        force = jnp.where(action == 1, self.FORCE_MAG, -self.FORCE_MAG)
        cos_t = jnp.cos(state.theta)
        sin_t = jnp.sin(state.theta)
        temp = (
            force + self.POLEMASS_LEN * state.theta_dot ** 2 * sin_t
        ) / self.TOTAL_MASS
        theta_acc = (self.GRAVITY * sin_t - cos_t * temp) / (
            self.POLE_HALF_LEN
            * (4.0 / 3.0 - self.POLE_MASS * cos_t ** 2 / self.TOTAL_MASS)
        )
        x_acc = temp - self.POLEMASS_LEN * theta_acc * cos_t / self.TOTAL_MASS

        x = state.x + self.TAU * state.x_dot
        x_dot = state.x_dot + self.TAU * x_acc
        theta = state.theta + self.TAU * state.theta_dot
        theta_dot = state.theta_dot + self.TAU * theta_acc
        time = state.time + 1

        new_state = CartPoleState(x=x, x_dot=x_dot, theta=theta, theta_dot=theta_dot, time=time)
        terminated = (
            (jnp.abs(x) > self.X_LIMIT)
            | (jnp.abs(theta) > self.THETA_LIMIT)
        )
        truncated = time >= self.spec.max_steps
        done = terminated | truncated
        return new_state, TimeStep(
            obs=self._obs(new_state),
            reward=jnp.ones((), jnp.float32),
            done=done,
            info={"truncated": truncated & ~terminated},
        )


# ---------------------------------------------------------------------------
# Pendulum (Pendulum-v0 semantics: 200-step limit, continuous torque)
# ---------------------------------------------------------------------------

@struct.dataclass
class PendulumState:
    theta: jax.Array
    theta_dot: jax.Array
    time: jax.Array


@Registers.env.register(name="Pendulum")
class Pendulum(JaxEnv):
    """Under-actuated pendulum swing-up; obs = (cosθ, sinθ, θ̇)."""

    MAX_SPEED = 8.0
    MAX_TORQUE = 2.0
    DT = 0.05
    G = 10.0
    M = 1.0
    L = 1.0

    def __init__(self, **_kwargs):
        self.spec = EnvSpec(
            name="Pendulum-v0",
            obs_shape=(3,),
            obs_dtype=jnp.float32,
            action_spec=Box(low=-self.MAX_TORQUE, high=self.MAX_TORQUE, shape=(1,)),
            max_steps=200,
        )

    def _obs(self, s: PendulumState) -> jax.Array:
        return jnp.stack(
            [jnp.cos(s.theta), jnp.sin(s.theta), s.theta_dot]
        ).astype(jnp.float32)

    def _reset(self, key):
        k1, k2 = jax.random.split(key)
        theta = jax.random.uniform(k1, (), jnp.float32, -jnp.pi, jnp.pi)
        theta_dot = jax.random.uniform(k2, (), jnp.float32, -1.0, 1.0)
        state = PendulumState(theta=theta, theta_dot=theta_dot, time=jnp.zeros((), jnp.int32))
        return state, self._obs(state)

    def _step(self, state: PendulumState, action):
        u = jnp.clip(jnp.reshape(action, ()), -self.MAX_TORQUE, self.MAX_TORQUE)
        theta_norm = _angle_normalize(state.theta)
        cost = theta_norm ** 2 + 0.1 * state.theta_dot ** 2 + 0.001 * u ** 2

        new_theta_dot = state.theta_dot + (
            3.0 * self.G / (2.0 * self.L) * jnp.sin(state.theta)
            + 3.0 / (self.M * self.L ** 2) * u
        ) * self.DT
        new_theta_dot = jnp.clip(new_theta_dot, -self.MAX_SPEED, self.MAX_SPEED)
        new_theta = state.theta + new_theta_dot * self.DT
        time = state.time + 1

        new_state = PendulumState(theta=new_theta, theta_dot=new_theta_dot, time=time)
        done = time >= self.spec.max_steps
        return new_state, TimeStep(
            obs=self._obs(new_state),
            reward=(-cost).astype(jnp.float32),
            done=done,
            info={"truncated": done},
        )


def _angle_normalize(x):
    return ((x + jnp.pi) % (2 * jnp.pi)) - jnp.pi
