"""Pure-JAX arcade environments (Atari-family capability).

The reference wraps ALE via gym (`xt/environment/gym/atari_env.py`,
``atari_wrappers.py``).  ALE's C++ emulator cannot run on a TPU core and is
not importable in this image, so the Atari capability is provided by
jittable re-implementations of the MinAtar-style game mechanics: every env
instance is a small pytree, thousands step in lockstep under ``vmap`` +
``lax.scan`` — this *is* the "1K+ parallel sampling" capability of the
reference (``docs/basic_arch.en.md:10``) collapsed onto one chip.

Two observation modes:

* ``obs_mode="grid"`` — native H×W×C float32 channel planes (fast path).
* ``obs_mode="pixel"`` — rendered 84×84 grayscale uint8 with a 4-frame
  stack, matching the reference's CNN input contract
  (``examples/breakout_ppo.yaml`` ``state_dim: [84,84,4]``,
  ``input_dtype: uint8``; preprocessing ≈ ``atari_env.py:58-80``).

Action sets mirror ALE minimal sets where sensible (Breakout: NOOP / FIRE /
RIGHT / LEFT = action_dim 4, matching the reference yaml).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from xingtian_tpu.registry import Registers
from xingtian_tpu.envs.core import (
    Discrete,
    EnvSpec,
    JaxEnv,
    TimeStep,
    Wrapper,
)

GRID = 10  # playfield is a 10×10 cell grid


# ---------------------------------------------------------------------------
# Breakout
# ---------------------------------------------------------------------------

@struct.dataclass
class BreakoutState:
    ball_x: jax.Array
    ball_y: jax.Array
    ball_dir: jax.Array          # 0:up-left 1:up-right 2:down-left 3:down-right
    pos: jax.Array               # paddle column
    brick_map: jax.Array         # (GRID, GRID) float32 {0,1}
    strike: jax.Array            # bool: hit a brick last step (debounce)
    last_x: jax.Array
    last_y: jax.Array
    time: jax.Array


# direction remap tables for the three reflection kinds
_FLIP_LR = jnp.array([1, 0, 3, 2], jnp.int32)    # bounce off side wall
_FLIP_UD = jnp.array([2, 3, 0, 1], jnp.int32)    # bounce off ceiling / paddle edge
_FLIP_BOTH = jnp.array([3, 2, 1, 0], jnp.int32)  # bounce off brick / paddle face


@Registers.env.register(name="Breakout", aliases=("BreakoutGrid",))
class Breakout(JaxEnv):
    """Brick-breaking game on a 10×10 grid, 3 brick rows, single life.

    Mechanics follow the published MinAtar Breakout rules (paddle on the
    bottom row, diagonal ball, brick debounce, wall respawn when cleared),
    re-derived as branchless ``where`` algebra so the whole step is a few
    fused VPU ops.  Actions: 0 NOOP, 1 FIRE(no-op), 2 RIGHT, 3 LEFT — the
    ALE minimal action set for Breakout so reference configs with
    ``action_dim: 4`` work unchanged.
    """

    CHANNELS = 4  # paddle, ball, trail, bricks

    def __init__(self, max_steps: int = 2000, version: int = 0, **_kw):
        del version
        self.spec = EnvSpec(
            name="Breakout",
            obs_shape=(GRID, GRID, self.CHANNELS),
            obs_dtype=jnp.float32,
            action_spec=Discrete(4),
            max_steps=max_steps,
        )

    def _obs(self, s: BreakoutState) -> jax.Array:
        rows = jnp.arange(GRID)[:, None]
        cols = jnp.arange(GRID)[None, :]
        paddle = ((rows == GRID - 1) & (cols == s.pos)).astype(jnp.float32)
        ball = ((rows == s.ball_y) & (cols == s.ball_x)).astype(jnp.float32)
        trail = ((rows == s.last_y) & (cols == s.last_x)).astype(jnp.float32)
        return jnp.stack([paddle, ball, trail, s.brick_map], axis=-1)

    def _reset(self, key):
        side = jax.random.bernoulli(key)  # serve from left or right
        brick_map = jnp.zeros((GRID, GRID), jnp.float32).at[1:4, :].set(1.0)
        state = BreakoutState(
            ball_x=jnp.where(side, GRID - 1, 0).astype(jnp.int32),
            ball_y=jnp.asarray(3, jnp.int32),
            ball_dir=jnp.where(side, 2, 3).astype(jnp.int32),
            pos=jnp.asarray(GRID // 2, jnp.int32),
            brick_map=brick_map,
            strike=jnp.asarray(False),
            last_x=jnp.where(side, GRID - 1, 0).astype(jnp.int32),
            last_y=jnp.asarray(3, jnp.int32),
            time=jnp.zeros((), jnp.int32),
        )
        return state, self._obs(state)

    def _step(self, s: BreakoutState, action):
        action = jnp.asarray(action, jnp.int32)
        pos = jnp.clip(
            s.pos + jnp.where(action == 2, 1, 0) - jnp.where(action == 3, 1, 0),
            0, GRID - 1,
        )

        dx = jnp.where((s.ball_dir == 1) | (s.ball_dir == 3), 1, -1)
        dy = jnp.where(s.ball_dir >= 2, 1, -1)
        nx, ny = s.ball_x + dx, s.ball_y + dy
        d = s.ball_dir

        # side walls
        hit_side = (nx < 0) | (nx > GRID - 1)
        nx = jnp.clip(nx, 0, GRID - 1)
        d = jnp.where(hit_side, _FLIP_LR[d], d)

        # ceiling
        hit_top = ny < 0
        ny = jnp.maximum(ny, 0)
        d = jnp.where(hit_top, _FLIP_UD[d], d)

        # brick collision (elif: only when not ceiling)
        in_brick = (s.brick_map[ny, nx] == 1.0) & ~hit_top
        scores = in_brick & ~s.strike
        brick_map = s.brick_map.at[ny, nx].set(
            jnp.where(scores, 0.0, s.brick_map[ny, nx])
        )
        d = jnp.where(scores, _FLIP_BOTH[d], d)
        ny = jnp.where(scores, s.ball_y, ny)

        # bottom row (elif: only when not a brick hit and not ceiling)
        at_bottom = (ny == GRID - 1) & ~in_brick & ~hit_top
        cleared = jnp.count_nonzero(brick_map) == 0
        brick_map = jnp.where(
            at_bottom & cleared,
            brick_map.at[1:4, :].set(1.0),
            brick_map,
        )
        paddle_face = at_bottom & (s.ball_x == pos)
        paddle_edge = at_bottom & ~paddle_face & (nx == pos)
        d = jnp.where(paddle_face, _FLIP_BOTH[d], d)
        d = jnp.where(paddle_edge, _FLIP_UD[d], d)
        ny = jnp.where(paddle_face | paddle_edge, s.ball_y, ny)
        dead = at_bottom & ~paddle_face & ~paddle_edge

        time = s.time + 1
        new_state = BreakoutState(
            ball_x=nx, ball_y=ny, ball_dir=d, pos=pos,
            brick_map=brick_map,
            strike=in_brick,
            last_x=s.ball_x, last_y=s.ball_y,
            time=time,
        )
        done = dead | (time >= self.spec.max_steps)
        return new_state, TimeStep(
            obs=self._obs(new_state),
            reward=scores.astype(jnp.float32),
            done=done,
            info={"real_done": dead, "truncated": done & ~dead},
        )


# ---------------------------------------------------------------------------
# 84×84×4 uint8 pixel mode (reference CNN input geometry)
# ---------------------------------------------------------------------------

@struct.dataclass
class PixelState:
    inner: object
    frames: jax.Array  # (84, 84, n_stack) uint8


class PixelObs(Wrapper):
    """Render the grid playfield to 84×84 grayscale uint8 + frame stack.

    Capability analog of the reference's grayscale/resize/stack pipeline
    (``atari_env.py:58-80``): cells are blown up 8× (80×80) and padded to
    84×84; channel planes map to distinct gray levels so the CNN sees the
    same information the grid obs carries.
    """

    SCALE = 8
    PAD = (84 - GRID * SCALE) // 2  # = 2

    def __init__(self, env: JaxEnv, n_stack: int = 4):
        super().__init__(env)
        self.n_stack = n_stack
        self.spec = EnvSpec(
            name=env.spec.name + "-pixel",
            obs_shape=(84, 84, n_stack),
            obs_dtype=jnp.uint8,
            action_spec=env.spec.action_spec,
            max_steps=env.spec.max_steps,
        )
        n_ch = env.spec.obs_shape[-1]
        # distinct intensities per channel plane, brightest wins per cell
        self._levels = jnp.linspace(255.0, 96.0, n_ch, dtype=jnp.float32)

    def _render(self, grid_obs: jax.Array) -> jax.Array:
        inten = jnp.max(grid_obs * self._levels, axis=-1)         # (10,10)
        img = jnp.kron(inten, jnp.ones((self.SCALE, self.SCALE), jnp.float32))
        img = jnp.pad(img, ((self.PAD, self.PAD), (self.PAD, self.PAD)))
        return img.astype(jnp.uint8)

    def _reset(self, key):
        inner, obs = self.env.reset(key)
        frame = self._render(obs)
        frames = jnp.repeat(frame[..., None], self.n_stack, axis=-1)
        return PixelState(inner=inner, frames=frames), frames

    def _step(self, state: PixelState, action):
        inner, ts = self.env.step(state.inner, action)
        frame = self._render(ts.obs)
        frames = jnp.concatenate(
            [state.frames[..., 1:], frame[..., None]], axis=-1
        )
        return PixelState(inner=inner, frames=frames), ts.replace(obs=frames)


def _pixel_variant(game_cls, name: str):
    @Registers.env.register(name=name)
    def build(n_stack: int = 4, **kw):
        return PixelObs(game_cls(**kw), n_stack=n_stack)
    return build


_pixel_variant(Breakout, "BreakoutPixel")
