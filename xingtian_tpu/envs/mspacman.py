"""MsPacman arcade analog — pure-JAX maze chase on the 10×10 grid.

Completes the reference benchmark-env family (``examples/evolution/
mspacman_ppo.yaml`` / ``pbt_mspacman_ppo.yaml`` drive
``MsPacmanNoFrameskip-v4``).  Mechanics in the MinAtar spirit, branchless
with static shapes: pellets (+10), power pellets (+50, scare the ghosts
for a window), ghosts that chase/flee with one king-move per tick,
3 lives, pellet field regrowing each cleared round.  ALE MsPacman's
minimal action set has 9 moves (noop + 8 directions); diagonals resolve
vertical-then-horizontal against walls.

Registered as ``MsPacman`` (grid planes) and ``MsPacmanPixel``
(84×84×4 uint8 via the shared arcade renderer), so
``AtariEnv: MsPacmanNoFrameskip-v4`` resolves exactly like the other
arcade shims.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from flax import struct

from xingtian_tpu.envs.arcade import GRID, PixelObs
from xingtian_tpu.envs.core import Discrete, EnvSpec, JaxEnv, TimeStep
from xingtian_tpu.registry import Registers

Array = jax.Array

N_GHOSTS = 3
SCARE_STEPS = 20
PELLET_R, POWER_R, GHOST_R = 10.0, 50.0, 200.0

# 10×10 maze: border + symmetric internal walls (1 = wall)
_MAZE = np.array([
    [1, 1, 1, 1, 1, 1, 1, 1, 1, 1],
    [1, 0, 0, 0, 0, 0, 0, 0, 0, 1],
    [1, 0, 1, 1, 0, 0, 1, 1, 0, 1],
    [1, 0, 0, 0, 0, 0, 0, 0, 0, 1],
    [1, 0, 1, 0, 1, 1, 0, 1, 0, 1],
    [1, 0, 1, 0, 1, 1, 0, 1, 0, 1],
    [1, 0, 0, 0, 0, 0, 0, 0, 0, 1],
    [1, 0, 1, 1, 0, 0, 1, 1, 0, 1],
    [1, 0, 0, 0, 0, 0, 0, 0, 0, 1],
    [1, 1, 1, 1, 1, 1, 1, 1, 1, 1],
], np.float32)
_POWER_CELLS = np.array([[1, 1], [1, 8], [8, 1], [8, 8]], np.int64)
_PLAYER_START = np.array([8, 4], np.int64)
_GHOST_START = np.array([[4, 3], [4, 6], [5, 4]], np.int64)

# action id → (drow, dcol); ALE order: NOOP UP RIGHT LEFT DOWN UR UL DR DL
_MOVES = np.array([
    [0, 0], [-1, 0], [0, 1], [0, -1], [1, 0],
    [-1, 1], [-1, -1], [1, 1], [1, -1],
], np.int64)


@struct.dataclass
class MsPacmanState:
    pos: Array           # [2] player
    ghost_pos: Array     # [N_GHOSTS, 2]
    pellets: Array       # [GRID, GRID] {0,1}
    power: Array         # [GRID, GRID] {0,1}
    scare: Array         # [] steps of ghost fright remaining
    lives: Array         # []
    round: Array         # [] cleared pellet fields
    time: Array
    key: Array


@Registers.env.register(name="MsPacman")
class MsPacman(JaxEnv):
    """Maze chase with pellets, power pellets, 3 ghosts, 3 lives."""

    def __init__(self, chase_prob: float = 0.5, max_steps: int = 1000,
                 version: int = 0, **_kw):
        del version
        self.chase_prob = float(chase_prob)
        self.walls = jnp.asarray(_MAZE)
        self.spec = EnvSpec(
            name="MsPacman",
            obs_shape=(GRID, GRID, 6),
            obs_dtype=jnp.float32,
            action_spec=Discrete(9),
            max_steps=int(max_steps),
        )

    # -- observation planes ----------------------------------------------
    def _obs(self, s: MsPacmanState) -> Array:
        player = jnp.zeros((GRID, GRID)).at[s.pos[0], s.pos[1]].set(1.0)
        scared = (s.scare > 0).astype(jnp.float32)
        ghosts = jnp.zeros((GRID, GRID)).at[
            s.ghost_pos[:, 0], s.ghost_pos[:, 1]].max(1.0)
        return jnp.stack([
            player,
            ghosts * (1.0 - scared),
            ghosts * scared,
            s.pellets,
            s.power,
            self.walls,
        ], axis=-1)

    def _fresh_board(self):
        pellets = (1.0 - _MAZE).copy()
        power = np.zeros_like(_MAZE)
        power[_POWER_CELLS[:, 0], _POWER_CELLS[:, 1]] = 1.0
        pellets[_POWER_CELLS[:, 0], _POWER_CELLS[:, 1]] = 0.0
        pellets[_PLAYER_START[0], _PLAYER_START[1]] = 0.0
        return jnp.asarray(pellets), jnp.asarray(power)

    def _reset(self, key: Array):
        pellets, power = self._fresh_board()
        state = MsPacmanState(
            pos=jnp.asarray(_PLAYER_START, jnp.int32),
            ghost_pos=jnp.asarray(_GHOST_START, jnp.int32),
            pellets=pellets, power=power,
            scare=jnp.zeros((), jnp.int32),
            lives=jnp.asarray(3, jnp.int32),
            round=jnp.zeros((), jnp.int32),
            time=jnp.zeros((), jnp.int32),
            key=key)
        return state, self._obs(state)

    # -- movement helpers ---------------------------------------------------
    def _walkable(self, cell: Array) -> Array:
        return self.walls[cell[0], cell[1]] == 0

    def _player_move(self, pos: Array, action: Array) -> Array:
        mv = jnp.asarray(_MOVES, jnp.int32)[action]
        # diagonals resolve vertical-then-horizontal against walls
        v_step = pos + jnp.asarray([mv[0], 0], jnp.int32)
        h_step = pos + jnp.asarray([0, mv[1]], jnp.int32)
        full = pos + mv
        tgt = jnp.where(self._walkable(full), full,
                        jnp.where(self._walkable(v_step), v_step,
                                  jnp.where(self._walkable(h_step), h_step,
                                            pos)))
        return tgt

    def _ghost_move(self, g: Array, player: Array, scared: Array,
                    key: Array) -> Array:
        cand = g[None, :] + jnp.asarray(
            [[-1, 0], [1, 0], [0, -1], [0, 1]], jnp.int32)   # [4, 2]
        ok = jax.vmap(self._walkable)(cand)
        d = jnp.sum(jnp.abs(cand - player[None]), axis=-1).astype(jnp.float32)
        d = jnp.where(ok, d, 1e9)
        toward = cand[jnp.argmin(d)]
        away = cand[jnp.argmax(jnp.where(ok, d, -1e9))]
        k1, k2 = jax.random.split(key)
        rand = cand[jax.random.categorical(
            k1, jnp.where(ok, 0.0, -1e9))]
        chase = jax.random.uniform(k2) < self.chase_prob
        intent = jnp.where(scared > 0, away, jnp.where(chase, toward, rand))
        return jnp.where(jax.vmap(self._walkable)(intent[None])[0],
                         intent, g)

    # -- dynamics ------------------------------------------------------------
    def _step(self, s: MsPacmanState, action):
        action = jnp.asarray(action, jnp.int32)
        key, k_ghost = jax.random.split(s.key)

        pos = self._player_move(s.pos, action)

        # eat pellets / power
        pellet_here = s.pellets[pos[0], pos[1]]
        power_here = s.power[pos[0], pos[1]]
        reward = PELLET_R * pellet_here + POWER_R * power_here
        pellets = s.pellets.at[pos[0], pos[1]].set(0.0)
        power = s.power.at[pos[0], pos[1]].set(0.0)
        scare = jnp.where(power_here > 0, SCARE_STEPS,
                          jnp.maximum(s.scare - 1, 0))

        # ghosts move (before collision checks — crossing also collides)
        gkeys = jax.random.split(k_ghost, N_GHOSTS)
        new_ghosts = jax.vmap(
            lambda g, k: self._ghost_move(g, pos, scare, k))(
            s.ghost_pos, gkeys)
        crossed = jnp.all(new_ghosts == s.pos[None], axis=-1) & \
            jnp.all(s.ghost_pos == pos[None], axis=-1)
        caught = jnp.all(new_ghosts == pos[None], axis=-1) | crossed

        frightened = scare > 0
        eaten = caught & frightened
        reward = reward + GHOST_R * jnp.sum(eaten)
        # eaten ghosts respawn at the den
        new_ghosts = jnp.where(
            eaten[:, None], jnp.asarray(_GHOST_START, jnp.int32), new_ghosts)

        died = jnp.any(caught & ~frightened)
        lives = s.lives - died.astype(jnp.int32)
        # on death, player and ghosts respawn; board persists
        pos = jnp.where(died, jnp.asarray(_PLAYER_START, jnp.int32), pos)
        new_ghosts = jnp.where(
            died, jnp.asarray(_GHOST_START, jnp.int32), new_ghosts)
        scare = jnp.where(died, 0, scare)

        # round cleared: pellets regrow, small bonus (next board)
        cleared = (jnp.sum(pellets) + jnp.sum(power)) == 0
        fresh_p, fresh_pw = self._fresh_board()
        pellets = jnp.where(cleared, fresh_p, pellets)
        power = jnp.where(cleared, fresh_pw, power)
        rnd = s.round + cleared.astype(jnp.int32)

        time = s.time + 1
        done = (lives <= 0) | (time >= self.spec.max_steps)
        new_state = MsPacmanState(
            pos=pos, ghost_pos=new_ghosts, pellets=pellets, power=power,
            scare=scare, lives=lives, round=rnd, time=time, key=key)
        return new_state, TimeStep(
            obs=self._obs(new_state), reward=reward.astype(jnp.float32),
            done=done,
            info={"lives": lives, "round": rnd,
                  "ghosts_eaten": jnp.sum(eaten)})


@Registers.env.register(name="MsPacmanPixel", aliases=("MspacmanPixel",))
def mspacman_pixel(n_stack: int = 4, size: int = 84, **kw):
    return PixelObs(MsPacman(**kw), n_stack=n_stack, size=size)
