"""MiniGrid-style partial-observation gridworlds — pure JAX.

The reference ships a MiniGrid suite (``xt/environment/MiniGrid/``:
ant/dog/traffic_control over ``extended_minigrid.py``) built on the
gym-minigrid package.  Capability analog: egocentric partial-view
navigation tasks with the MiniGrid action set (turn left / turn right /
forward), walls, and a goal square — jittable and vectorizable like every
other env here.

Layouts: ``empty`` (open room) and ``four_rooms`` (walls with door gaps).
Observation: an egocentric ``view × view × 3`` window (walls, goal,
out-of-bounds planes), rotated so the agent always faces "up" — the same
convention gym-minigrid uses.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from flax import struct

from xingtian_tpu.registry import Registers
from xingtian_tpu.envs.core import Discrete, EnvSpec, JaxEnv, TimeStep

# directions: 0=up(-row) 1=right(+col) 2=down(+row) 3=left(-col)
_DIR_VECS = jnp.asarray([[-1, 0], [0, 1], [1, 0], [0, -1]], jnp.int32)


def _four_rooms_walls(size: int) -> np.ndarray:
    walls = np.zeros((size, size), np.float32)
    walls[0, :] = walls[-1, :] = walls[:, 0] = walls[:, -1] = 1.0
    mid = size // 2
    walls[mid, :] = 1.0
    walls[:, mid] = 1.0
    for gap in ((mid, mid // 2), (mid, mid + mid // 2 + 1),
                (mid // 2, mid), (mid + mid // 2 + 1, mid)):
        walls[gap] = 0.0
    return walls


def _empty_walls(size: int) -> np.ndarray:
    walls = np.zeros((size, size), np.float32)
    walls[0, :] = walls[-1, :] = walls[:, 0] = walls[:, -1] = 1.0
    return walls


@struct.dataclass
class MiniGridState:
    pos: jax.Array       # [2] row, col
    direction: jax.Array  # [] 0..3
    goal: jax.Array      # [2]
    time: jax.Array
    key: jax.Array


@Registers.env.register(name="MiniGrid", aliases=("MiniGridEmpty", "MiniGridFourRooms"))
class MiniGrid(JaxEnv):
    """Navigate to the goal; reward ``1 − 0.9·t/T`` on arrival (the
    gym-minigrid reward shape), 0 otherwise.  Actions: 0 turn-left,
    1 turn-right, 2 forward."""

    def __init__(self, size: int = 9, view: int = 5,
                 layout: str = "empty", max_steps: int = 0, **_kw):
        self.size = size
        self.view = view
        walls = (_four_rooms_walls(size) if layout == "four_rooms"
                 else _empty_walls(size))
        self.walls = jnp.asarray(walls)
        self._free = np.argwhere(walls == 0)
        self._free_j = jnp.asarray(self._free, jnp.int32)
        limit = max_steps or 4 * size * size
        self.spec = EnvSpec(
            name=f"MiniGrid-{layout}-{size}",
            obs_shape=(view, view, 3),
            obs_dtype=jnp.float32,
            action_spec=Discrete(3),
            max_steps=limit,
        )

    # -- egocentric view ---------------------------------------------------
    def _obs(self, s: MiniGridState) -> jax.Array:
        v = self.view
        half = v // 2
        # absolute window around the agent, padded with out-of-bounds flag
        rows = s.pos[0] + jnp.arange(-half, half + 1)
        cols = s.pos[1] + jnp.arange(-half, half + 1)
        in_r = (rows >= 0) & (rows < self.size)
        in_c = (cols >= 0) & (cols < self.size)
        rr = jnp.clip(rows, 0, self.size - 1)
        cc = jnp.clip(cols, 0, self.size - 1)
        window_walls = self.walls[rr[:, None], cc[None, :]]
        oob = 1.0 - (in_r[:, None] & in_c[None, :]).astype(jnp.float32)
        goal_plane = (
            (rows[:, None] == s.goal[0]) & (cols[None, :] == s.goal[1])
        ).astype(jnp.float32)
        view = jnp.stack([window_walls, goal_plane, oob], axis=-1)
        # rotate so the agent's facing direction points up
        return jax.lax.switch(
            s.direction,
            [lambda x: x,
             lambda x: jnp.rot90(x, 1),
             lambda x: jnp.rot90(x, 2),
             lambda x: jnp.rot90(x, 3)],
            view)

    def _random_free_cell(self, key) -> jax.Array:
        idx = jax.random.randint(key, (), 0, self._free_j.shape[0])
        return self._free_j[idx]

    def _reset(self, key):
        key, k_pos, k_goal, k_dir = jax.random.split(key, 4)
        pos = self._random_free_cell(k_pos)
        goal = self._random_free_cell(k_goal)
        # re-draw the goal once if it collides with the start (cheap trick
        # to keep shapes static; identical cells remain possible but rare)
        goal = jnp.where(
            jnp.all(goal == pos),
            self._random_free_cell(jax.random.fold_in(k_goal, 1)),
            goal)
        state = MiniGridState(
            pos=pos, goal=goal,
            direction=jax.random.randint(k_dir, (), 0, 4),
            time=jnp.zeros((), jnp.int32), key=key)
        return state, self._obs(state)

    def _step(self, s: MiniGridState, action):
        action = jnp.asarray(action, jnp.int32)
        direction = (s.direction + jnp.where(action == 0, -1, 0)
                     + jnp.where(action == 1, 1, 0)) % 4
        fwd = s.pos + _DIR_VECS[direction]
        fwd = jnp.clip(fwd, 0, self.size - 1)
        blocked = self.walls[fwd[0], fwd[1]] > 0
        pos = jnp.where((action == 2) & ~blocked, fwd, s.pos)

        time = s.time + 1
        reached = jnp.all(pos == s.goal)
        reward = jnp.where(
            reached,
            1.0 - 0.9 * time.astype(jnp.float32) / self.spec.max_steps,
            0.0)
        done = reached | (time >= self.spec.max_steps)
        new_state = MiniGridState(
            pos=pos, direction=direction, goal=s.goal, time=time, key=s.key)
        return new_state, TimeStep(
            obs=self._obs(new_state),
            reward=reward.astype(jnp.float32),
            done=done,
            info={"success": reached, "truncated": done & ~reached},
        )
