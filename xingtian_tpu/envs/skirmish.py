"""StarCraft-style micro-combat skirmish — the SMAC capability analog.

The reference drives SMAC (StarCraft II) through ``StarCraft2Xt``
(``xt/environment/ma/env_starcraft.py:29-77``): per-agent partial
observations, a centralized global state, per-agent *available-action*
masks (dead units may only no-op; attacks need a live target in range),
a shaped team reward (damage + kill/win bonuses) and the ``unified``
lock-step API.  SC2 itself is a closed-source native sim — it enters the
TPU framework through the host env farm (``xingtian_tpu/envs/host.py``).
This module provides the *on-device* equivalent: an n-vs-m marine
skirmish with the full SMAC API surface (obs/state/avail_actions/
battle_won), so QMIX/SCC train end-to-end on TPU with the same
machinery they would use against real SMAC.

Mechanics (mirroring SMAC's marine micro):

* units live on a ``G×G`` grid; allies spawn on the left, enemies right;
* actions: 0 = no-op (dead only), 1 = stop, 2-5 = move NSEW,
  ``6+j`` = attack enemy ``j`` (needs enemy alive & within shoot range);
* enemies run SMAC's built-in AI analog: attack the nearest ally in
  range, else advance toward it;
* team reward per step (SMAC's shaped default, ``reward_scale`` to
  ~20 max): damage dealt + 10·kills + 200·battle_won, scaled;
* episode ends on team wipe (either side) or the ``episode_limit``.
"""

from __future__ import annotations

import re

import jax
import jax.numpy as jnp
from flax import struct

from xingtian_tpu.registry import Registers
from xingtian_tpu.envs.core import Discrete, EnvSpec, JaxEnv, TimeStep

Array = jax.Array

# action ids: 0 noop, 1 stop, 2 north(-row), 3 south, 4 west, 5 east
N_FIXED_ACTIONS = 6
_MOVES = jnp.asarray(
    [[0, 0], [0, 0], [-1, 0], [1, 0], [0, -1], [0, 1]], jnp.int32)

MAX_HP = 10.0
ATTACK_DMG = 2.0
KILL_BONUS = 10.0
WIN_BONUS = 200.0
MAX_REWARD_TARGET = 20.0  # SMAC's reward_scale_rate normalization


@struct.dataclass
class SkirmishState:
    ally_pos: Array    # [n, 2] int32
    ally_hp: Array     # [n] float32
    enemy_pos: Array   # [m, 2] int32
    enemy_hp: Array    # [m] float32
    time: Array        # [] int32
    key: Array


def _cheb(a: Array, b: Array) -> Array:
    """Chebyshev distance between position sets [x,2] and [y,2] → [x, y]."""
    d = jnp.abs(a[:, None, :] - b[None, :, :])
    return jnp.max(d, axis=-1)


@Registers.env.register(name="StarCraftSkirmish")
class StarCraftSkirmish(JaxEnv):
    """n-vs-m marine skirmish with the SMAC API (unified multi-agent).

    ``map_name`` follows SMAC naming: ``"3m"`` = 3 marines vs 3,
    ``"5m_vs_6m"`` = 5 vs 6.  The reference's map_name config key
    (``examples`` of ``xt/environment/ma/env_starcraft.py``) resolves the
    same way.
    """

    def __init__(self, map_name: str = "3m", grid: int = 8,
                 shoot_range: int = 3, sight_range: int = 5,
                 episode_limit: int = 60, **_kw):
        m = re.fullmatch(r"(\d+)m(?:_vs_(\d+)m)?", map_name)
        if not m:
            raise ValueError(f"unknown skirmish map {map_name!r}")
        self.n_allies = int(m.group(1))
        self.n_enemies = int(m.group(2)) if m.group(2) else self.n_allies
        self.G = int(grid)
        self.shoot_range = int(shoot_range)
        self.sight_range = int(sight_range)
        n_actions = N_FIXED_ACTIONS + self.n_enemies
        obs_dim = 3 + 4 * (self.n_allies - 1) + 4 * self.n_enemies
        self.spec = EnvSpec(
            name=f"StarCraftSkirmish-{map_name}",
            obs_shape=(obs_dim,),
            obs_dtype=jnp.float32,
            action_spec=Discrete(n_actions),
            max_steps=int(episode_limit),
            n_agents=self.n_allies,
            api_type="unified",
        )
        # max attainable team reward, for SMAC-style scaling
        max_r = (self.n_enemies * MAX_HP + self.n_enemies * KILL_BONUS
                 + WIN_BONUS)
        self._reward_scale = MAX_REWARD_TARGET / max_r

    # -- SMAC get_state analog ------------------------------------------
    @property
    def global_state_dim(self) -> int:
        return 3 * (self.n_allies + self.n_enemies)

    def global_state(self, s: SkirmishState) -> Array:
        g = float(self.G - 1)
        feats = []
        for pos, hp in ((s.ally_pos, s.ally_hp), (s.enemy_pos, s.enemy_hp)):
            feats.append(jnp.concatenate([
                pos.astype(jnp.float32) / g,
                (hp / MAX_HP)[:, None],
            ], axis=-1).reshape(-1))
        return jnp.concatenate(feats)

    # -- SMAC get_avail_agent_actions analog ----------------------------
    def avail_actions(self, s: SkirmishState) -> Array:
        """[n_agents, n_actions] float mask; dead units may only no-op."""
        alive_a = s.ally_hp > 0.0                                 # [n]
        alive_e = s.enemy_hp > 0.0                                 # [m]
        in_bounds = jnp.stack([                                    # [n, 4]
            s.ally_pos[:, 0] > 0, s.ally_pos[:, 0] < self.G - 1,
            s.ally_pos[:, 1] > 0, s.ally_pos[:, 1] < self.G - 1,
        ], axis=-1)
        can_shoot = (_cheb(s.ally_pos, s.enemy_pos) <= self.shoot_range)
        can_shoot = can_shoot & alive_e[None, :]                   # [n, m]
        noop = (~alive_a)[:, None]
        stop = alive_a[:, None]
        move = in_bounds & alive_a[:, None]
        attack = can_shoot & alive_a[:, None]
        return jnp.concatenate(
            [noop, stop, move, attack], axis=-1).astype(jnp.float32)

    # -- SMAC get_obs analog --------------------------------------------
    def _obs(self, s: SkirmishState) -> Array:
        g = float(self.G - 1)
        pos_f = s.ally_pos.astype(jnp.float32)
        epos_f = s.enemy_pos.astype(jnp.float32)
        alive_a = (s.ally_hp > 0.0).astype(jnp.float32)
        alive_e = (s.enemy_hp > 0.0).astype(jnp.float32)
        d_aa = _cheb(s.ally_pos, s.ally_pos)
        d_ae = _cheb(s.ally_pos, s.enemy_pos)

        def one(i):
            me = jnp.asarray([s.ally_hp[i] / MAX_HP,
                              pos_f[i, 0] / g, pos_f[i, 1] / g])
            vis_a = ((d_aa[i] <= self.sight_range) & (s.ally_hp > 0.0)
                     ).astype(jnp.float32)
            rel_a = jnp.concatenate([
                vis_a[:, None],
                vis_a[:, None] * (pos_f - pos_f[i]) / g,
                vis_a[:, None] * (s.ally_hp / MAX_HP * alive_a)[:, None],
            ], axis=-1)                                            # [n, 4]
            rel_a = jnp.concatenate([rel_a[:i], rel_a[i + 1:]], axis=0)
            vis_e = ((d_ae[i] <= self.sight_range) & (s.enemy_hp > 0.0)
                     ).astype(jnp.float32)
            rel_e = jnp.concatenate([
                vis_e[:, None],
                vis_e[:, None] * (epos_f - pos_f[i]) / g,
                vis_e[:, None] * (s.enemy_hp / MAX_HP * alive_e)[:, None],
            ], axis=-1)                                            # [m, 4]
            alive = s.ally_hp[i] > 0.0
            return jnp.where(
                alive,
                jnp.concatenate([me, rel_a.reshape(-1), rel_e.reshape(-1)]),
                jnp.zeros(self.spec.obs_shape[0]))                 # dead: zeros

        return jnp.stack([one(i) for i in range(self.n_allies)])

    # -- lifecycle -------------------------------------------------------
    def _reset(self, key):
        key, k_a, k_e = jax.random.split(key, 3)
        rows_a = jax.random.choice(
            k_a, self.G, (self.n_allies,), replace=False)
        rows_e = jax.random.choice(
            k_e, self.G, (self.n_enemies,), replace=False)
        state = SkirmishState(
            ally_pos=jnp.stack(
                [rows_a, jnp.zeros_like(rows_a)], -1).astype(jnp.int32),
            ally_hp=jnp.full((self.n_allies,), MAX_HP),
            enemy_pos=jnp.stack(
                [rows_e, jnp.full_like(rows_e, self.G - 1)], -1
            ).astype(jnp.int32),
            enemy_hp=jnp.full((self.n_enemies,), MAX_HP),
            time=jnp.zeros((), jnp.int32),
            key=key,
        )
        return state, self._obs(state)

    def _step(self, s: SkirmishState, actions):
        actions = jnp.asarray(actions, jnp.int32).reshape(self.n_allies)
        alive_a = s.ally_hp > 0.0
        alive_e = s.enemy_hp > 0.0

        # 1. ally movement (attack/no-op/stop actions move by [0,0])
        move_idx = jnp.where(actions < N_FIXED_ACTIONS, actions, 0)
        delta = _MOVES[move_idx] * alive_a[:, None]
        ally_pos = jnp.clip(s.ally_pos + delta, 0, self.G - 1)

        # 2. ally attacks: action 6+j targets enemy j (simultaneous fire)
        is_attack = actions >= N_FIXED_ACTIONS                       # [n]
        target = jnp.clip(actions - N_FIXED_ACTIONS, 0, self.n_enemies - 1)
        in_range = _cheb(ally_pos, s.enemy_pos) <= self.shoot_range  # [n, m]
        hit = (is_attack & alive_a
               & alive_e[target]
               & jnp.take_along_axis(
                   in_range, target[:, None], axis=1)[:, 0])         # [n]
        dmg_e = jnp.zeros(self.n_enemies).at[target].add(
            hit.astype(jnp.float32) * ATTACK_DMG)
        enemy_hp = jnp.maximum(s.enemy_hp - dmg_e, 0.0)

        # 3. enemy AI: attack nearest live ally in range, else advance
        d_ea = _cheb(s.enemy_pos, ally_pos).astype(jnp.float32)     # [m, n]
        d_masked = jnp.where(alive_a[None, :], d_ea, jnp.inf)
        near = jnp.argmin(d_masked, axis=1)                          # [m]
        near_d = jnp.min(d_masked, axis=1)
        enemy_can_act = (enemy_hp > 0.0) & jnp.any(alive_a)
        shoots = enemy_can_act & (near_d <= self.shoot_range)
        dmg_a = jnp.zeros(self.n_allies).at[near].add(
            shoots.astype(jnp.float32) * ATTACK_DMG)
        ally_hp = jnp.maximum(s.ally_hp - dmg_a * alive_a, 0.0)
        step_dir = jnp.sign(ally_pos[near] - s.enemy_pos)            # [m, 2]
        # move along the dominant axis only (grid pathing, one cell/step)
        dabs = jnp.abs(ally_pos[near] - s.enemy_pos)
        row_first = dabs[:, 0] >= dabs[:, 1]
        step = jnp.stack([
            jnp.where(row_first, step_dir[:, 0], 0),
            jnp.where(row_first, 0, step_dir[:, 1]),
        ], axis=-1)
        advance = (enemy_can_act & ~shoots)[:, None]
        enemy_pos = jnp.clip(
            s.enemy_pos + step * advance, 0, self.G - 1)

        # 4. reward: damage dealt + kill bonus + win bonus, SMAC-scaled
        kills = ((s.enemy_hp > 0.0) & (enemy_hp <= 0.0)).astype(jnp.float32)
        won = jnp.all(enemy_hp <= 0.0)
        raw = (jnp.sum(dmg_e) + KILL_BONUS * jnp.sum(kills)
               + WIN_BONUS * won.astype(jnp.float32))
        reward = raw * self._reward_scale

        time = s.time + 1
        new_state = SkirmishState(
            ally_pos=ally_pos, ally_hp=ally_hp,
            enemy_pos=enemy_pos, enemy_hp=enemy_hp,
            time=time, key=s.key,
        )
        done = (won | jnp.all(ally_hp <= 0.0)
                | (time >= self.spec.max_steps))
        return new_state, TimeStep(
            obs=self._obs(new_state),
            reward=reward.astype(jnp.float32),
            done=done,
            info={
                "global_state": self.global_state(new_state),
                "battle_won": won,
                "avail_actions": self.avail_actions(new_state),
            },
        )
