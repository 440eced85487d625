"""MiniGrid task suite — ant hunt, dog herding, traffic control (pure JAX).

Capability analogs of the reference's three bespoke MiniGrid tasks
(``xt/environment/MiniGrid/ant.py`` 611 LoC, ``dog.py`` 566,
``traffic_control.py`` 310, registered into gym as ``MiniGrid-Ant-v0`` /
``MiniGrid-Dog-v0`` / ``MiniGrid-TrafficControl-v0``,
``gym_env.py:31-33``).  Re-designed branchless with static shapes: entity
populations live in fixed-capacity slot arrays with alive masks (the
reference mutates Python lists), spawning writes into the first free
slot, and every rule is a ``where`` over the slot axis — so thousands of
copies vmap onto one chip.

Observations: the reference feeds PpoCnn with 84×84×3 RGB renders
(``ant_ppo.yaml`` state_dim) — both single-agent tasks render the same
geometry here via nearest-index upscale of an entity-colored grid, with a
compact ego-planes mode (``pixel=False``) for fast experiments.
TrafficControl is a unified multi-agent env with the reference's exact
observation/state dimensioning (``traffic_control.py:84-86``).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from flax import struct

from xingtian_tpu.envs.core import Discrete, EnvSpec, JaxEnv, TimeStep
from xingtian_tpu.registry import Registers

Array = jax.Array

# directions: 0=up(-row) 1=right(+col) 2=down(+row) 3=left(-col)
_DIR_VECS = jnp.asarray([[-1, 0], [0, 1], [1, 0], [0, -1]], jnp.int32)


def _sign(x: Array) -> Array:
    return jnp.sign(x).astype(jnp.int32)


def _toward(src: Array, dst: Array) -> Array:
    """One king-move step from src [..., 2] toward dst [..., 2]
    (the reference's ``ant_move_towards`` sign-step, ``ant.py:461-476``)."""
    return src + _sign(dst - src)


def _render_rgb(size: int, planes: Array, colors: np.ndarray,
                out: int = 84) -> Array:
    """Entity planes [size, size, C] → RGB [out, out, 3] uint8 via
    nearest-index upscale; later planes draw over earlier ones."""
    img = jnp.zeros((size, size, 3), jnp.float32)
    for c in range(planes.shape[-1]):
        mask = planes[..., c:c + 1] > 0
        img = jnp.where(mask, jnp.asarray(colors[c], jnp.float32), img)
    idx = np.minimum((np.arange(out) * size) // out, size - 1)
    return img[idx][:, idx].astype(jnp.uint8)


def _ego_view(size: int, planes: Array, pos: Array, direction: Array,
              view: int) -> Array:
    """Egocentric view×view window over [size, size, C] planes + OOB plane,
    rotated so the agent faces up (gym-minigrid convention)."""
    half = view // 2
    rows = pos[0] + jnp.arange(-half, half + 1)
    cols = pos[1] + jnp.arange(-half, half + 1)
    in_b = ((rows >= 0) & (rows < size))[:, None] & \
           ((cols >= 0) & (cols < size))[None, :]
    rr = jnp.clip(rows, 0, size - 1)
    cc = jnp.clip(cols, 0, size - 1)
    window = planes[rr[:, None], cc[None, :]]
    oob = (1.0 - in_b.astype(jnp.float32))[..., None]
    window = jnp.concatenate([window * in_b[..., None], oob], axis=-1)
    return jax.lax.switch(
        direction,
        [lambda x: x, lambda x: jnp.rot90(x, 1),
         lambda x: jnp.rot90(x, 2), lambda x: jnp.rot90(x, 3)],
        window)


# ===========================================================================
# MiniGrid-Ant: hunt the breeding colony (ant.py analog)
# ===========================================================================

MAX_ANTS, MAX_QUEENS, MAX_FOOD = 12, 4, 8


@struct.dataclass
class AntState:
    pos: Array           # [2] agent
    direction: Array     # []
    energy: Array        # [] attack budget
    ant_pos: Array       # [MAX_ANTS, 2]
    ant_alive: Array     # [MAX_ANTS] f32
    ant_carry: Array     # [MAX_ANTS] f32 — carrying food
    queen_pos: Array     # [MAX_QUEENS, 2]
    queen_alive: Array   # [MAX_QUEENS]
    queen_energy: Array  # [MAX_QUEENS]
    food_pos: Array      # [MAX_FOOD, 2]
    food_alive: Array    # [MAX_FOOD]
    time: Array
    key: Array


@Registers.env.register(name="MiniGrid-Ant", aliases=("AntEnv", "MiniGridAnt"))
class AntHunt(JaxEnv):
    """Kill the ant colony before it breeds out of control.

    Actions (``ant.py:81-93`` restricted set, ``:131-133``): 0 turn-left,
    1 turn-right, 2 forward, 3 attack.  Attacking the cell ahead kills an
    ant/queen (+1 reward) or destroys food (0), spending 1 energy.
    Colony dynamics per step (``ant.py:300-370``): ants forage the
    nearest food, carry it to a queen; fed queens breed new ants (or,
    rarely, queens); food regrows with probability ``food_gen_rate``.
    Timeout costs −(surviving ants + queens) (``ant.py:352-355``)."""

    def __init__(self, size: int = 20, view: int = 7, max_steps: int = 200,
                 num_init_ant: int = 4, num_init_queen: int = 1,
                 num_init_food: int = 3, food_gen_rate: float = 0.3,
                 queen_rate: float = 0.1, breed_threshold: float = 30.0,
                 breed_cost: float = 15.0, agent_energy: int = 20,
                 pixel: bool = True, shaping: float = 0.0,
                 shaping_gamma: float = 0.99, **_kw):
        self.size = size
        self.view = view
        self.n_ant0, self.n_queen0, self.n_food0 = (
            num_init_ant, num_init_queen, num_init_food)
        self.food_gen_rate = food_gen_rate
        self.queen_rate = queen_rate
        self.breed_threshold = breed_threshold
        self.breed_cost = breed_cost
        self.agent_energy = agent_energy
        self.pixel = pixel
        # Opt-in potential-based shaping (Ng et al. 1999): the colony-kill
        # reward is too sparse for undirected PPO exploration (attack only
        # pays when FACING an adjacent ant with energy left — the round-5
        # entropy/LR probes all plateau at the passive −15.8).  With
        # Φ(s) = −√(dist to nearest alive ant/queen) the shaped reward
        # r + λ·(γΦ(s′) − Φ(s)) telescopes to the same optimal policy while
        # paying approach at every step.  λ=0 (the default, and the plain
        # ``ant_ppo`` config) leaves rewards bit-identical to the reference
        # semantics (``ant.py:300-370``).
        self.shaping = float(shaping)
        self.shaping_gamma = float(shaping_gamma)
        # plane colors: walls grey, agent red, ants white, queens yellow,
        # food green
        self._colors = np.asarray(
            [[100, 100, 100], [255, 0, 0], [230, 230, 230],
             [255, 215, 0], [0, 200, 0]], np.float32)
        obs_shape = (84, 84, 3) if pixel else (view, view, 6)
        self.spec = EnvSpec(
            name="MiniGrid-Ant",
            obs_shape=obs_shape,
            obs_dtype=jnp.uint8 if pixel else jnp.float32,
            action_spec=Discrete(4),
            max_steps=max_steps,
        )

    # -- grid assembly --------------------------------------------------
    def _planes(self, s: AntState) -> Array:
        size = self.size
        walls = jnp.zeros((size, size), jnp.float32)
        walls = walls.at[0, :].set(1).at[-1, :].set(1)
        walls = walls.at[:, 0].set(1).at[:, -1].set(1)

        def scatter(pos, alive):
            grid = jnp.zeros((size, size), jnp.float32)
            return grid.at[pos[:, 0], pos[:, 1]].max(alive)

        agent = jnp.zeros((size, size), jnp.float32).at[
            s.pos[0], s.pos[1]].set(1.0)
        return jnp.stack([
            walls, agent,
            scatter(s.ant_pos, s.ant_alive),
            scatter(s.queen_pos, s.queen_alive),
            scatter(s.food_pos, s.food_alive),
        ], axis=-1)

    def _obs(self, s: AntState) -> Array:
        planes = self._planes(s)
        if self.pixel:
            return _render_rgb(self.size, planes, self._colors)
        return _ego_view(self.size, planes, s.pos, s.direction, self.view)

    # -- lifecycle --------------------------------------------------------
    def _reset(self, key: Array):
        key, *ks = jax.random.split(key, 6)

        def slots(k, n_alive, cap):
            pos = jax.random.randint(k, (cap, 2), 1, self.size - 1)
            alive = (jnp.arange(cap) < n_alive).astype(jnp.float32)
            return pos, alive

        ant_pos, ant_alive = slots(ks[0], self.n_ant0, MAX_ANTS)
        queen_pos, queen_alive = slots(ks[1], self.n_queen0, MAX_QUEENS)
        food_pos, food_alive = slots(ks[2], self.n_food0, MAX_FOOD)
        state = AntState(
            pos=jnp.asarray([1, 1], jnp.int32),
            direction=jax.random.randint(ks[3], (), 0, 4),
            energy=jnp.asarray(float(self.agent_energy)),
            ant_pos=ant_pos, ant_alive=ant_alive,
            ant_carry=jnp.zeros((MAX_ANTS,)),
            queen_pos=queen_pos, queen_alive=queen_alive,
            queen_energy=10.0 * queen_alive,
            food_pos=food_pos, food_alive=food_alive,
            time=jnp.zeros((), jnp.int32), key=key)
        return state, self._obs(state)

    @staticmethod
    def _nearest(src: Array, targets: Array, t_alive: Array):
        """Index+position of the nearest alive target (euclidean², large
        sentinel for dead slots)."""
        d = jnp.sum((targets - src[None]) ** 2, axis=-1).astype(jnp.float32)
        d = jnp.where(t_alive > 0, d, 1e9)
        idx = jnp.argmin(d)
        return idx, targets[idx], d[idx]

    def _step(self, s: AntState, action):
        action = jnp.asarray(action, jnp.int32)
        key, k_ant, k_queen, k_breed, k_food, k_spawn = jax.random.split(
            s.key, 6)

        # ---- agent ------------------------------------------------------
        direction = (s.direction + jnp.where(action == 0, -1, 0)
                     + jnp.where(action == 1, 1, 0)) % 4
        fwd = jnp.clip(s.pos + _DIR_VECS[direction], 0, self.size - 1)
        on_border = (fwd[0] == 0) | (fwd[0] == self.size - 1) | \
                    (fwd[1] == 0) | (fwd[1] == self.size - 1)
        pos = jnp.where((action == 2) & ~on_border, fwd, s.pos)

        # attack: kill ant/queen in the faced cell (+1), destroy food (0)
        can_attack = (action == 3) & (s.energy > 0)
        at_fwd_ant = s.ant_alive * jnp.all(
            s.ant_pos == fwd[None], axis=-1)
        at_fwd_queen = s.queen_alive * jnp.all(
            s.queen_pos == fwd[None], axis=-1)
        at_fwd_food = s.food_alive * jnp.all(
            s.food_pos == fwd[None], axis=-1)
        kill_ant = can_attack * at_fwd_ant
        kill_queen = can_attack * at_fwd_queen
        kill_food = can_attack.astype(jnp.float32) * at_fwd_food
        reward = jnp.sum(kill_ant) + jnp.sum(kill_queen)
        ant_alive = s.ant_alive * (1.0 - kill_ant)
        queen_alive = s.queen_alive * (1.0 - kill_queen)
        food_alive = s.food_alive * (1.0 - kill_food)
        energy = s.energy - can_attack.astype(jnp.float32)

        # ---- ants forage (ant.py:300-337) --------------------------------
        def per_ant(a_pos, a_alive, a_carry, k):
            _, food_t, food_d = self._nearest(a_pos, s.food_pos, food_alive)
            _, queen_t, queen_d = self._nearest(
                a_pos, s.queen_pos, queen_alive)
            # not carrying: step toward food; adjacent → pick up
            pickup = (a_carry == 0) & (food_d <= 2.01)
            deliver = (a_carry > 0) & (queen_d <= 2.01)
            target = jnp.where(a_carry > 0, queen_t, food_t)
            new_pos = jnp.clip(_toward(a_pos, target), 1, self.size - 2)
            new_pos = jnp.where(a_alive > 0, new_pos, a_pos)
            new_carry = jnp.where(pickup, 1.0, jnp.where(deliver, 0.0, a_carry))
            return new_pos, new_carry * a_alive, pickup & (a_alive > 0), \
                deliver & (a_alive > 0)

        ant_keys = jax.random.split(k_ant, MAX_ANTS)
        ant_pos, ant_carry, picked, delivered = jax.vmap(per_ant)(
            s.ant_pos, ant_alive, s.ant_carry, ant_keys)

        # each picked food dies — the SAME nearest-food index (from the
        # ant's pre-move position) that triggered the pickup decision in
        # per_ant; two ants adjacent to one food both grab a piece (the
        # food dies once, both carry — a deliberate simplification of the
        # reference's sequential list mutation)
        def food_taken(_):
            taken = jnp.zeros((MAX_FOOD,))
            def body(i, acc):
                idx, _, _ = self._nearest(
                    s.ant_pos[i], s.food_pos, food_alive)
                return acc.at[idx].max(picked[i].astype(jnp.float32))
            return jax.lax.fori_loop(0, MAX_ANTS, body, taken)
        food_alive = food_alive * (1.0 - food_taken(None))

        # deliveries feed the nearest queen (+40 energy, ant.py:327-335) —
        # keyed on the same pre-move position as the deliver decision
        def queen_fed(_):
            fed = jnp.zeros((MAX_QUEENS,))
            def body(i, acc):
                idx, _, _ = self._nearest(
                    s.ant_pos[i], s.queen_pos, queen_alive)
                return acc.at[idx].add(
                    40.0 * delivered[i].astype(jnp.float32))
            return jax.lax.fori_loop(0, MAX_ANTS, body, fed)
        queen_energy = s.queen_energy + queen_fed(None)

        # ---- queens breed (ant.py:339-363) -------------------------------
        def breed(carry, i):
            ant_alive, ant_pos, queen_alive, queen_pos, queen_energy = carry
            k = jax.random.fold_in(k_breed, i)
            can = (queen_alive[i] > 0) & (queen_energy[i] > self.breed_threshold)
            as_queen = jax.random.uniform(jax.random.fold_in(k, 1)) < \
                self.queen_rate
            spawn_pos = jnp.clip(
                queen_pos[i] + jax.random.randint(
                    jax.random.fold_in(k, 2), (2,), -1, 2),
                1, self.size - 2)
            # first free slot in each population
            free_ant = jnp.argmin(ant_alive)
            free_queen = jnp.argmin(queen_alive)
            spawn_ant = can & ~as_queen & (ant_alive[free_ant] == 0)
            spawn_queen = can & as_queen & (queen_alive[free_queen] == 0)
            ant_alive = ant_alive.at[free_ant].max(
                spawn_ant.astype(jnp.float32))
            ant_pos = ant_pos.at[free_ant].set(
                jnp.where(spawn_ant, spawn_pos, ant_pos[free_ant]))
            queen_alive = queen_alive.at[free_queen].max(
                spawn_queen.astype(jnp.float32))
            queen_pos = queen_pos.at[free_queen].set(
                jnp.where(spawn_queen, spawn_pos, queen_pos[free_queen]))
            queen_energy = queen_energy.at[i].add(
                jnp.where(spawn_ant | spawn_queen, -self.breed_cost, 0.0))
            # low-energy queens wander (ant.py:361-363)
            wander = (queen_alive[i] > 0) & ~can
            step = jax.random.randint(jax.random.fold_in(k, 3), (2,), -1, 2)
            queen_pos = queen_pos.at[i].set(jnp.where(
                wander, jnp.clip(queen_pos[i] + step, 1, self.size - 2),
                queen_pos[i]))
            return (ant_alive, ant_pos, queen_alive, queen_pos,
                    queen_energy), None

        (ant_alive, ant_pos, queen_alive, queen_pos, queen_energy), _ = \
            jax.lax.scan(
                breed,
                (ant_alive, ant_pos, queen_alive, s.queen_pos, queen_energy),
                jnp.arange(MAX_QUEENS))

        # ---- food regrows (ant.py:365-369) --------------------------------
        free_food = jnp.argmin(food_alive)
        grow = (jax.random.uniform(k_food) < self.food_gen_rate) & \
            (food_alive[free_food] == 0)
        food_alive = food_alive.at[free_food].max(grow.astype(jnp.float32))
        food_pos = s.food_pos.at[free_food].set(jnp.where(
            grow, jax.random.randint(k_spawn, (2,), 1, self.size - 1),
            s.food_pos[free_food]))

        # ---- termination ---------------------------------------------------
        time = s.time + 1
        timeout = time >= self.spec.max_steps
        cleared = (jnp.sum(ant_alive) + jnp.sum(queen_alive)) == 0
        reward = reward - jnp.where(
            timeout, jnp.sum(ant_alive) + jnp.sum(queen_alive), 0.0)
        done = timeout | cleared

        if self.shaping:
            def potential(apos, a_pos, a_alive, q_pos, q_alive):
                d = jnp.concatenate([
                    jnp.where(a_alive > 0, jnp.sum(
                        (a_pos - apos[None]) ** 2, -1).astype(jnp.float32),
                        1e9),
                    jnp.where(q_alive > 0, jnp.sum(
                        (q_pos - apos[None]) ** 2, -1).astype(jnp.float32),
                        1e9)])
                dmin = jnp.min(d)
                any_alive = dmin < 1e8
                return jnp.where(any_alive, -jnp.sqrt(dmin), 0.0)

            phi0 = potential(s.pos, s.ant_pos, s.ant_alive,
                             s.queen_pos, s.queen_alive)
            phi1 = jnp.where(done, 0.0, potential(
                pos, ant_pos, ant_alive, queen_pos, queen_alive))
            reward = reward + self.shaping * (
                self.shaping_gamma * phi1 - phi0)

        new_state = AntState(
            pos=pos, direction=direction, energy=energy,
            ant_pos=ant_pos, ant_alive=ant_alive, ant_carry=ant_carry,
            queen_pos=queen_pos, queen_alive=queen_alive,
            queen_energy=queen_energy,
            food_pos=food_pos, food_alive=food_alive,
            time=time, key=key)
        return new_state, TimeStep(
            obs=self._obs(new_state), reward=reward.astype(jnp.float32),
            done=done,
            info={"colony": jnp.sum(ant_alive) + jnp.sum(queen_alive),
                  "cleared": cleared})


# ===========================================================================
# MiniGrid-Dog: herd the sheep into the fold (dog.py analog)
# ===========================================================================

MAX_SHEEP = 5   # 4 lambs + 1 ewe (slot 0 = ewe)


@struct.dataclass
class DogState:
    pos: Array           # [2] the dog
    sheep_pos: Array     # [MAX_SHEEP, 2]
    sheep_alive: Array   # [MAX_SHEEP]
    time: Array
    key: Array


@Registers.env.register(name="MiniGrid-Dog", aliases=("DogEnv", "MiniGridDog"))
class DogHerd(JaxEnv):
    """Push all sheep into the fold at the far corner.

    Actions (``dog.py:95-100``): 0 left, 1 right, 2 up, 3 down — absolute
    moves, no rotation.  Sheep within ``safe_dist`` of the dog flee
    directly away; otherwise the ewe wanders and lambs wander
    (p=``rand_rate``) or drift toward the ewe (``dog.py:268-281``).
    A sheep that lands on the fold is penned: +1 and removed.  Episode
    ends when the flock is penned; timeout costs −(sheep remaining)
    (``dog.py:261-266``)."""

    def __init__(self, size: int = 20, view: int = 7, max_steps: int = 400,
                 num_lamb: int = 4, safe_dist: float = 5.0,
                 rand_rate: float = 0.3, pixel: bool = True, **_kw):
        self.size = size
        self.view = view
        self.num_lamb = min(num_lamb, MAX_SHEEP - 1)
        self.safe_d2 = float(safe_dist) ** 2
        self.rand_rate = rand_rate
        self.pixel = pixel
        self.fold = jnp.asarray([size - 2, size - 2], jnp.int32)
        # walls grey, dog red, lambs white, ewe light-blue, fold brown
        self._colors = np.asarray(
            [[100, 100, 100], [255, 0, 0], [230, 230, 230],
             [100, 160, 255], [160, 90, 30]], np.float32)
        obs_shape = (84, 84, 3) if pixel else (view, view, 6)
        self.spec = EnvSpec(
            name="MiniGrid-Dog",
            obs_shape=obs_shape,
            obs_dtype=jnp.uint8 if pixel else jnp.float32,
            action_spec=Discrete(4),
            max_steps=max_steps,
        )

    def _planes(self, s: DogState) -> Array:
        size = self.size
        walls = jnp.zeros((size, size), jnp.float32)
        walls = walls.at[0, :].set(1).at[-1, :].set(1)
        walls = walls.at[:, 0].set(1).at[:, -1].set(1)
        dog = jnp.zeros((size, size), jnp.float32).at[
            s.pos[0], s.pos[1]].set(1.0)
        lambs = jnp.zeros((size, size), jnp.float32).at[
            s.sheep_pos[1:, 0], s.sheep_pos[1:, 1]].max(s.sheep_alive[1:])
        ewe = jnp.zeros((size, size), jnp.float32).at[
            s.sheep_pos[0, 0], s.sheep_pos[0, 1]].set(s.sheep_alive[0])
        fold = jnp.zeros((size, size), jnp.float32).at[
            self.fold[0], self.fold[1]].set(1.0)
        return jnp.stack([walls, dog, lambs, ewe, fold], axis=-1)

    def _obs(self, s: DogState) -> Array:
        planes = self._planes(s)
        if self.pixel:
            return _render_rgb(self.size, planes, self._colors)
        # ego view for the 4-dir dog: always "facing up"
        return _ego_view(self.size, planes, s.pos,
                         jnp.zeros((), jnp.int32), self.view)

    def _reset(self, key: Array):
        key, k_sheep, k_dog = jax.random.split(key, 3)
        sheep_pos = jax.random.randint(
            k_sheep, (MAX_SHEEP, 2), 1, self.size - 1)
        alive = (jnp.arange(MAX_SHEEP) < self.num_lamb + 1).astype(jnp.float32)
        state = DogState(
            pos=jnp.asarray([1, 1], jnp.int32),
            sheep_pos=sheep_pos, sheep_alive=alive,
            time=jnp.zeros((), jnp.int32), key=key)
        return state, self._obs(state)

    def _step(self, s: DogState, action):
        action = jnp.asarray(action, jnp.int32)
        key, k_move = jax.random.split(s.key)

        # dog: absolute 4-dir move (left/right/up/down — dog.py:236-258)
        deltas = jnp.asarray([[0, -1], [0, 1], [-1, 0], [1, 0]], jnp.int32)
        pos = jnp.clip(s.pos + deltas[action], 1, self.size - 2)

        # sheep dynamics (dog.py:268-281)
        def per_sheep(i, sp, alive):
            k = jax.random.fold_in(k_move, i)
            d2 = jnp.sum((sp - pos) ** 2).astype(jnp.float32)
            away = sp + _sign(sp - pos)
            rand_step = sp + jax.random.randint(
                jax.random.fold_in(k, 1), (2,), -1, 2)
            toward_ewe = _toward(sp, s.sheep_pos[0])
            wander = jax.random.uniform(jax.random.fold_in(k, 2)) < \
                self.rand_rate
            calm = jnp.where(
                (i == 0) | wander, rand_step, toward_ewe)  # ewe wanders
            new = jnp.where(d2 < self.safe_d2, away, calm)
            new = jnp.clip(new, 1, self.size - 2)
            return jnp.where(alive > 0, new, sp)

        sheep_pos = jax.vmap(per_sheep)(
            jnp.arange(MAX_SHEEP), s.sheep_pos, s.sheep_alive)

        # penned sheep: +1 each, removed (dog.py sheep_move_* rewards)
        penned = s.sheep_alive * jnp.all(
            sheep_pos == self.fold[None], axis=-1)
        reward = jnp.sum(penned)
        sheep_alive = s.sheep_alive * (1.0 - penned)

        time = s.time + 1
        remaining = jnp.sum(sheep_alive)
        timeout = time >= self.spec.max_steps
        reward = reward - jnp.where(timeout, remaining, 0.0)
        done = (remaining == 0) | timeout

        new_state = DogState(pos=pos, sheep_pos=sheep_pos,
                             sheep_alive=sheep_alive, time=time, key=key)
        return new_state, TimeStep(
            obs=self._obs(new_state), reward=reward.astype(jnp.float32),
            done=done,
            info={"remaining": remaining, "herded": remaining == 0})


# ===========================================================================
# MiniGrid-TrafficControl: junction crossing (traffic_control.py analog)
# ===========================================================================

@struct.dataclass
class TrafficState:
    route_id: Array      # [A] which of the 2 candidate routes (reset draw)
    idx: Array           # [A] position index along the route
    alive: Array         # [A] still driving
    collided: Array      # [A]
    time: Array
    key: Array


@Registers.env.register(
    name="MiniGrid-TrafficControl", aliases=("TrafficControlEnv",
                                             "MiniGridTrafficControl"))
class TrafficControl(JaxEnv):
    """Unified multi-agent junction crossing (``traffic_control.py``).

    ``map``: easy = 4 cars, moderate = 8 (two per approach).  Each car
    draws one of two candidate routes at reset (straight / turn,
    ``traffic_control.py:100-110``) and chooses per step between gas (1)
    and brake (0).  Rewards (``:51-54``): −0.02 per alive car per step,
    −2 on collision (both cars stop), +0.1 on exiting the map.  Team
    reward = sum; obs/state dimensioning matches the reference
    (``:84-86``): obs = row/col one-hots + agent id + route-choice
    one-hot, state = all cars' one-hots + choices."""

    api_type = "unified"

    def __init__(self, map: str = "easy", **_kw):
        if map == "easy":
            self.n_agents, straight = 4, 2
            self.max_steps = 20
        elif map == "moderate":
            self.n_agents, straight = 8, 2
            self.max_steps = 40
        else:
            raise ValueError(f"unknown traffic map {map!r} (easy|moderate)")
        self.W = (straight + 1) * 2           # world size (:61-65)
        self.routes = jnp.asarray(self._build_routes(), jnp.int32)
        self.L = self.routes.shape[2]
        obs_dim = self.W * 2 + self.n_agents + 2
        self.spec = EnvSpec(
            name=f"MiniGrid-TrafficControl-{map}",
            obs_shape=(obs_dim,),
            obs_dtype=jnp.float32,
            action_spec=Discrete(2),
            max_steps=self.max_steps,
            n_agents=self.n_agents,
            api_type="unified",
        )

    def _build_routes(self) -> np.ndarray:
        """[A, 2, L, 2] cell sequences: route 0 straight across, route 1
        turns at the junction; approaches rotate by agent index."""
        W, mid = self.W, self.W // 2
        L = 2 * W
        routes = np.zeros((self.n_agents, 2, L, 2), np.int64)
        for a in range(self.n_agents):
            side = a % 4
            lane = mid - 1 + (a // 4)        # moderate: second lane
            for choice in range(2):
                cells = []
                for t in range(W):           # straight segment
                    if side == 0:
                        cells.append((t, lane))
                    elif side == 1:
                        cells.append((lane, W - 1 - t))
                    elif side == 2:
                        cells.append((W - 1 - t, W - lane - 1))
                    else:
                        cells.append((W - lane - 1, t))
                if choice == 1:              # turn right at the junction
                    pivot = next(i for i, c in enumerate(cells)
                                 if c[0] in (mid - 1, mid)
                                 and c[1] in (mid - 1, mid))
                    head = cells[:pivot + 1]
                    r, c = cells[pivot]
                    dr, dc = (np.sign(r - cells[pivot - 1][0]) if pivot else 1,
                              np.sign(c - cells[pivot - 1][1]) if pivot else 0)
                    # rotate (dr,dc) right: (dr,dc) -> (dc,-dr)
                    dr, dc = dc, -dr
                    tail = []
                    rr, cc = r, c
                    while 0 <= rr + dr < W and 0 <= cc + dc < W:
                        rr, cc = rr + dr, cc + dc
                        tail.append((rr, cc))
                    cells = head + tail
                # pad by repeating a virtual off-map cell (-1, -1)
                cells = cells + [(-1, -1)] * (L - len(cells))
                routes[a, choice] = np.asarray(cells[:L])
        return routes

    # route length per (agent, choice): first index of the (-1,-1) pad
    def _route_len(self, a, choice):
        cells = self.routes[a, choice]
        valid = jnp.any(cells >= 0, axis=-1)
        return jnp.sum(valid.astype(jnp.int32))

    # -- unified API -------------------------------------------------------
    @property
    def global_state_dim(self) -> int:
        return self.W * 2 * self.n_agents + 2 * self.n_agents

    def _cells(self, s: TrafficState) -> Array:
        """Current cell per agent [A, 2]; (-1,-1) when exited/offmap."""
        idx = jnp.clip(s.idx, 0, self.L - 1)
        cells = self.routes[jnp.arange(self.n_agents), s.route_id, idx]
        return jnp.where(s.alive[:, None] > 0, cells, -1)

    def _per_agent_feats(self, s: TrafficState) -> Array:
        cells = self._cells(s)
        row1h = jax.nn.one_hot(jnp.clip(cells[:, 0], 0, self.W - 1), self.W)
        col1h = jax.nn.one_hot(jnp.clip(cells[:, 1], 0, self.W - 1), self.W)
        onmap = (cells[:, 0] >= 0).astype(jnp.float32)[:, None]
        choice1h = jax.nn.one_hot(s.route_id, 2)
        return jnp.concatenate(
            [row1h * onmap, col1h * onmap, choice1h], axis=-1)

    def global_state(self, s: TrafficState) -> Array:
        return self._per_agent_feats(s).reshape(-1)

    def avail_actions(self, s: TrafficState) -> Array:
        gas = s.alive
        brake = jnp.ones((self.n_agents,))
        return jnp.stack([brake, gas], axis=-1).astype(jnp.float32)

    def _obs(self, s: TrafficState) -> Array:
        feats = self._per_agent_feats(s)          # [A, 2W+2]
        ids = jnp.eye(self.n_agents)
        return jnp.concatenate([feats[:, :2 * self.W], ids,
                                feats[:, 2 * self.W:]], axis=-1)

    def _reset(self, key: Array):
        key, k_route, k_init = jax.random.split(key, 3)
        route_id = jax.random.randint(k_route, (self.n_agents,), 0, 2)
        idx = jax.random.randint(k_init, (self.n_agents,), 0, 2)
        state = TrafficState(
            route_id=route_id, idx=idx,
            alive=jnp.ones((self.n_agents,)),
            collided=jnp.zeros((self.n_agents,)),
            time=jnp.zeros((), jnp.int32), key=key)
        return state, self._obs(state)

    def _step(self, s: TrafficState, actions):
        actions = jnp.asarray(actions, jnp.int32)
        lens = jax.vmap(
            lambda a, c: self._route_len(a, c))(
            jnp.arange(self.n_agents), s.route_id)

        idx = s.idx + actions * (s.alive > 0)
        exited = (idx >= lens) & (s.alive > 0)
        alive = s.alive * (1.0 - exited.astype(jnp.float32))

        tmp = s.replace(idx=jnp.minimum(idx, self.L - 1), alive=alive)
        cells = self._cells(tmp)
        same = jnp.all(cells[:, None, :] == cells[None, :, :], axis=-1)
        onmap = (cells[:, 0] >= 0)
        clash = same & onmap[:, None] & onmap[None, :] & \
            ~jnp.eye(self.n_agents, dtype=bool)
        collided_now = jnp.any(clash, axis=-1).astype(jnp.float32) * alive
        alive = alive * (1.0 - collided_now)

        reward = (-0.02 * jnp.sum(alive)
                  - 2.0 * jnp.sum(collided_now)
                  + 0.1 * jnp.sum(exited))
        time = s.time + 1
        done = (jnp.sum(alive) == 0) | (time >= self.max_steps)

        new_state = TrafficState(
            route_id=s.route_id, idx=jnp.minimum(idx, self.L - 1),
            alive=alive, collided=s.collided + collided_now,
            time=time, key=s.key)
        return new_state, TimeStep(
            obs=self._obs(new_state), reward=reward.astype(jnp.float32),
            done=done,
            info={"global_state": self.global_state(new_state),
                  "collisions": jnp.sum(new_state.collided),
                  "battle_won": (jnp.sum(new_state.collided) == 0) & done})
