"""MiniGrid task suite (ant/dog/traffic) + MsPacman analogs.

Reference: ``xt/environment/MiniGrid/{ant,dog,traffic_control}.py`` and
the MsPacman rows of ``examples/evolution/*.yaml``.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xingtian_tpu.envs import VecEnv, make


class TestAntHunt:
    def test_pixel_obs_geometry(self):
        env = make("MiniGrid-Ant-v0")
        s, o = env.reset(jax.random.PRNGKey(0))
        assert o.shape == (84, 84, 3) and o.dtype == jnp.uint8
        assert env.spec.action_spec.n == 4     # left/right/fwd/attack

    def test_attack_kills_and_rewards(self):
        env = make("MiniGrid-Ant", pixel=False)
        s, _ = env.reset(jax.random.PRNGKey(0))
        # plant an ant directly ahead of the agent and attack
        fwd = s.pos + jnp.asarray(
            [[-1, 0], [0, 1], [1, 0], [0, -1]], jnp.int32)[s.direction]
        s = s.replace(ant_pos=s.ant_pos.at[0].set(fwd),
                      ant_alive=s.ant_alive.at[0].set(1.0))
        before = float(jnp.sum(s.ant_alive))
        s2, ts = env.step(s, jnp.asarray(3))
        assert float(ts.reward) >= 1.0
        assert float(jnp.sum(s2.ant_alive)) <= before  # kill vs breeding race

    def test_timeout_penalizes_survivors(self):
        env = make("MiniGrid-Ant", pixel=False, max_steps=3,
                   food_gen_rate=0.0)
        s, _ = env.reset(jax.random.PRNGKey(1))
        for _ in range(3):
            s, ts = env.step(s, jnp.asarray(0))
        assert bool(ts.done)
        assert float(ts.reward) <= -1.0        # −(ants + queens alive)

    def test_colony_breeds(self):
        env = make("MiniGrid-Ant", pixel=False, breed_threshold=5.0)
        s, _ = env.reset(jax.random.PRNGKey(2))
        s = s.replace(queen_energy=s.queen_energy.at[0].set(100.0))
        grew = False
        n0 = float(jnp.sum(s.ant_alive) + jnp.sum(s.queen_alive))
        for _ in range(10):
            s, ts = env.step(s, jnp.asarray(0))
            n = float(jnp.sum(s.ant_alive) + jnp.sum(s.queen_alive))
            grew = grew or n > n0
        assert grew

    def test_vmap_rollout(self):
        env = VecEnv(make("MiniGrid-Ant", pixel=False), n=4)
        s, o = env.reset(jax.random.PRNGKey(3))
        assert o.shape == (4, 7, 7, 6)
        s, ts = jax.jit(env.step)(s, jnp.zeros(4, jnp.int32))
        assert np.all(np.isfinite(np.asarray(ts.reward)))

    def test_shaping_default_off_is_bit_identical(self):
        base = make("MiniGrid-Ant", pixel=False)
        off = make("MiniGrid-Ant", pixel=False, shaping=0.0)
        sb, _ = base.reset(jax.random.PRNGKey(7))
        so, _ = off.reset(jax.random.PRNGKey(7))
        for a in (2, 2, 3, 0, 2):
            sb, tb = base.step(sb, jnp.asarray(a))
            so, to = off.step(so, jnp.asarray(a))
            assert float(tb.reward) == float(to.reward)

    def test_shaping_is_potential_based(self):
        """Shaped reward = base reward + λ·(γΦ(s′) − Φ(s)) with
        Φ(s) = −√dist-to-nearest-alive-target — verified against an
        independent numpy recomputation over a mixed action rollout."""
        lam, gamma = 0.5, 0.9
        base = make("MiniGrid-Ant", pixel=False, food_gen_rate=0.0)
        shaped = make("MiniGrid-Ant", pixel=False, food_gen_rate=0.0,
                      shaping=lam, shaping_gamma=gamma)

        def phi(s):
            pos = np.asarray(s.pos, np.float32)
            d = []
            for p, alive in ((s.ant_pos, s.ant_alive),
                             (s.queen_pos, s.queen_alive)):
                p, alive = np.asarray(p, np.float32), np.asarray(alive)
                dd = np.sum((p - pos[None]) ** 2, -1)
                d.append(np.where(alive > 0, dd, 1e9))
            dmin = np.min(np.concatenate(d))
            return -np.sqrt(dmin) if dmin < 1e8 else 0.0

        sb, _ = base.reset(jax.random.PRNGKey(11))
        ss, _ = shaped.reset(jax.random.PRNGKey(11))
        for a in (2, 1, 2, 3, 2, 0, 2, 2):
            sb2, tb = base.step(sb, jnp.asarray(a))
            ss2, ts_ = shaped.step(ss, jnp.asarray(a))
            expect = float(tb.reward) + lam * (
                (0.0 if bool(ts_.done) else gamma * phi(ss2)) - phi(ss))
            assert abs(float(ts_.reward) - expect) < 1e-4
            sb, ss = sb2, ss2
            if bool(tb.done):
                break


class TestDogHerd:
    def test_pixel_obs_geometry(self):
        env = make("MiniGrid-Dog-v0")
        s, o = env.reset(jax.random.PRNGKey(0))
        assert o.shape == (84, 84, 3) and o.dtype == jnp.uint8
        assert env.spec.action_spec.n == 4     # absolute 4-dir moves

    def test_sheep_flee_from_dog(self):
        env = make("MiniGrid-Dog", pixel=False, rand_rate=0.0)
        s, _ = env.reset(jax.random.PRNGKey(0))
        # put the dog right next to lamb 1
        s = s.replace(pos=s.sheep_pos[1] + jnp.asarray([1, 0], jnp.int32))
        d_before = jnp.sum((s.sheep_pos[1] - s.pos) ** 2)
        s2, _ = env.step(s, jnp.asarray(0))
        d_after = jnp.sum((s2.sheep_pos[1] - s2.pos) ** 2)
        assert float(d_after) >= float(d_before)

    def test_penned_sheep_reward_and_removal(self):
        env = make("MiniGrid-Dog", pixel=False)
        s, _ = env.reset(jax.random.PRNGKey(1))
        # park lamb 1 adjacent to the fold with the dog close behind so its
        # flee step pushes it onto the fold cell
        fold = env.fold
        s = s.replace(
            sheep_pos=s.sheep_pos.at[1].set(fold - 1),
            pos=fold - 2)
        s2, ts = env.step(s, jnp.asarray(1))
        if float(ts.reward) >= 1.0:            # pushed in
            assert float(s2.sheep_alive[1]) == 0.0

    def test_timeout_penalizes_flock(self):
        env = make("MiniGrid-Dog", pixel=False, max_steps=2)
        s, _ = env.reset(jax.random.PRNGKey(2))
        for _ in range(2):
            s, ts = env.step(s, jnp.asarray(0))
        assert bool(ts.done) and float(ts.reward) <= -1.0


class TestTrafficControl:
    def test_unified_spec_matches_reference_dims(self):
        env = make("MiniGrid-TrafficControl-v0")
        W, A = env.W, env.spec.n_agents
        assert env.spec.api_type == "unified" and A == 4
        assert env.spec.obs_shape == (W * 2 + A + 2,)   # traffic_control.py:84
        assert env.global_state_dim == W * 2 * A + 2 * A  # :85

    def test_moderate_map(self):
        env = make("MiniGrid-TrafficControl", map="moderate")
        assert env.spec.n_agents == 8 and env.max_steps == 40

    def test_all_brake_only_time_penalty(self):
        env = make("MiniGrid-TrafficControl")
        s, _ = env.reset(jax.random.PRNGKey(0))
        s, ts = env.step(s, jnp.zeros(4, jnp.int32))
        np.testing.assert_allclose(float(ts.reward), -0.08, atol=1e-6)
        assert float(ts.info["collisions"]) == 0

    def test_exit_bonus_and_termination(self):
        env = make("MiniGrid-TrafficControl")
        s, _ = env.reset(jax.random.PRNGKey(1))
        total, done = 0.0, False
        # one car drives, three brake → it exits without collision
        acts = jnp.asarray([1, 0, 0, 0], jnp.int32)
        for _ in range(env.max_steps):
            s, ts = env.step(s, acts)
            total += float(ts.reward)
            if bool(ts.done):
                done = True
                break
        assert float(s.collided[0]) == 0.0
        assert float(s.alive[0]) == 0.0        # exited

    def test_collisions_penalized(self):
        env = make("MiniGrid-TrafficControl")
        s, _ = env.reset(jax.random.PRNGKey(2))
        # stage a deterministic crash: straight routes 0 and 1 both reach
        # the junction cell on the next gas step
        s = s.replace(route_id=jnp.zeros(4, jnp.int32),
                      idx=jnp.asarray([1, 2, 0, 0], jnp.int32))
        s2, ts = env.step(s, jnp.asarray([1, 1, 0, 0], jnp.int32))
        assert float(s2.collided[0]) == 1.0 and float(s2.collided[1]) == 1.0
        assert float(ts.reward) <= -4.0 + 0.2   # two collision penalties
        assert float(s2.alive[0]) == 0.0

    def test_qmix_trains_on_traffic(self):
        from xingtian_tpu.algos.qmix import QMIX
        env = make("MiniGrid-TrafficControl")
        alg = QMIX(env, dict(episodes_per_collect=4, BATCH_SIZE=8,
                             BUFFER_SIZE=64, learning_starts=4,
                             train_per_collect=1))
        state = alg.init_state(jax.random.PRNGKey(0))
        step = jax.jit(alg.train_step)
        for _ in range(3):
            state, metrics = step(state)
        assert np.isfinite(float(metrics["loss"]))


class TestMsPacman:
    def test_ale_shim_and_geometry(self):
        from xingtian_tpu.registry import Registers
        env = Registers.env.build("AtariEnv", name="MsPacmanNoFrameskip-v4")
        assert env.spec.obs_shape == (84, 84, 4)
        assert env.spec.action_spec.n == 9      # ALE MsPacman minimal set

    def test_pellet_scoring(self):
        env = make("MsPacman")
        s, _ = env.reset(jax.random.PRNGKey(0))
        # move onto a known pellet cell next to the start
        target = s.pos + jnp.asarray([-1, 0], jnp.int32)
        assert float(s.pellets[target[0], target[1]]) == 1.0
        s2, ts = env.step(s, jnp.asarray(1))    # UP
        assert float(ts.reward) == 10.0
        assert float(s2.pellets[target[0], target[1]]) == 0.0

    def test_power_pellet_scares_and_ghost_eaten(self):
        env = make("MsPacman")
        s, _ = env.reset(jax.random.PRNGKey(0))
        # teleport next to a power pellet, eat it → scare timer set
        s = s.replace(pos=jnp.asarray([1, 2], jnp.int32))
        s2, ts = env.step(s, jnp.asarray(3))    # LEFT onto (1,1)
        assert float(ts.reward) == 50.0
        assert int(s2.scare) > 0

    def test_death_costs_life(self):
        env = make("MsPacman", chase_prob=1.0)
        s, _ = env.reset(jax.random.PRNGKey(1))
        # ghost adjacent + always-chase: it steps onto the NOOPing player
        adj = s.pos + jnp.asarray([-1, 0], jnp.int32)
        s = s.replace(ghost_pos=s.ghost_pos.at[0].set(adj))
        s2, ts = env.step(s, jnp.asarray(0))
        assert int(s2.lives) == 2
        # player respawned at start after losing the life
        np.testing.assert_array_equal(np.asarray(s2.pos), np.asarray(s.pos))

    def test_vmap_episode(self):
        env = VecEnv(make("MsPacman"), n=8)
        s, o = env.reset(jax.random.PRNGKey(2))
        step = jax.jit(env.step)
        for _ in range(10):
            s, ts = step(s, jnp.zeros(8, jnp.int32))
        assert np.all(np.isfinite(np.asarray(ts.reward)))
