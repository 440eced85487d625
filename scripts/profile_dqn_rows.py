"""Profile the pixel-DQN matrix rows (VERDICT r2 weak #7: qbert_dqn ran
at 1,099 steps/s vs ~4k for the other analogs, unexplained).

Times the jitted fused train_step for each pixel game at the matrix
config (32 envs, T=16, UPDATE_FREQ=16, double-DQN, 100k packed ring) and
prints a per-row breakdown: rollout-only step vs full step (replay +
updates), isolating whether the env dynamics or the update path differs.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))


def time_state_step(step, state, iters=5):
    """Time a (state -> (state, aux)) step, REBINDING the state each call
    so only one generation of the (2.8 GB) replay ring is live at a time
    (holding the original across iterations OOMs the chip)."""
    state, aux = step(state)
    jax.block_until_ready(aux)
    t0 = time.time()
    for _ in range(iters):
        state, aux = step(state)
    jax.block_until_ready(aux)
    return (time.time() - t0) / iters, state


def main() -> None:
    import jax.numpy as jnp
    from xingtian_tpu.algos.dqn import DQN
    from xingtian_tpu.agents.rollout import rollout
    from xingtian_tpu.envs import VecEnv, make
    from xingtian_tpu.registry import Registers

    games = os.environ.get(
        "XT_GAMES", "BreakoutPixel,QBertPixel,SpaceInvadersPixel").split(",")
    for game in games:
        env = VecEnv(make(game), n=32)
        model = Registers.model.build(
            "DqnCnn", state_dim=[84, 84, 4],
            action_dim=env.spec.action_dim, input_dtype="uint8")
        alg = DQN(model, env, dict(
            rollout_steps=16, BUFFER_SIZE=100_000, BATCH_SIZE=32,
            UPDATE_FREQ=16, learning_starts=0, double_dqn=True,
            EPS_DECAY_STEPS=1_000_000))
        state = alg.init_state(jax.random.PRNGKey(0))

        full = jax.jit(alg.train_step)
        t_full, state = time_state_step(full, state)

        def rollout_only(s):
            env_state, last_obs, ep_stats, traj = rollout(
                alg.env, alg._policy, (s.params, s.env_steps, s.hypers),
                s.env_state, s.obs, s.ep_stats, jax.random.PRNGKey(1), 16)
            return s.replace(env_state=env_state, obs=last_obs,
                             ep_stats=ep_stats), traj.reward.sum()

        ro = jax.jit(rollout_only)
        t_ro, state = time_state_step(ro, state)
        del state, alg, env
        n = 16 * 32
        print(f"{game}: full {t_full*1e3:.1f} ms ({n/t_full:.0f} steps/s)  "
              f"rollout-only {t_ro*1e3:.1f} ms ({n/t_ro:.0f} steps/s)",
              flush=True)


if __name__ == "__main__":
    main()
