"""Worker for the 2-process ``jax.distributed`` test (run as a subprocess).

Each process contributes 2 virtual CPU devices; together they form a
4-device global mesh.  One PPO dp step runs over the combined mesh —
the rebuild's answer to the reference's localhost-patched distribution
test (``zeus/common/util/get_xt_config.py:149-176``), except the
collective program actually executes across process boundaries.
"""

import os
import sys

# repo root on sys.path (PYTHONPATH is off-limits: it breaks axon PJRT
# plugin discovery — see .claude/skills/verify)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")   # before any backend init


def main() -> int:
    from xingtian_tpu.parallel.distributed import init_distributed

    info = init_distributed()    # XT_COORDINATOR / XT_NUM_PROCESSES / XT_PROCESS_ID
    assert info["num_processes"] == 2, info
    assert info["local_devices"] == 2, info
    assert info["global_devices"] == 4, info

    from xingtian_tpu.algos.ppo import PPO
    from xingtian_tpu.envs import VecEnv, make
    from xingtian_tpu.parallel import make_dp_step, make_mesh
    from xingtian_tpu.registry import Registers

    env = VecEnv(make("CartPole-v0"), n=8)
    model = Registers.model.build("PpoMlp", state_dim=[4], action_dim=2)
    alg = PPO(model, env, dict(rollout_steps=8, BATCH_SIZE=16, NUM_SGD_ITER=1))
    state = alg.init_state(jax.random.PRNGKey(0))

    mesh = make_mesh()            # all 4 global devices
    assert mesh.shape["dp"] == 4
    placed, step = make_dp_step(alg, mesh, state, donate=False)
    new_state, metrics = step(placed)
    jax.block_until_ready(metrics)

    loss = float(metrics["loss"])            # replicated → addressable
    assert loss == loss, "loss is NaN"
    assert int(new_state.update_step) == 1
    print(f"proc {info['process_id']} ok loss={loss:.6f}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
