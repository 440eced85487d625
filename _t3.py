import sys, time, json
B, T = int(sys.argv[1]), int(sys.argv[2])
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import xingtian_tpu
from xingtian_tpu.registry import Registers
from xingtian_tpu.envs import make, VecEnv
from xingtian_tpu.algos.ppo import PPO
env = VecEnv(make("BreakoutPixel"), n=B)
m = Registers.model.build("PpoCnn", state_dim=[84,84,4], action_dim=4, input_dtype="uint8",
                          model_config={"hidden_sizes":[256]})
alg = PPO(m, env, dict(rollout_steps=T, BATCH_SIZE=(B*T)//4, NUM_SGD_ITER=4))
s = alg.init_state(jax.random.PRNGKey(0))
step = jax.jit(alg.train_step)
t0=time.time()
try:
    s, mo = step(s); jax.block_until_ready(mo)
    print(f"B={B} T={T} first OK {time.time()-t0:.0f}s", flush=True)
    t0=time.time()
    for _ in range(3): s, mo = step(s)
    jax.block_until_ready(mo)
    print(json.dumps({"B":B,"T":T,"steps_per_s":round(3*B*T/(time.time()-t0))}), flush=True)
except Exception as e:
    print(f"B={B} T={T} FAIL: {str(e)[:150]}", flush=True)
