"""Multi-agent environments — the ``unified`` API surface.

The reference's multi-agent path (``api_type == "unified"``,
``xt/framework/agent_group.py:320-419``) steps all agents in lockstep:
group inference → ``env.step(action_dict)`` → shared feedback.  Here a
unified env is a pure function over the whole agent team:

* ``reset(key) -> (state, obs[n_agents, ...])``
* ``step(state, actions[n_agents]) -> (state, TimeStep)`` where
  ``ts.obs`` is per-agent, ``ts.reward`` is the TEAM reward (scalar) and
  ``ts.info['global_state']`` carries the centralized-critic state vector
  (QMIX's mixing network input; SMAC's ``get_state`` analog,
  ``xt/environment/ma/env_starcraft.py``).

:class:`CatchPigs` is the capability analog of the reference's 2-agent
``CatchPigs`` grid game (``xt/environment/ma/catchpigs.py`` +
1133-LoC ``env_CatchPigs.py``): two hunters must simultaneously flank a
fleeing pig.  SMAC itself is a native sim → it would enter through the
host env farm (``xingtian_tpu/envs/host.py``), not this module.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from xingtian_tpu.registry import Registers
from xingtian_tpu.envs.core import Discrete, EnvSpec, JaxEnv, TimeStep, Wrapper

SIZE = 7          # grid side
N_AGENTS = 2
N_ACTIONS = 5     # noop, up, down, left, right

_MOVES = jnp.asarray([[0, 0], [-1, 0], [1, 0], [0, -1], [0, 1]], jnp.int32)


@struct.dataclass
class CatchPigsState:
    agents: jax.Array      # [2, 2] (row, col)
    pig: jax.Array         # [2]
    time: jax.Array
    key: jax.Array


@Registers.env.register(name="CatchPigs", aliases=("MaEnvCatchPigs",))
class CatchPigs(JaxEnv):
    """Two hunters corner a fleeing pig on a 7×7 grid.

    The pig takes the move maximizing its distance to the nearest hunter
    (ties broken randomly).  The team scores +1 and the episode ends when
    both hunters are orthogonally adjacent to the pig at once; −0.01 step
    cost otherwise.  Per-agent observation: 3 channel planes (self,
    teammate, pig) over the full grid; global state: all positions,
    normalized.
    """

    def __init__(self, max_steps: int = 100, pig_laziness: float = 0.5,
                 shaped: bool = True, **_kw):
        """``pig_laziness``: probability the pig stays put on a step;
        ``shaped``: add +0.01 per adjacent hunter per step (else pure
        sparse catch reward, the reference's harder setting)."""
        self.pig_laziness = float(pig_laziness)
        self.shaped = bool(shaped)
        self.spec = EnvSpec(
            name="CatchPigs",
            obs_shape=(SIZE * SIZE * 3,),
            obs_dtype=jnp.float32,
            action_spec=Discrete(N_ACTIONS),
            max_steps=max_steps,
            n_agents=N_AGENTS,
            api_type="unified",
        )

    @property
    def global_state_dim(self) -> int:
        return 2 * (N_AGENTS + 1)

    def _plane(self, pos):
        rows = jnp.arange(SIZE)[:, None]
        cols = jnp.arange(SIZE)[None, :]
        return ((rows == pos[0]) & (cols == pos[1])).astype(jnp.float32)

    def _obs(self, s: CatchPigsState) -> jax.Array:
        def agent_obs(i):
            me = self._plane(s.agents[i])
            mate = self._plane(s.agents[1 - i])
            pig = self._plane(s.pig)
            return jnp.stack([me, mate, pig], axis=-1).reshape(-1)
        return jnp.stack([agent_obs(0), agent_obs(1)])

    def global_state(self, s: CatchPigsState) -> jax.Array:
        flat = jnp.concatenate([s.agents.reshape(-1), s.pig])
        return flat.astype(jnp.float32) / (SIZE - 1)

    def _reset(self, key):
        key, sub = jax.random.split(key)
        # distinct random cells for agents + pig
        cells = jax.random.choice(
            sub, SIZE * SIZE, (N_AGENTS + 1,), replace=False)
        pos = jnp.stack([cells // SIZE, cells % SIZE], axis=-1).astype(jnp.int32)
        state = CatchPigsState(
            agents=pos[:N_AGENTS], pig=pos[N_AGENTS],
            time=jnp.zeros((), jnp.int32), key=key)
        return state, self._obs(state)

    def _step(self, s: CatchPigsState, actions):
        actions = jnp.asarray(actions, jnp.int32).reshape(N_AGENTS)
        agents = jnp.clip(s.agents + _MOVES[actions], 0, SIZE - 1)

        # pig flees: pick the move maximizing distance to the nearest hunter
        # (with probability ``pig_laziness`` it stays put this step)
        key, k_tie, k_lazy = jax.random.split(s.key, 3)
        cand = jnp.clip(s.pig[None, :] + _MOVES, 0, SIZE - 1)     # [5, 2]
        d = jnp.abs(cand[:, None, :] - agents[None, :, :]).sum(-1)  # [5, 2]
        nearest = jnp.min(d, axis=1).astype(jnp.float32)            # [5]
        nearest = nearest + 0.01 * jax.random.uniform(k_tie, (N_ACTIONS,))
        flee = cand[jnp.argmax(nearest)]
        lazy = jax.random.uniform(k_lazy, ()) < self.pig_laziness
        pig = jnp.where(lazy, s.pig, flee)

        adj = jnp.abs(agents - pig[None, :]).sum(-1) == 1           # [2]
        caught = jnp.all(adj)
        n_adj = jnp.sum(adj.astype(jnp.float32))
        # small enough that hovering adjacent (+0.01 − 0.01 step cost = 0)
        # never beats catching (+1 and episode end)
        shaping = 0.01 * n_adj if self.shaped else 0.0
        reward = (jnp.where(caught, 1.0, -0.01) + shaping).astype(jnp.float32)

        # per-agent credit (reference computes distinct reward_1/reward_2
        # with per-agent wall penalties, env_CatchPigs.py): own adjacency
        # shaping + a wall-bump penalty; the shared catch/step terms match
        # the team signal.  Consumed by TeamFlatten for shared-policy
        # training; unified trainers (QMIX) keep the team scalar above.
        bumped = jnp.any(
            (s.agents + _MOVES[actions]) != agents, axis=-1)        # [2]
        agent_shaping = 0.01 * adj.astype(jnp.float32) if self.shaped else 0.0
        agent_rewards = (jnp.where(caught, 1.0, -0.01)
                         + agent_shaping
                         - 0.01 * bumped.astype(jnp.float32)
                         ).astype(jnp.float32)

        time = s.time + 1
        new_state = CatchPigsState(agents=agents, pig=pig, time=time, key=key)
        done = caught | (time >= self.spec.max_steps)
        return new_state, TimeStep(
            obs=self._obs(new_state),
            reward=reward,
            done=done,
            info={
                "global_state": self.global_state(new_state),
                "caught": caught,
                "agent_rewards": agent_rewards,
            },
        )


class TeamFlatten(Wrapper):
    """Drive a *unified* multi-agent env with a *standalone* shared-policy
    algorithm by folding the agent axis into the batch axis.

    This is the reference's shared-model multi-agent PPO
    (``examples/ma_cases/ppo_share_catch_pigs.yaml``: ``agent_num: 2`` PPO
    agents holding one ``PpoCnn`` — each agent is an independent training
    sample, rewarded with the team signal).  Wraps a :class:`VecEnv` of
    ``n`` unified envs (k agents each) and presents a standalone batch of
    ``n·k``: observations/actions gain no extra axis; rewards come from
    the env's per-agent credit (``info['agent_rewards']``) when it
    provides one, else the team scalar replicated; done is replicated.

    Info-leaf placement: leaves carrying a per-agent axis
    (``terminal_obs`` [n, k, ...], ``agent_rewards``) are *flattened*
    into the agent-major batch; everything else (global_state, flags) is
    replicated per agent slot.  Note: replicated ``done`` makes episode
    *counters* tick k× per real episode (mean returns are unaffected).
    """

    def __init__(self, venv, n_agents: int):
        super().__init__(venv)
        self.k = int(n_agents)
        self.n = venv.n * self.k
        inner = venv.spec
        self.spec = EnvSpec(
            name=inner.name, obs_shape=inner.obs_shape,
            obs_dtype=inner.obs_dtype, action_spec=inner.action_spec,
            max_steps=inner.max_steps, n_agents=1, api_type="standalone")

    def _flat(self, x):
        return x.reshape((self.n,) + x.shape[2:])

    def _rep(self, x):
        return jnp.repeat(x, self.k, axis=0)

    def _reset(self, key):
        state, obs = self.env.reset(key)
        return state, self._flat(obs)

    # info keys whose leaves carry the [n, k, ...] agent axis
    _AGENT_AXIS_KEYS = ("terminal_obs", "agent_rewards")

    def _step(self, state, action):
        action = action.reshape((self.env.n, self.k) + action.shape[1:])
        state, ts = self.env.step(state, action)
        info = dict(ts.info)
        agent_rewards = info.pop("agent_rewards", None)
        reward = (self._flat(agent_rewards) if agent_rewards is not None
                  else self._rep(ts.reward))
        info = {
            k: (self._flat(v) if k in self._AGENT_AXIS_KEYS else self._rep(v))
            for k, v in info.items()
        }
        return state, TimeStep(
            obs=self._flat(ts.obs),
            reward=reward,
            done=self._rep(ts.done),
            info=info,
        )
