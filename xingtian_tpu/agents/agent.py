"""Agent — the user-extensible interaction-policy block.

Reference contract (``xt/agent/agent.py:35-220`` + builder
``xt/agent/__init__.py:21-32``): users subclass ``Agent`` and override
``infer_action`` (action selection from model output) and
``handle_env_feedback`` / ``get_trajectory`` (per-step bookkeeping and
trajectory post-processing, e.g. the custom GAE + one-hot labels in
``xt/agent/ppo/cartpole_ppo.py:88-117``).  The reference agent also OWNS
the interaction loop; here the loop is the fused ``lax.scan`` rollout
inside the algorithm, so the TPU-native agent is a pair of *pure-function
hooks* the algorithm threads through its jitted train step:

* ``infer_action(params_pack, obs, key) -> (action, extras)`` — replaces
  the algorithm's default action selection.  ``params_pack`` is whatever
  the algorithm passes to its policy (PPO/IMPALA: the param pytree;
  DQN: ``(params, env_steps, hypers)`` for the ε schedule).  Must be
  jit-traceable.
* ``transform_trajectory(traj) -> traj`` — trajectory post-processing
  between rollout and update (reward shaping, relabeling, custom
  advantage inputs).  Runs inside the jitted step, so it is free on the
  host and fuses with the update.

Agents are YAML-selected by ``agent_para.agent_name`` through
``Registers.agent`` / ``agent_builder`` exactly like the other three
blocks; names unknown to the registry fall back to :class:`DefaultAgent`
(the reference's per-algorithm agent behaviours — vectorized stepping,
ε-schedules, GAE — are already native to the algorithms/envs here, so the
stock names are behaviour-preserving aliases of the default).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax

from xingtian_tpu.agents.rollout import Trajectory
from xingtian_tpu.registry import Registers

Array = jax.Array


class Agent:
    """Base agent: delegate to the algorithm's native behaviour."""

    def __init__(self, alg=None, config: Optional[dict] = None):
        self.alg = alg
        self.config = dict(config or {})

    # -- hooks --------------------------------------------------------
    def infer_action(self, params_pack: Any, obs: Array,
                     key: Array) -> Tuple[Array, Dict[str, Array]]:
        """Action selection (``xt/agent/agent.py`` infer_action parity).

        Default: the algorithm's own policy function.
        """
        return self.alg.policy_fn(params_pack, obs, key)

    def transform_trajectory(self, traj: Trajectory) -> Trajectory:
        """Post-process the rollout before the update (``get_trajectory``
        / ``data_proc`` parity).  Default: identity."""
        return traj


@Registers.agent.register(name="DefaultAgent", aliases=(
    # stock per-algorithm agent names from the reference's examples/
    # (xt/agent/{ppo,dqn,impala,muzero,qmix}/...): their specific
    # behaviours — vector envs, ε-greedy schedules, GAE, MCTS acting —
    # are native to the corresponding algorithms here, so the names map
    # to the behaviour-preserving default hooks.
    "PPO", "CartpolePpo", "AtariPpo", "PendulumPpo", "PigsPpo",
    "DQN", "CartpoleDqn", "AtariDqn", "InfoFlowDqn",
    "IMPALA", "CartpoleImpala", "AtariImpala", "AtariImpalaOpt",
    "CartpoleMuzero", "MuzeroAtari", "AtariMuzero",
    "StarcraftQmix", "StarcraftScc", "Qmix", "Scc",
))
class DefaultAgent(Agent):
    pass


def build_agent(agent_name: str, alg=None,
                config: Optional[dict] = None) -> Agent:
    """``agent_builder`` front-end: resolve by name, default when unknown."""
    if agent_name in Registers.agent:
        return Registers.agent.build(agent_name, alg=alg, config=config)
    return DefaultAgent(alg=alg, config=config)
