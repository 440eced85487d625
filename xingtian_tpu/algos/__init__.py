"""Algorithm package — registered training algorithms.

Inventory target (reference ``xt/algorithm/*``): PPO, DQN/DDQN, IMPALA
(+opt), MuZero, QMIX, SCC, PBT.  Implemented so far: see imports below.
"""

from xingtian_tpu.algos.base import Algorithm, AlgoState
from xingtian_tpu.algos import ppo  # noqa: F401
from xingtian_tpu.algos import dqn  # noqa: F401
from xingtian_tpu.algos import impala  # noqa: F401
from xingtian_tpu.algos.ppo import PPO
from xingtian_tpu.algos.dqn import DQN
from xingtian_tpu.algos.impala import IMPALA

__all__ = ["Algorithm", "AlgoState", "DQN", "IMPALA", "PPO"]
