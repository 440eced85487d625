"""Algorithm package — registered training algorithms.

Inventory target (reference ``xt/algorithm/*``): PPO, DQN/DDQN, IMPALA
(+opt), MuZero, QMIX, SCC, PBT.  Implemented so far: see imports below.
"""

from xingtian_tpu.algos.base import Algorithm, AlgoState
from xingtian_tpu.algos import ppo  # noqa: F401
from xingtian_tpu.algos import dqn  # noqa: F401
from xingtian_tpu.algos import impala  # noqa: F401
from xingtian_tpu.algos import qmix  # noqa: F401
from xingtian_tpu.algos import scc  # noqa: F401
from xingtian_tpu.algos import muzero  # noqa: F401
from xingtian_tpu.algos.ppo import PPO
from xingtian_tpu.algos.dqn import DQN
from xingtian_tpu.algos.impala import IMPALA
from xingtian_tpu.algos.qmix import QMIX
from xingtian_tpu.algos.muzero import MuZero
from xingtian_tpu.algos.pbt import PopulationPBT

__all__ = ["Algorithm", "AlgoState", "DQN", "IMPALA", "MuZero",
           "PBT", "PPO", "PopulationPBT", "QMIX"]
