"""Model package: flax modules, distributions, registered model zoo."""

from xingtian_tpu.models.distributions import Categorical, DiagGaussian, make_dist
from xingtian_tpu.models.policy import ActorCritic, ModelSpec, QNetwork
from xingtian_tpu.models.torso import CNNTorso, MLPTorso, get_default_filters
from xingtian_tpu.models import muzero  # noqa: F401  (registers MuzeroMlp/Cnn)
from xingtian_tpu.models import qmix  # noqa: F401
from xingtian_tpu.models import recsys  # noqa: F401  (registers DqnRecModel)

__all__ = [
    "ActorCritic", "CNNTorso", "Categorical", "DiagGaussian", "MLPTorso",
    "ModelSpec", "QNetwork", "get_default_filters", "make_dist",
]
