"""xingtian_tpu — a TPU-native actor–learner reinforcement-learning framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
huawei-noah/xingtian (reference layout: ``xt/`` + ``zeus/``).  Where the
reference composes ~100 Python processes glued by ZMQ + Arrow Plasma
(reference ``xt/framework/broker.py``), this framework compiles the whole
actor–learner loop into a single XLA program per host: environments are
vectorized pytrees stepped under ``jax.lax.scan``, trajectories never leave
device HBM, and scale-out is expressed as shardings over a
``jax.sharding.Mesh`` instead of message routing.

Public composition mirrors the reference's four "Lego blocks"
(reference ``docs/basic_arch.en.md``): Algorithm / Model / Agent /
Environment, resolved by name through :mod:`xingtian_tpu.registry` and a
YAML config front-end compatible with the reference's ``examples/*.yaml``
schema (reference ``zeus/common/util/get_xt_config.py``).
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("XT_PLATFORM"):
    # Force a JAX backend BEFORE any array is materialized (registering
    # the built-in envs below creates jnp constants, which initializes
    # the default backend).  Needed because accelerator plugins like axon
    # override the standard JAX_PLATFORMS env var, and because a busy
    # single-client accelerator would block import entirely.
    import jax as _jax
    _jax.config.update("jax_platforms", _os.environ["XT_PLATFORM"])

if _os.environ.get("XT_COORDINATOR"):
    # multi-host contract: jax.distributed.initialize must run before ANY
    # backend-initializing call, and registering the built-in envs below
    # materializes jnp constants — so the coordination service connects
    # here, driven by the same XT_* env vars
    # ``parallel.distributed.init_distributed`` reads (which stays the
    # idempotent public entry; importing it here would itself materialize
    # arrays through the subpackage imports)
    import jax as _jax

    if not _jax.distributed.is_initialized():
        _np = _os.environ.get("XT_NUM_PROCESSES")
        _pid = _os.environ.get("XT_PROCESS_ID")
        _jax.distributed.initialize(
            coordinator_address=_os.environ["XT_COORDINATOR"],
            num_processes=int(_np) if _np is not None else None,
            process_id=int(_pid) if _pid is not None else None,
        )

from xingtian_tpu import registry
from xingtian_tpu.registry import Registers

__all__ = ["Registers", "registry", "train", "evaluate", "benchmarking",
           "__version__"]


def train(config_file: str, task: str = "train", **kwargs) -> int:
    """Programmatic train entry (parity: ``xt.train`` re-export,
    reference ``xt/__init__.py:5-11``)."""
    from xingtian_tpu.main import main as _main
    args = ["-f", config_file, "-t", task]
    for k, v in kwargs.items():
        args += [f"--{k}", str(v)]
    return _main(args)


def evaluate(config_file: str, **kwargs) -> int:
    return train(config_file, task="evaluate", **kwargs)


def benchmarking(config_file: str, **kwargs) -> int:
    return train(config_file, task="benchmark", **kwargs)


def _register_builtin_modules() -> None:
    """Import all built-in module packages so their @register decorators run.

    Mirrors the reference's glob-import auto-registration
    (reference ``zeus/common/util/register.py:126-200``) but with explicit
    imports: import errors surface immediately instead of being recorded
    into a diagnostics dict.
    """
    from xingtian_tpu import envs  # noqa: F401
    from xingtian_tpu import models  # noqa: F401
    from xingtian_tpu import algos  # noqa: F401
    from xingtian_tpu import agents  # noqa: F401


_register_builtin_modules()
