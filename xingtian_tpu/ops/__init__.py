"""Device-side compute ops: GAE, V-trace, replay buffers, Pallas kernels."""

from xingtian_tpu.ops.gae import discounted_returns, gae, gae_associative
from xingtian_tpu.ops.vtrace import (
    VTraceReturns,
    vtrace_from_log_rhos,
    vtrace_from_logits,
)

__all__ = [
    "VTraceReturns", "discounted_returns", "gae", "gae_associative",
    "vtrace_from_log_rhos", "vtrace_from_logits",
]
