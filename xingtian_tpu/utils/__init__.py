"""Utility package."""

from xingtian_tpu.utils.platform import default_backend, is_axon_backend, safe_donate_argnums

__all__ = ["default_backend", "is_axon_backend", "safe_donate_argnums"]
