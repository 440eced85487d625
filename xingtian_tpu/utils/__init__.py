"""Utility package."""

from xingtian_tpu.utils.platform import default_backend, safe_donate_argnums

__all__ = ["default_backend", "safe_donate_argnums"]
