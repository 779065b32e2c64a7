"""Shared utilities."""

from .platform import honor_jax_platforms_env  # noqa: F401
