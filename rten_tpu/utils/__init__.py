"""Shared utilities."""

from .compile_cache import enable_compilation_cache  # noqa: F401
from .platform import honor_jax_platforms_env  # noqa: F401
