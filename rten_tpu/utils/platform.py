"""Platform selection helpers.

This environment's sitecustomize force-registers a remote-TPU plugin at
interpreter startup, which overrides the JAX_PLATFORMS environment
variable. Tools and tests that want the CPU backend must re-assert it via
jax.config *after* import but *before* backend initialization.
"""

from __future__ import annotations

import os


def honor_jax_platforms_env(n_cpu_devices: int | None = None) -> None:
    """Re-apply JAX_PLATFORMS=cpu intent (no-op otherwise), and enable the
    persistent compilation cache when RTEN_COMPILE_CACHE is set."""
    from .compile_cache import maybe_enable_from_env

    maybe_enable_from_env()
    if not os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        return
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
        if n_cpu_devices:
            jax.config.update("jax_num_cpu_devices", n_cpu_devices)
    except Exception:
        pass
