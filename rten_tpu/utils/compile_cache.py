"""Persistent compilation cache (serving cold-start control).

Remote-dispatch TPU runtimes pay 30s-20min per fresh executable compile
(BASELINE.md environment notes); a serving restart recompiles prefill,
decode and fused-dispatch executables from scratch. Enabling the
persistent cache makes restarts reuse the on-disk compiled artifacts —
the `CachedPlan`-across-processes analog the reference cannot have (its
plans are in-memory per Model, src/graph/planner.rs:39-83).

Also honored via the environment: RTEN_COMPILE_CACHE=<dir> enables it at
import time from `rten_tpu.utils.honor_jax_platforms_env` callers (the
CLI, bench.py, examples).
"""

from __future__ import annotations

import os
from typing import Optional


def enable_compilation_cache(
    cache_dir: str,
    *,
    min_compile_time_secs: float = 1.0,
) -> str:
    """Cache compiled executables under ``cache_dir`` (created if needed).

    Entries are keyed by HLO + compile options + backend version, so a
    code/toolchain change never serves a stale binary. Only compiles
    slower than ``min_compile_time_secs`` are persisted (tiny executables
    cost more to read than to recompile)."""
    import jax

    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs",
        float(min_compile_time_secs),
    )
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir


def maybe_enable_from_env(env: str = "RTEN_COMPILE_CACHE") -> Optional[str]:
    d = os.environ.get(env)
    if d:
        return enable_compilation_cache(d)
    return None
