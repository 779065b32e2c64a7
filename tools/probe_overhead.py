"""Per-execute overhead probes for the remote runtime.

Decomposes the serving wall-time gap (measured tok/s vs roofline) into
dispatch costs: how much does one execute cost as a function of donated
buffer count and compute size? Guides whether to stack the engine's 24
per-layer KV buffers into 2.

Usage: python tools/probe_overhead.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def probe(n_buffers: int, mb_each: float, iters: int = 30) -> float:
    """Mean wall ms per execute of a trivial donated-buffer update."""
    n_elem = int(mb_each * 1e6 / 4)
    bufs = [jnp.zeros(n_elem, jnp.float32) for _ in range(n_buffers)]

    def fn(bufs):
        return [b + 1.0 for b in bufs]

    fn = jax.jit(fn, donate_argnums=0)
    bufs = fn(bufs)
    jax.block_until_ready(bufs)
    t0 = time.perf_counter()
    for _ in range(iters):
        bufs = fn(bufs)
    jax.block_until_ready(bufs)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    print("devices:", jax.devices(), flush=True)
    for n, mb in [(2, 12.6), (24, 12.6), (2, 151.2), (24, 0.1), (2, 0.1)]:
        ms = probe(n, mb)
        print(f"buffers={n:>3} x {mb:6.1f}MB -> {ms:7.3f} ms/execute", flush=True)


if __name__ == "__main__":
    main()
