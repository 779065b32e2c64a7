"""Decode-throughput roofline accounting shared by bench.py and
tools/bench_models.py (one copy of the physics, per the round-3 review).

A decode step must stream every weight byte once plus the LIVE KV rows
(the decode-attention kernel's valid-prefix clamp means dead capacity is
neither read nor scored); tokens/step = slots. The bound is the HBM
bandwidth divided by those bytes — the physics target measured rates are
reported against (round-1 verdict: report roofline fractions, not just a
self-referential CPU baseline).
"""

from __future__ import annotations

import numpy as np

HBM_GBPS = 819.0  # TPU v5e HBM bandwidth (public spec)


def decode_roofline_tps(
    engine, prompt_len: int, new_tokens: int, hbm_gbps: float = HBM_GBPS
) -> float:
    """Weight+live-KV bandwidth-bound decode tokens/s for ``engine``.

    ``prompt_len``/``new_tokens`` describe the timed wave: the charged KV
    stream is the wave's mean live length (prompt + half the generated
    span), the tight bound once the valid-prefix clamp landed — charging
    full capacity would overstate the bytes and let fractions exceed 1.
    """
    from ..ir.graph import Constant, is_weight_constant

    weight_bytes = sum(
        n.array.nbytes
        for n in engine.g.nodes.values()
        if isinstance(n, Constant) and is_weight_constant(n)
    )
    live = min(engine.capacity, prompt_len + new_tokens // 2)
    kv_bytes = sum(
        int(np.prod(c.shape)) * c.dtype.itemsize * live // c.shape[-2]
        if c.shape[-2] == engine.capacity
        else int(np.prod(c.shape)) * c.dtype.itemsize
        for c in engine.caches
    )
    step_bytes = weight_bytes + kv_bytes  # KV read; writes are ~1 row/slot
    step_s = step_bytes / (hbm_gbps * 1e9)
    return engine.slots / step_s
