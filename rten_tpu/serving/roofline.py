"""Decode-throughput roofline accounting shared by bench.py and
tools/bench_models.py (one copy of the physics, per the round-3 review).

A decode step must stream every weight byte it actually reads once plus
the LIVE KV rows (the decode-attention kernel's valid-prefix clamp means
dead capacity is neither read nor scored); tokens/step = slots. The bound
is the HBM bandwidth divided by those bytes — the physics target measured
rates are reported against (round-1 verdict: report roofline fractions,
not just a self-referential CPU baseline).

Round-4 tightening: only constants CONSUMED by the graph count (rewrite
passes used to leave ~600MB of orphaned f32 originals that inflated the
byte count and flattered the fraction), and embedding tables that are
only ever GATHERED charge the rows read per step (slots rows), not the
whole table — a 154MB wte is not streamed to decode 96 tokens.
"""

from __future__ import annotations

import numpy as np

HBM_GBPS = 819.0  # TPU v5e HBM bandwidth (public spec)


def step_weight_bytes(g, slots: int) -> int:
    """Weight bytes a single forward step streams from HBM.

    Counts weight constants reachable from the graph outputs; a constant
    consumed ONLY as the data operand of Gather ops (embedding tables) is
    charged ``slots`` rows instead of its full size.
    """
    from ..ir.graph import Constant, is_weight_constant

    consumers: dict = {}
    for _, op in g.operators():
        for pos, i in enumerate(op.inputs):
            if i is not None:
                consumers.setdefault(i, []).append((op.op_type, pos))
    total = 0
    for nid, node in g.nodes.items():
        if not (isinstance(node, Constant) and is_weight_constant(node)):
            continue
        cons = consumers.get(nid)
        if not cons:
            continue  # dead constant: never streamed
        if all(ot == "Gather" and pos == 0 for ot, pos in cons):
            row = int(np.prod(node.array.shape[1:])) * node.array.itemsize
            total += min(node.array.nbytes, slots * row * len(cons))
        else:
            total += node.array.nbytes
    return total


def decode_roofline_tps(
    engine, prompt_len: int, new_tokens: int, hbm_gbps: float = HBM_GBPS
) -> float:
    """Weight+live-KV bandwidth-bound decode tokens/s for ``engine``.

    ``prompt_len``/``new_tokens`` describe the timed wave: the charged KV
    stream is the wave's mean live length (prompt + half the generated
    span), the tight bound once the valid-prefix clamp landed — charging
    full capacity would overstate the bytes and let fractions exceed 1.
    """
    weight_bytes = step_weight_bytes(engine.g, engine.slots)
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
