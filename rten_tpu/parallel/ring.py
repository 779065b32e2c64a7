"""Ring attention: context-parallel attention over a sequence-sharded mesh
axis (Liu et al. 2023's blockwise ring, the scaling-book long-context
recipe).

SP prefill (SP_PREFILL_INPUT_RULES) shards activations by token but
all-gathers K/V at attention — fine until the K/V for one sequence stops
fitting a chip. Ring attention keeps K/V SHARDED: each device holds one
sequence chunk of Q, K and V, and the K/V chunks rotate around the ring
(`lax.ppermute` over ICI) while each device accumulates its Q block's
online softmax against every chunk. Peak memory per device is O(T/S) for
activations AND K/V; comms overlap compute chunk by chunk.

No reference analog (rten is single-host, materialized-score attention).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..kernels.flash_attention import NEG_INF

try:
    from jax import shard_map as _shard_map

    def shard_map(f=None, **kw):  # new API: check_rep renamed check_vma
        kw["check_vma"] = kw.pop("check_rep", kw.pop("check_vma", True))
        return _shard_map(f, **kw) if f is not None else _shard_map(**kw)
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map


def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mesh: Mesh,
    axis: str = "model",
    *,
    causal: bool = True,
    scale: Optional[float] = None,
):
    """Attention over [B, H, T, D] inputs with T sharded over ``axis``.

    Accepts global (replicated or host) arrays and returns the global
    output; T must divide the axis size. GQA accepted (K/V heads divide
    Q heads — chunks broadcast per group).
    """
    B, Hq, T, D = q.shape
    Hkv = k.shape[1]
    S = mesh.shape[axis]
    if T % S:
        raise ValueError(f"sequence {T} not divisible by {S} ring devices")
    if scale is None:
        scale = 1.0 / float(np.sqrt(D))
    group = Hq // Hkv

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None, None, axis, None),) * 3,
        out_specs=P(None, None, axis, None),
        check_rep=False,
    )
    def run(q_l, k_l, v_l):
        idx = jax.lax.axis_index(axis)
        Tl = q_l.shape[2]
        kf = jnp.repeat(k_l.astype(jnp.float32), group, axis=1)
        vf = jnp.repeat(v_l.astype(jnp.float32), group, axis=1)
        qf = q_l.astype(jnp.float32)
        q_pos = idx * Tl + jnp.arange(Tl)

        m = jnp.full((B, Hq, Tl, 1), NEG_INF, jnp.float32)
        l = jnp.zeros((B, Hq, Tl, 1), jnp.float32)
        acc = jnp.zeros((B, Hq, Tl, D), jnp.float32)

        # UNROLLED over ring steps (S = mesh axis size, small): a
        # lax.scan formulation with the ppermute in the carry produced
        # wrong chunk pairings under shard_map (every element mismatched
        # on >= 2 devices; the identical unrolled body is exact), so the
        # rotation stays a Python loop.
        k_c, v_c = kf, vf
        for s in range(S):
            # After s rotations this device holds global chunk (idx - s).
            j = (idx - s) % S
            scores = jnp.einsum("bhqd,bhkd->bhqk", qf, k_c) * scale
            if causal:
                k_pos = j * Tl + jnp.arange(Tl)
                scores = jnp.where(
                    k_pos[None, None, None, :]
                    <= q_pos[None, None, :, None],
                    scores, NEG_INF,
                )
            m_new = jnp.maximum(m, scores.max(axis=-1, keepdims=True))
            p = jnp.exp(scores - m_new)
            p = jnp.where(m_new <= NEG_INF / 2, 0.0, p)
            alpha = jnp.where(m <= NEG_INF / 2, 0.0, jnp.exp(m - m_new))
            l = l * alpha + p.sum(axis=-1, keepdims=True)
            acc = acc * alpha + jnp.einsum("bhqk,bhkd->bhqd", p, v_c)
            m = m_new
            if s + 1 < S:
                # Rotate the K/V chunks one hop around the ring
                # (overlappable with the next step's compute by XLA's
                # async collectives).
                perm = [(i, (i + 1) % S) for i in range(S)]
                k_c = jax.lax.ppermute(k_c, axis, perm)
                v_c = jax.lax.ppermute(v_c, axis, perm)
        l = jnp.where(l == 0.0, 1.0, l)
        return (acc / l).astype(q_l.dtype)

    seq_sh = NamedSharding(mesh, P(None, None, axis, None))
    return run(
        jax.device_put(q, seq_sh),
        jax.device_put(k, seq_sh),
        jax.device_put(v, seq_sh),
    )
