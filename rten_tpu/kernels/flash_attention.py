"""Flash attention: blockwise online-softmax attention on TPU.

The reference's Attention op materializes the full QK^T score matrix
(rten src/ops/attention.rs:640-920, explicitly "not flash-attention").
On TPU that wastes HBM bandwidth and VMEM; this kernel computes
softmax(scale*QK^T + mask)*V blockwise with the online-softmax recurrence
(running max m, running sum l, rescaled accumulator), so scores never leave
VMEM. Supports:

* GQA: q head h reads kv head h // (Hq // Hkv) via the index map
* causal masking anchored at the *end* of the KV sequence (rten
  attention.rs:873-881): q position i attends kv j iff j <= i + (Tk - Tq)
* soft capping: softcap * tanh(x / softcap) (rten attention.rs:564)
* optional additive float mask [Tq, Tk] (broadcast over batch/heads)

The XLA reference path lives in ``mha_xla`` (CPU fallback + golden).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import on_tpu, pad_dim, round_up

NEG_INF = -1e30

# int4 KV cache: nibbles are stored BIASED (value + 8, range 0..15) so the
# packed byte needs no sign handling, and the two nibbles of byte lane d
# hold head dims d and d + D/2 (SPLIT-HALF, not interleaved): unpacking is
# then a lane-axis CONCATENATE of the two nibble planes, which Mosaic
# lowers as a VPU copy — a lane-interleave or lane-dim reshape would not.
INT4_BIAS = 8


def pack_int4(x):
    """Quantize f32/bf16 rows to a nibble-packed int4 cache row.

    x [..., D] -> (packed u8 [..., D/2], scales f32 [..., 1]) with
    per-row absmax/7 scales — the int4 analog of the int8 KV path's
    absmax/127 (ops/attention.py quantize()); 2x the context capacity
    per HBM byte of int8, 8x of f32."""
    D = x.shape[-1]
    assert D % 2 == 0, f"int4 packing needs an even head dim, got {D}"
    x = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    s = jnp.maximum(absmax / 7.0, 1e-8)
    q = jnp.clip(jnp.round(x / s), -8, 7).astype(jnp.int32) + INT4_BIAS
    lo = q[..., : D // 2]
    hi = q[..., D // 2:]
    return (lo | (hi << 4)).astype(jnp.uint8), s.astype(jnp.float32)


def unpack_int4(packed, dtype=jnp.float32):
    """[..., D/2] u8 -> [..., D] dtype (split-half lane concat; the same
    expression is used INSIDE the Pallas kernels, where the u8 block is
    widened to i32 first — Mosaic has no u8 vector shifts)."""
    b = packed.astype(jnp.int32)
    lo = (b & 0xF) - INT4_BIAS
    hi = (b >> 4) - INT4_BIAS
    return jnp.concatenate([lo, hi], axis=-1).astype(dtype)


def _kernel(q_ref, k_ref, v_ref, mask_ref, out_ref, m_ref, l_ref, acc_ref, *,
            scale: float, causal: bool, softcap: float, kv_offset: int,
            q_len: int, kv_len: int, block_q: int, block_k: int,
            has_mask: bool):
    kb = pl.program_id(3)
    qb = pl.program_id(2)

    @pl.when(kb == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q_pos = qb * block_q + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 0
    )
    k_pos = kb * block_k + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 1
    )

    def compute():
        q = q_ref[0, 0]  # [block_q, D]
        k = k_ref[0, 0]  # [block_k, D]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        if softcap:
            s = softcap * jnp.tanh(s / softcap)
        if has_mask:
            s = s + mask_ref[0]
        # Out-of-range padding and causal masking.
        valid = (q_pos < q_len) & (k_pos < kv_len)
        if causal:
            valid &= k_pos <= q_pos + kv_offset
        s = jnp.where(valid, s, NEG_INF)

        m_prev = m_ref[:]  # [block_q, 1]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)  # [block_q, block_k]
        # Rows with no valid key yet keep m=-inf; exp(NEG_INF - NEG_INF)
        # would be exp(0)=1. Guard by zeroing those probabilities.
        p = jnp.where(jnp.broadcast_to(m_new, s.shape) <= NEG_INF / 2, 0.0, p)
        alpha = jnp.where(m_prev <= NEG_INF / 2, 0.0, jnp.exp(m_prev - m_new))
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0, 0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_ref[:] = m_new

    if causal:
        # Skip key blocks entirely above the causal diagonal.
        first_q = qb * block_q
        first_k = kb * block_k
        @pl.when(first_k <= first_q + (block_q - 1) + kv_offset)
        def _():
            compute()
    else:
        compute()

    @pl.when(kb == pl.num_programs(3) - 1)
    def _():
        l = l_ref[:]
        l = jnp.where(l == 0.0, 1.0, l)  # fully-masked rows -> zeros
        out_ref[0, 0] = (acc_ref[:] / l).astype(out_ref.dtype)


def mha_pallas(
    q, k, v,
    mask=None,
    *,
    scale: Optional[float] = None,
    causal: bool = False,
    softcap: float = 0.0,
    block_q: int = 128,
    block_k: int = 128,
    interpret: bool = False,
):
    """q [B,Hq,Tq,D] x k,v [B,Hkv,Tk,D] -> [B,Hq,Tq,D].

    ``mask``: optional additive f32 [Tq, Tk] (mask==-inf excludes).
    """
    B, Hq, Tq, D = q.shape
    _, Hkv, Tk, _ = k.shape
    assert Hq % Hkv == 0, (Hq, Hkv)
    group = Hq // Hkv
    if scale is None:
        scale = 1.0 / float(np.sqrt(D))

    bq = min(block_q, round_up(Tq, 8))
    bk = min(block_k, round_up(Tk, 128))
    Tqp, Tkp = round_up(Tq, bq), round_up(Tk, bk)
    Dp = round_up(D, 128)
    qp = pad_dim(pad_dim(q, 2, Tqp), 3, Dp)
    kp = pad_dim(pad_dim(k, 2, Tkp), 3, Dp)
    vp = pad_dim(pad_dim(v, 2, Tkp), 3, Dp)
    has_mask = mask is not None
    if has_mask:
        # Broadcast first: a (1, Tk) mask must apply to EVERY query row —
        # zero-padding the row dim would silently unmask rows >= 1.
        mask = jnp.broadcast_to(mask.astype(jnp.float32), (Tq, Tk))
        maskp = pad_dim(pad_dim(mask, 0, Tqp), 1, Tkp)[None]
        mask_spec = pl.BlockSpec(
            (1, bq, bk), lambda b, h, i, j: (0, i, j), memory_space=pltpu.VMEM
        )
    else:
        maskp = jnp.zeros((1, bq, bk), jnp.float32)
        mask_spec = pl.BlockSpec(
            (1, bq, bk), lambda b, h, i, j: (0, 0, 0), memory_space=pltpu.VMEM
        )

    grid = (B, Hq, Tqp // bq, Tkp // bk)
    kernel = functools.partial(
        _kernel,
        scale=float(scale),
        causal=causal,
        softcap=float(softcap or 0.0),
        kv_offset=Tk - Tq,
        q_len=Tq,
        kv_len=Tk,
        block_q=bq,
        block_k=bk,
        has_mask=has_mask,
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 1, bq, Dp), lambda b, h, i, j: (b, h, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, bk, Dp), lambda b, h, i, j: (b, h // group, j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, bk, Dp), lambda b, h, i, j: (b, h // group, j, 0),
                memory_space=pltpu.VMEM,
            ),
            mask_spec,
        ],
        out_specs=pl.BlockSpec(
            (1, 1, bq, Dp), lambda b, h, i, j: (b, h, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hq, Tqp, Dp), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, Dp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Hq * Tqp * Tkp * Dp,
            bytes_accessed=2 * B * Hq * Tqp * Dp * 4 + 2 * B * Hkv * Tkp * Dp * 4,
            transcendentals=B * Hq * Tqp * Tkp,
        ),
        interpret=interpret,
    )(qp, kp, vp, maskp)
    return out[:, :, :Tq, :D]


def _decode_kernel(lens_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref, out_ref,
                   m_ref, l_ref, acc_ref, *, scale: float, S: int, cap: int,
                   block_k: int, quant: bool, bits: int = 8,
                   window: int = 0):
    b = pl.program_id(0)
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0, 0]            # [bq, D]
    k = k_ref[0, 0]            # [bk, D] (s8 when quant; u8 [bk, D/2] int4)
    v_blk = v_ref[0, 0]
    if bits == 4:
        k = unpack_int4(k)
        v_blk = unpack_int4(v_blk)
        pad = q.shape[-1] - k.shape[-1]
        if pad:  # q is lane-padded past D; match with zero lanes (zeros
            k = jnp.pad(k, ((0, 0), (0, pad)))      # drop out of the dot,
            v_blk = jnp.pad(v_blk, ((0, 0), (0, pad)))  # out is sliced)
    bq = q.shape[0]
    s = _dot_f32(
        q, k, (((1,), (1,)), ((), ()))
    ) * scale                  # [bq, bk]
    if quant:
        # Per-position K scales ride the LANE axis of the scores — the
        # dequant never needs a sublane-layout scale vector.
        s = s * ks_ref[0, 0]   # [1, bk]

    row = jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 0)
    col = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 1)
    # Per-slot causal+tail mask: query row r sits at global position
    # lens[b]+r and may attend j <= that position (the serving engine's
    # static-cache rule; new KV is already written at lens..lens+S-1).
    valid = (col <= lens_ref[b] + row) & (col < cap) & (row < S)
    if window:
        # Sliding-window (Mistral-style; ORT GQA local_window_size, ref
        # contrib.rs:770): query at position p attends the last `window`
        # keys [p-window+1, p].
        valid &= col > lens_ref[b] + row - window
    s = jnp.where(valid, s, NEG_INF)

    m_prev = m_ref[:]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    p = jnp.exp(s - m_new)
    p = jnp.where(jnp.broadcast_to(m_new, s.shape) <= NEG_INF / 2, 0.0, p)
    alpha = jnp.where(m_prev <= NEG_INF / 2, 0.0, jnp.exp(m_prev - m_new))
    l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
    if quant:
        p = p * vs_ref[0, 0]   # [1, bk] V scales on p's lanes
    acc_ref[:] = acc_ref[:] * alpha + _dot_f32(
        p, v_blk, (((1,), (0,)), ((), ()))
    )
    m_ref[:] = m_new

    @pl.when(kb == pl.num_programs(2) - 1)
    def _():
        l = l_ref[:]
        l = jnp.where(l == 0.0, 1.0, l)
        out_ref[0, 0] = (acc_ref[:] / l).astype(out_ref.dtype)


def _dot_f32(a, b, dims):
    """dot_general accumulating in f32, feeding the MXU in the NARROWER
    operand dtype: for a bf16 K/V block, cast the tiny q/p operand down
    instead of converting the streamed block up (the s8->f32 / bf16->f32
    VPU converts of whole KV blocks cost more than the bandwidth they
    save -- round-3 trace: int8-KV attention 155us/layer vs f32 138).

    s8 blocks also go through bf16 (not f32): every s8 value is exact in
    bf16's 8-bit mantissa and Mosaic's f32 dot truncates operands to bf16
    passes anyway, so the results are BIT-IDENTICAL (verified on-chip at
    the headline shape) while the s8->bf16 convert is half the VPU writes
    of s8->f32 — 60.0 -> 49.3 us/call on the cat append kernel. Tiny
    operands (a dim of 1) keep the f32 path: Mosaic's verifier rejects
    the mixed-type broadcast it lowers them to."""
    if b.dtype == jnp.bfloat16:
        a = a.astype(jnp.bfloat16)
    elif b.dtype == jnp.int8 and min(b.shape) > 1 and min(a.shape) > 1:
        a = a.astype(jnp.bfloat16)
        b = b.astype(jnp.bfloat16)
    else:
        b = b.astype(a.dtype)
    return jax.lax.dot_general(
        a, b, dims, preferred_element_type=jnp.float32
    )


def _decode_kernel_folded(lens_ref, t_ref, q_ref, k_ref, v_ref, ks_ref,
                          vs_ref, rk_ref, rv_ref, kn_ref, vn_ref, out_ref,
                          m_ref, l_ref, acc_ref, sems, *, scale: float,
                          S: int, cap: int, block_k: int, quant: bool,
                          group: int, recent: int, append: bool,
                          nt: bool = False, bits: int = 8, window: int = 0):
    assert recent == 0 and not append and not nt and bits == 8, (
        "deferred-KV and int4 require the loop/NT-mode kernels"
    )
    """All heads of one slot per grid step (grid = B x key-blocks).

    The per-head variant runs a B*H*blocks grid of tiny steps; at decode
    shapes the fixed per-grid-step cost dominated the whole serving step
    (~60-70%% of device time at slots=16). Folding the head loop into the
    kernel amortizes that cost H-fold: scores for every head come from ONE
    batched dot_general per step."""
    b = pl.program_id(0)
    kb = pl.program_id(1)

    @pl.when(kb == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]               # [H, bq, D]
    k = k_ref[0]               # [Hkv, bk, D]
    H, bq, D = q.shape
    Hkv = k.shape[0]
    if group > 1:
        # GQA: queries grouped per KV head (heads are kv-major).
        q = q.reshape(Hkv, group * bq, D)
    s = jax.lax.dot_general(
        q, k.astype(q.dtype),
        (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale                  # [Hkv, group*bq, bk]
    if quant:
        s = s * ks_ref[0]      # [Hkv, 1, bk] K scales on the lanes
    gq = s.shape[1]
    row = jax.lax.broadcasted_iota(jnp.int32, (Hkv, gq, block_k), 1) % bq
    col = kb * block_k + jax.lax.broadcasted_iota(
        jnp.int32, (Hkv, gq, block_k), 2
    )
    valid = (col <= lens_ref[b] + row) & (col < cap) & (row < S)
    if window:
        valid &= col > lens_ref[b] + row - window
    s = jnp.where(valid, s, NEG_INF)

    m_prev = m_ref[:].reshape(Hkv, gq, 1)
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=2, keepdims=True))
    p = jnp.exp(s - m_new)
    p = jnp.where(jnp.broadcast_to(m_new, s.shape) <= NEG_INF / 2, 0.0, p)
    alpha = jnp.where(m_prev <= NEG_INF / 2, 0.0, jnp.exp(m_prev - m_new))
    l_new = l_ref[:].reshape(Hkv, gq, 1) * alpha + jnp.sum(
        p, axis=2, keepdims=True
    )
    l_ref[:] = l_new.reshape(Hkv * gq, 1)
    if quant:
        p = p * vs_ref[0]      # [Hkv, 1, bk] V scales on p's lanes
    pv = jax.lax.dot_general(
        p, v_ref[0].astype(jnp.float32),
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                          # [Hkv, gq, D]
    acc_ref[:] = (
        acc_ref[:].reshape(Hkv, gq, D) * alpha + pv
    ).reshape(Hkv * gq, D)
    m_ref[:] = m_new.reshape(Hkv * gq, 1)

    @pl.when(kb == pl.num_programs(1) - 1)
    def _():
        l = l_ref[:]
        l = jnp.where(l == 0.0, 1.0, l)
        out = (acc_ref[:] / l).reshape(Hkv, gq // bq, bq, D)
        out_ref[0] = out.reshape(H, bq, D).astype(out_ref.dtype)



def _decode_kernel_folded_nt(lens_ref, t_ref, q_ref, k_ref, v_ref, ks_ref,
                             vs_ref, rk_ref, rv_ref, kn_ref, vn_ref,
                             out_ref, rk_hbm, rv_hbm, m_ref, l_ref,
                             acc_ref, sems, *, scale: float, S: int,
                             cap: int, block_k: int, quant: bool,
                             group: int, recent: int, append: bool,
                             bits: int = 8, window: int = 0):
    """One-dot-per-(slot, key-block) decode attention (f32/bf16/int8 KV).

    The per-head loop kernel issues 2*H tiny MXU dots + H softmax passes
    per grid step and is ISSUE-bound (r3 microbench: 106.8us/call chained
    at B=32,H=12,cap=256 vs a 17.7us folded formulation and a 20us DMA
    floor). Here ALL heads fold into two dots from the NATURAL
    [B,H,cap,D] layout:

      s = q_heads [Hp,D] @ K_merged[Hkv*bk, D]^T   -> [Hp, Hkv*bk]

    is lane-major in (kv-head, position); masking lanes outside each
    head's GQA group to NEG_INF makes exp() zero them, so ``p`` doubles
    as the block-structured operand of the value dot

      out = p [Hp, Hkv*bk] @ V_merged [Hkv*bk, D]  -> [Hp, D].

    The extra cross-group MACs are free (MXU was idle); the softmax runs
    once over [Hp, Hkv*bk] instead of per head. Deferred-KV window and
    in-kernel DMA append (see the loop kernel) use the same NT trick.

    int8 KV: the per-position scales live lane-major per kv-head
    ([Hkv, bk] with positions on LANES), and the merged score layout
    needs them as one [1, Hkv*bk] lane row. A sublane->lane reshape is
    not Mosaic-legal, but CONCATENATING the Hkv per-head lane slices
    along the lane axis is - a trivial VPU copy. K/V int8 values are
    exact in bf16 (8 mantissa bits cover [-127,127]), so the blocks feed
    the MXU as bf16 and the scores/probabilities are rescaled on lanes.
    """
    b = pl.program_id(0)
    kb = pl.program_id(1)
    Hkv = k_ref.shape[1]
    # int4 (bits==4): the cache block is nibble-packed, D/2 byte lanes;
    # unpacking restores the q lane width. Everything q/window/out-sided
    # uses Dp (the UNPACKED width); only the raw cache block is narrower.
    Dp = q_ref.shape[3]
    Dkv = k_ref.shape[3]
    H = q_ref.shape[1]
    Hp = m_ref.shape[0]

    @pl.when(kb == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    if append:
        tt = t_ref[0]
        cp_k = pltpu.make_async_copy(
            kn_ref.at[0], rk_hbm.at[b, :, pl.ds(tt, 1), :], sems.at[0]
        )
        cp_v = pltpu.make_async_copy(
            vn_ref.at[0], rv_hbm.at[b, :, pl.ds(tt, 1), :], sems.at[1]
        )

        @pl.when(kb == 0)
        def _():
            cp_k.start()
            cp_v.start()

    q_sm = q_ref[0, :, 0, :]                       # [H, Dp] (S == 1)
    if Hp > H:
        q_t = jnp.concatenate(
            [q_sm, jnp.zeros((Hp - H, Dp), q_sm.dtype)], axis=0
        )
    else:
        q_t = q_sm

    def nt_scores(kmat, width):
        return _dot_f32(
            q_t, kmat, (((1,), (1,)), ((), ()))
        ) * scale                                  # [Hp, width]

    def merge(s, vmat, vs_row=None):
        """Online-softmax merge of one lane-major score block; the masked
        zeros in p implement the GQA block structure for the value dot.
        ``vs_row`` ([1, width]) rescales quantized V on p's lanes AFTER
        the denominator accumulates (scales weight values, not probs)."""
        m_prev = m_ref[:]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        p = jnp.where(
            jnp.broadcast_to(m_new, s.shape) <= NEG_INF / 2, 0.0, p
        )
        alpha = jnp.where(
            m_prev <= NEG_INF / 2, 0.0, jnp.exp(m_prev - m_new)
        )
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
        if vs_row is not None:
            p = p * vs_row
        acc_ref[:] = acc_ref[:] * alpha + _dot_f32(
            p, vmat, (((1,), (0,)), ((), ()))
        )
        m_ref[:] = m_new

    def lane_merge(sc_ref, width):
        """[Hkv, width] per-head lane rows -> one [1, Hkv*width] lane row
        (kv-head-major, matching the K/V sublane merge order)."""
        return jnp.concatenate(
            [sc_ref[0, kvh, 0, :].reshape(1, width) for kvh in range(Hkv)],
            axis=1,
        )

    if recent:
        jmax = jnp.maximum(lens_ref[b] - 1, 0) // block_k
    else:
        jmax = lens_ref[b] // block_k

    @pl.when(kb <= jmax)
    def _():
        W = Hkv * block_k
        km = k_ref[0].reshape(W, Dkv)
        vm = v_ref[0].reshape(W, Dkv)
        if bits == 4:
            km = unpack_int4(km)
            vm = unpack_int4(vm)
            pad = Dp - km.shape[-1]
            if pad:  # zero lanes match q's lane padding (see _decode_kernel)
                km = jnp.pad(km, ((0, 0), (0, pad)))
                vm = jnp.pad(vm, ((0, 0), (0, pad)))
        s = nt_scores(km, W)
        if quant:
            s = s * lane_merge(ks_ref, block_k)
        sub = jax.lax.broadcasted_iota(jnp.int32, (Hp, W), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (Hp, W), 1)
        col = kb * block_k + lane % block_k
        valid = ((lane // block_k) == (sub // group)) & (sub < H)
        if recent:
            valid &= (col < lens_ref[b]) & (col < cap)
        else:
            valid &= (col <= lens_ref[b]) & (col < cap)
            if window:
                # Sliding window (S==1: the query sits at position lens).
                valid &= col > lens_ref[b] - window
        s = jnp.where(valid, s, NEG_INF)
        merge(s, vm, lane_merge(vs_ref, block_k) if quant else None)

    last = kb == pl.num_programs(1) - 1
    if recent:
        @pl.when(last)
        def _():
            rkp = rk_ref.shape[2]
            Wr = Hkv * rkp
            rkm = rk_ref[0].reshape(Wr, Dp)
            s = nt_scores(rkm, Wr)
            sub = jax.lax.broadcasted_iota(jnp.int32, (Hp, Wr), 0)
            lane = jax.lax.broadcasted_iota(jnp.int32, (Hp, Wr), 1)
            tmax = t_ref[0] - 1 if append else t_ref[0]
            valid = (
                ((lane // rkp) == (sub // group)) & (sub < H)
                & ((lane % rkp) <= tmax) & ((lane % rkp) < recent)
            )
            s = jnp.where(valid, s, NEG_INF)
            merge(s, rv_ref[0].reshape(Wr, Dp))
            if append:
                knm = kn_ref[0].reshape(Hkv, Dp).astype(q_t.dtype)
                sn = jax.lax.dot_general(
                    q_t, knm, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * scale                          # [Hp, Hkv]
                subn = jax.lax.broadcasted_iota(jnp.int32, (Hp, Hkv), 0)
                lanen = jax.lax.broadcasted_iota(jnp.int32, (Hp, Hkv), 1)
                validn = (lanen == (subn // group)) & (subn < H)
                sn = jnp.where(validn, sn, NEG_INF)
                merge(sn, vn_ref[0].reshape(Hkv, Dp).astype(jnp.float32))

    if append:
        @pl.when(last)
        def _():
            cp_k.wait()
            cp_v.wait()

    @pl.when(last)
    def _():
        l = l_ref[:]
        l = jnp.where(l == 0.0, 1.0, l)
        out = (acc_ref[:] / l)[:H]                 # [H, Dp]
        bq = out_ref.shape[2]
        out_ref[0] = jnp.broadcast_to(
            out[:, None, :], (H, bq, Dp)
        ).astype(out_ref.dtype)


def _folded_loop_entry(*refs, append: bool, nt: bool = False, **kw):
    """Ref-count adapter: append mode adds two aliased ANY-space window
    outputs between out_ref and the scratch refs."""
    if append:
        (lens, t, q, k, v, ks, vs, rk, rv, kn, vn,
         out, rk_hbm, rv_hbm, m, l, acc, sems) = refs
    else:
        (lens, t, q, k, v, ks, vs, rk, rv, kn, vn,
         out, m, l, acc, sems) = refs
        rk_hbm = rv_hbm = None
    if nt:
        return _decode_kernel_folded_nt(
            lens, t, q, k, v, ks, vs, rk, rv, kn, vn, out, rk_hbm,
            rv_hbm, m, l, acc, sems, append=append, **kw
        )
    return _decode_kernel_folded_loop(
        lens, t, q, k, v, ks, vs, rk, rv, kn, vn, out, rk_hbm, rv_hbm,
        m, l, acc, sems, append=append, **kw
    )


def _decode_kernel_folded_loop(lens_ref, t_ref, q_ref, k_ref, v_ref, ks_ref,
                               vs_ref, rk_ref, rv_ref, kn_ref, vn_ref,
                               out_ref, rk_hbm, rv_hbm, m_ref, l_ref,
                               acc_ref, sems, *, scale: float, S: int,
                               cap: int, block_k: int, quant: bool,
                               group: int, recent: int, append: bool,
                               bits: int = 8, window: int = 0):
    """Head-folded decode attention with an UNROLLED per-head loop of 2-D
    ops (no batched dot_general — Mosaic compiles 3-D dots pathologically
    slowly). Same grid/semantics as _decode_kernel_folded.

    ``recent`` > 0 enables the deferred-KV window (serving engine): the
    big cache holds only rows < lens[b] (tokens committed before the
    dispatch); rows generated in the current dispatch live in the small
    rk/rv window buffers, valid up to t_ref[0] inclusive. This lets the
    engine append new KV with ONE uniform-index dynamic_update_slice per
    step and commit per-slot rows once per dispatch, instead of a per-slot
    dus chain per step (round-3 trace: 558us/step of dus at slots=32)."""
    assert bits == 8, "int4 KV runs only through the NT-folded kernel"
    b = pl.program_id(0)
    kb = pl.program_id(1)

    @pl.when(kb == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    H = q_ref.shape[1]
    bq = q_ref.shape[2]
    row = jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 0)
    col = kb * block_k + jax.lax.broadcasted_iota(
        jnp.int32, (bq, block_k), 1
    )
    if recent:
        valid = (col < lens_ref[b]) & (col < cap) & (row < S)
    else:
        valid = (col <= lens_ref[b] + row) & (col < cap) & (row < S)
        if window:
            # Sliding window (ORT GQA local_window_size): query at global
            # position lens+row attends keys in (lens+row-window, lens+row].
            valid &= col > lens_ref[b] + row - window
    last = kb == pl.num_programs(1) - 1
    if recent:
        rkp = rk_ref.shape[2]
        row_r = jax.lax.broadcasted_iota(jnp.int32, (bq, rkp), 0)
        col_r = jax.lax.broadcasted_iota(jnp.int32, (bq, rkp), 1)
        # append mode: row t is written by THIS kernel via DMA (the block
        # read may be stale there) — the current row is scored from
        # kn/vn in VMEM instead, so the window is valid strictly < t.
        tmax = t_ref[0] - 1 if append else t_ref[0]
        valid_r = (col_r <= tmax) & (col_r < recent) & (row_r < S)
    if append:
        # Write the new KV row into the aliased HBM window at t with two
        # strided DMAs overlapped with this grid step's compute — replaces
        # the XLA dus append (a strided read-modify-write across every
        # (slot, head) tile: ~7.5us/call x 24 calls/step in the r3 trace).
        tt = t_ref[0]
        cp_k = pltpu.make_async_copy(
            kn_ref.at[0], rk_hbm.at[b, :, pl.ds(tt, 1), :], sems.at[0]
        )
        cp_v = pltpu.make_async_copy(
            vn_ref.at[0], rv_hbm.at[b, :, pl.ds(tt, 1), :], sems.at[1]
        )

        @pl.when(kb == 0)
        def _():
            cp_k.start()
            cp_v.start()

    def online_update(h, s, v_block, vs_row):
        sl = slice(h * bq, (h + 1) * bq)
        m_prev = m_ref[sl]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        p = jnp.where(jnp.broadcast_to(m_new, s.shape) <= NEG_INF / 2, 0.0, p)
        alpha = jnp.where(m_prev <= NEG_INF / 2, 0.0, jnp.exp(m_prev - m_new))
        l_ref[sl] = l_ref[sl] * alpha + jnp.sum(p, axis=1, keepdims=True)
        if vs_row is not None:
            p = p * vs_row
        acc_ref[sl] = acc_ref[sl] * alpha + _dot_f32(
            p, v_block, (((1,), (0,)), ((), ()))
        )
        m_ref[sl] = m_new

    # Valid-prefix clamp: blocks past the last live row are never DMA'd
    # (the index maps clamp to jmax, so Mosaic skips the repeat copies)
    # and never computed. At cap 1024 with ~160 live rows this skips 3 of
    # 4 key blocks per slot — the kernel is issue-bound, so skipping the
    # dead dots matters as much as the dead DMA.
    if recent:
        jmax = jnp.maximum(lens_ref[b] - 1, 0) // block_k
    else:
        jmax = (lens_ref[b] + S - 1) // block_k

    @pl.when(kb <= jmax)
    def _():
        for h in range(H):  # static unroll: one grid step, every head
            kvh = h // group
            q = q_ref[0, h]              # [bq, D]
            k = k_ref[0, kvh]            # [bk, D]
            s = _dot_f32(
                q, k, (((1,), (1,)), ((), ()))
            ) * scale                    # [bq, bk]
            if quant:
                s = s * ks_ref[0, kvh]   # [1, bk]
            s = jnp.where(valid, s, NEG_INF)
            online_update(
                h, s, v_ref[0, kvh], vs_ref[0, kvh] if quant else None
            )

    if recent:
        # The current dispatch's uncommitted rows (window dtype, no scales).
        @pl.when(last)
        def _():
            for h in range(H):
                kvh = h // group
                q = q_ref[0, h]
                s = _dot_f32(
                    q, rk_ref[0, kvh], (((1,), (1,)), ((), ()))
                ) * scale                # [bq, rkp]
                s = jnp.where(valid_r, s, NEG_INF)
                online_update(h, s, rv_ref[0, kvh], None)
            if append:
                # Score the current token's own row from VMEM. The row is
                # a single vector: cast IT up rather than q down (Mosaic
                # mis-lowers the [bq,D]x[1,D] bf16 dot via vector.broadcast
                # with mismatched element types).
                rowv = jax.lax.broadcasted_iota(jnp.int32, (bq, 1), 0) < S
                for h in range(H):
                    kvh = h // group
                    q = q_ref[0, h]
                    s = jax.lax.dot_general(
                        q, kn_ref[0, kvh].astype(q.dtype),
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ) * scale            # [bq, 1]
                    s = jnp.where(rowv, s, NEG_INF)
                    online_update(h, s, vn_ref[0, kvh].astype(jnp.float32),
                                  None)

    if append:
        @pl.when(last)
        def _():
            cp_k.wait()
            cp_v.wait()

    @pl.when(last)
    def _():
        l = l_ref[:]
        l = jnp.where(l == 0.0, 1.0, l)
        out = acc_ref[:] / l            # [H*bq, D]
        out_ref[0] = out.reshape(H, bq, out.shape[-1]).astype(out_ref.dtype)


def _decode_mha_folded(q, k, v, lens, k_scale, v_scale, *, scale, block_k,
                       interpret, recent_k=None, recent_v=None, t=None,
                       k_new=None, v_new=None, window: int = 0):
    B, H, S, D = q.shape
    _, Hkv, cap, _ = k.shape
    group = H // Hkv
    quant = k_scale is not None
    # u8 cache = nibble-packed int4 (pack_int4): the K/V blocks stream at
    # HALF the head-dim lane width and unpack inside the kernel.
    bits = 4 if (quant and k.dtype == jnp.uint8) else 8
    bq = round_up(S, 8)
    bk = min(block_k, round_up(cap, 128))
    capp = round_up(cap, bk)
    Dp = D if D in (64, 128, 256, 512) else round_up(D, 128)
    Dkv = k.shape[3] if bits == 4 else Dp
    qp = pad_dim(pad_dim(q, 2, bq), 3, Dp)
    kp = pad_dim(pad_dim(k, 2, capp), 3, Dkv)
    vp = pad_dim(pad_dim(v, 2, capp), 3, Dkv)
    if quant:
        ksp = pad_dim(k_scale.reshape(B, Hkv, cap), 2, capp)[:, :, None, :]
        vsp = pad_dim(v_scale.reshape(B, Hkv, cap), 2, capp)[:, :, None, :]
    else:
        ksp = jnp.ones((B, Hkv, 1, bk), jnp.float32)
        vsp = jnp.ones((B, Hkv, 1, bk), jnp.float32)
    nkb = capp // bk
    deferred = recent_k is not None

    def _jclamp(j, lens, b):
        # Last block holding a live row; repeats past it skip the DMA.
        if deferred:
            jmax = jnp.maximum(lens[b] - 1, 0) // bk
        else:
            jmax = jnp.minimum((lens[b] + S - 1) // bk, nkb - 1)
        return jnp.minimum(j, jmax)

    kv_index = lambda b, j, lens, *_: (b, 0, _jclamp(j, lens, b), 0)
    sc_index = (
        (lambda b, j, lens, *_: (b, 0, 0, _jclamp(j, lens, b)))
        if quant else (lambda b, j, *_: (b, 0, 0, 0))
    )
    recent = 0 if recent_k is None else recent_k.shape[2]
    append = k_new is not None
    if recent:
        # Keep the window's own dtype (the engine uses bf16 windows: the
        # MXU computes dots at bf16-pass precision anyway, and halving the
        # window bytes matters — the full window is streamed per slot per
        # layer every step).
        rkp = round_up(recent, 8)
        rkb = pad_dim(pad_dim(recent_k, 2, rkp), 3, Dp)
        rvb = pad_dim(pad_dim(recent_v, 2, rkp), 3, Dp)
        tvec = jnp.asarray(t, jnp.int32).reshape(1)
    else:
        rkp = 8
        rkb = jnp.zeros((B, Hkv, rkp, Dp), jnp.float32)
        rvb = jnp.zeros((B, Hkv, rkp, Dp), jnp.float32)
        tvec = jnp.zeros(1, jnp.int32)
    if append:
        # In-kernel DMA append: requires an unpadded window buffer (the
        # aliased output IS the engine's carry — a pad would force a
        # whole-window copy per step).
        assert rkb.shape == recent_k.shape and rvb.shape == recent_v.shape
        knb = pad_dim(k_new, 3, Dp).astype(rkb.dtype)
        vnb = pad_dim(v_new, 3, Dp).astype(rvb.dtype)
    else:
        knb = jnp.zeros((B, Hkv, 1, Dp), rkb.dtype)
        vnb = jnp.zeros((B, Hkv, 1, Dp), rvb.dtype)
    grid = (B, capp // bk)
    # "loop" (default): unrolled 2-D dots per head. "dot": one batched 3-D
    # dot_general — semantically identical but Mosaic compiles it
    # pathologically slowly (>10min for the GPT-2 decode shape).
    # NT folding (one score dot + one value dot per grid step for ALL
    # heads) needs S==1; int8 scales merge onto the lane axis by
    # concatenating per-head lane rows (see _decode_kernel_folded_nt).
    dot_mode = (
        os.environ.get("RTEN_DECODE_FOLD_MODE", "loop") == "dot"
        and not recent and not append and bits == 8
    )
    # The dot-mode kernel has no NT formulation — it must run with NT off
    # (and NT scratch sizing would be wrong for it). int4 is implemented
    # only in the NT body (the unpack is one lane concat there; per-head
    # it would repeat H times per grid step), so bits==4 forces NT on.
    use_nt = bits == 4 or (
        S == 1 and not dot_mode
        and os.environ.get("RTEN_DECODE_NT", "1") != "0"
    )
    if bits == 4:
        assert S == 1, "int4 decode kernel is S==1 only (prefill: per-head)"
    Hp = round_up(H, 8)
    body = _decode_kernel_folded if dot_mode else _folded_loop_entry
    kernel = functools.partial(
        body,
        scale=float(scale), S=S, cap=cap, block_k=bk, quant=quant,
        group=group, recent=recent, append=append, nt=use_nt, bits=bits,
        window=int(window),
    )
    win_spec = pl.BlockSpec((1, Hkv, rkp, Dp), lambda b, j, *_: (b, 0, 0, 0))
    row_spec = pl.BlockSpec((1, Hkv, 1, Dp), lambda b, j, *_: (b, 0, 0, 0))
    out_specs = [
        pl.BlockSpec((1, H, bq, Dp), lambda b, j, *_: (b, 0, 0, 0)),
    ]
    out_shapes = [jax.ShapeDtypeStruct((B, H, bq, Dp), q.dtype)]
    aliases = {}
    if append:
        # Window buffers alias straight through as ANY-space outputs the
        # kernel mutates via DMA (inputs 7/8 of (lens, t, q, k, v, ks,
        # vs, rk, rv, kn, vn) -> outputs 1/2).
        out_specs += [
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ]
        out_shapes += [
            jax.ShapeDtypeStruct(rkb.shape, rkb.dtype),
            jax.ShapeDtypeStruct(rvb.shape, rvb.dtype),
        ]
        aliases = {7: 1, 8: 2}
    res = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, H, bq, Dp), lambda b, j, *_: (b, 0, 0, 0)),
                pl.BlockSpec((1, Hkv, bk, Dkv), kv_index),
                pl.BlockSpec((1, Hkv, bk, Dkv), kv_index),
                pl.BlockSpec((1, Hkv, 1, bk), sc_index),
                pl.BlockSpec((1, Hkv, 1, bk), sc_index),
                win_spec,
                win_spec,
                row_spec,
                row_spec,
            ],
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((Hp if use_nt else H * bq, 1), jnp.float32),
                pltpu.VMEM((Hp if use_nt else H * bq, 1), jnp.float32),
                pltpu.VMEM((Hp if use_nt else H * bq, Dp), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=out_shapes,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * bq * (capp + rkp) * Dp,
            bytes_accessed=(
                B * H * bq * Dp * 8
                + 2 * B * Hkv * capp
                * (Dkv if bits == 4 else Dp * (1 if quant else 4))
                + 2 * B * Hkv * rkp * Dp * rkb.dtype.itemsize
            ),
            transcendentals=B * H * bq * (capp + rkp),
        ),
        interpret=interpret,
    )(jnp.asarray(lens, jnp.int32), tvec, qp, kp, vp, ksp, vsp, rkb, rvb,
      knb, vnb)
    out = res[0]
    if append:
        return out[:, :, :S, :D], res[1], res[2]
    return out[:, :, :S, :D]


def decode_mha(
    q, k, v, lens,
    k_scale=None, v_scale=None,
    *,
    scale: Optional[float] = None,
    block_k: int = 256,
    interpret: bool = False,
    recent_k=None, recent_v=None, t=None,
    k_new=None, v_new=None,
    window: int = 0,
):
    """Per-slot static-cache attention (the serving engine's hot path).

    q [B,H,S,D] f32 x k,v [B,Hkv,cap,D] (f32, or s8 with per-position
    scales k_scale/v_scale [B,Hkv,cap]) -> [B,H,S,D]. ``lens`` [B] int32:
    per-slot PAST lengths; query row r of slot b attends positions
    j <= lens[b]+r.

    Replaces the materialized-mask mha_xla fallback in serving graphs
    (VERDICT round-1 weak #4/#6): masking comes from the prefetched lens
    scalars, and the int8 KV variant dequantizes in VMEM so the cache is
    read from HBM at 1 byte/elem (+ scale vectors) instead of 4.
    """
    B, H, S, D = q.shape
    _, Hkv, cap, _ = k.shape
    assert H % Hkv == 0
    group = H // Hkv
    if scale is None:
        scale = 1.0 / float(np.sqrt(D))
    quant = k_scale is not None
    bits = 4 if (quant and k.dtype == jnp.uint8) else 8
    if window and recent_k is not None:
        raise NotImplementedError(
            "sliding window + deferred-KV recent windows is unsupported "
            "(build the serving graph with deferred_kv=False)"
        )

    # Head-folded variant: at decode shapes (S small) the per-head grid's
    # fixed per-step cost dominated the serving step; fold every head into
    # one grid step per (slot, key-block). Opt out with
    # RTEN_DECODE_FOLD_HEADS=0 (keeps the per-head grid, e.g. for very
    # large H*cap where a folded block would not fit VMEM). int4 caches
    # fold only at S==1 (the NT body owns the unpack); S>1 int4 takes the
    # per-head grid below.
    if bits == 4 and S > 1 and recent_k is not None:
        # The per-head fallback below ignores the window arguments — a
        # silent wrong result. No caller builds this combination (deferred
        # S>1 prefill writes the cache directly); refuse loudly.
        raise NotImplementedError(
            "int4 KV with S>1 and a recent window is unsupported"
        )
    if (bits != 4 or S == 1) and (recent_k is not None or (
        S <= 8
        and os.environ.get("RTEN_DECODE_FOLD_HEADS", "1") != "0"
        and H * round_up(S, 8) * max(D, 64) <= 64 * 1024
    )):
        return _decode_mha_folded(
            q, k, v, lens, k_scale, v_scale,
            scale=scale, block_k=block_k, interpret=interpret, window=window,
            recent_k=recent_k, recent_v=recent_v, t=t,
            k_new=k_new, v_new=v_new,
        )

    bq = round_up(S, 8)
    bk = min(block_k, round_up(cap, 128))
    capp = round_up(cap, bk)
    # Head dim 64 runs as a half-native lane tile instead of padding to
    # 128: padding would WRITE a 2x-sized copy of the whole KV cache every
    # step and read 2x the bytes (the dominant post-fix decode cost).
    Dp = D if D in (64, 128, 256, 512) else round_up(D, 128)
    if os.environ.get("RTEN_DECODE_PAD_HEADDIM", "0") == "1":
        Dp = round_up(D, 128)
    Dkv = k.shape[3] if bits == 4 else Dp
    qp = pad_dim(pad_dim(q, 2, bq), 3, Dp)
    kp = pad_dim(pad_dim(k, 2, capp), 3, Dkv)
    vp = pad_dim(pad_dim(v, 2, capp), 3, Dkv)
    if quant:
        ksp = pad_dim(k_scale.reshape(B, Hkv, cap), 2, capp)[:, :, None, :]
        vsp = pad_dim(v_scale.reshape(B, Hkv, cap), 2, capp)[:, :, None, :]
    else:
        ksp = jnp.ones((B, Hkv, 1, bk), jnp.float32)
        vsp = jnp.ones((B, Hkv, 1, bk), jnp.float32)

    sc_index = (
        (lambda b, h, j, lens: (b, h // group, 0, j))
        if quant
        else (lambda b, h, j, lens: (b, h // group, 0, 0))
    )
    grid = (B, H, capp // bk)
    kernel = functools.partial(
        _decode_kernel,
        scale=float(scale), S=S, cap=cap, block_k=bk, quant=quant,
        bits=bits, window=int(window),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, bq, Dp), lambda b, h, j, lens: (b, h, 0, 0)),
                pl.BlockSpec((1, 1, bk, Dkv), lambda b, h, j, lens: (b, h // group, j, 0)),
                pl.BlockSpec((1, 1, bk, Dkv), lambda b, h, j, lens: (b, h // group, j, 0)),
                pl.BlockSpec((1, 1, 1, bk), sc_index),
                pl.BlockSpec((1, 1, 1, bk), sc_index),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, bq, Dp), lambda b, h, j, lens: (b, h, 0, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((bq, 1), jnp.float32),
                pltpu.VMEM((bq, 1), jnp.float32),
                pltpu.VMEM((bq, Dp), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, bq, Dp), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * bq * capp * Dp,
            bytes_accessed=(
                B * H * bq * Dp * 8
                + 2 * B * Hkv * capp
                * (Dkv if bits == 4 else Dp * (1 if quant else 4))
            ),
            transcendentals=B * H * bq * capp,
        ),
        interpret=interpret,
    )(jnp.asarray(lens, jnp.int32), qp, kp, vp, ksp, vsp)
    return out[:, :, :S, :D]


def decode_mha_xla(q, k, v, lens, k_scale=None, v_scale=None, *, scale=None,
                   recent_k=None, recent_v=None, t=None, window: int = 0):
    """XLA reference for decode_mha (CPU fallback + test golden)."""
    B, H, S, D = q.shape
    cap = k.shape[2]
    if k.dtype == jnp.uint8:  # nibble-packed int4 cache
        kf = unpack_int4(k)
        vf = unpack_int4(v)
    else:
        kf = k.astype(jnp.float32)
        vf = v.astype(jnp.float32)
    if k_scale is not None:
        kf = kf * k_scale.reshape(B, k.shape[1], cap, 1)
        vf = vf * v_scale.reshape(B, v.shape[1], cap, 1)
    lens = jnp.asarray(lens, jnp.int32).reshape(B)
    j = jnp.arange(cap)[None, None, None, :]
    if recent_k is not None:
        # Deferred-KV: big cache valid strictly below lens; the current
        # dispatch's rows live in the recent window, valid up to t.
        rk = recent_k.shape[2]
        mask_c = jnp.where(
            j < lens[:, None, None, None], 0.0, NEG_INF
        ).astype(jnp.float32)
        jr = jnp.arange(rk)[None, None, None, :]
        mask_r = jnp.broadcast_to(
            jnp.where(jr <= jnp.asarray(t, jnp.int32), 0.0, NEG_INF),
            (B, 1, 1, rk),
        ).astype(jnp.float32)
        kf = jnp.concatenate([kf, recent_k.astype(jnp.float32)], axis=2)
        vf = jnp.concatenate([vf, recent_v.astype(jnp.float32)], axis=2)
        mask = jnp.concatenate(
            [jnp.broadcast_to(mask_c, (B, 1, 1, cap)), mask_r], axis=3
        )
        mask = jnp.broadcast_to(mask, (B, 1, S, cap + rk))
        return mha_xla(q, kf, vf, mask, scale=scale)
    qpos = lens[:, None, None, None] + jnp.arange(S)[None, None, :, None]
    valid = j <= qpos
    if window:
        valid &= j > qpos - window
    mask = jnp.where(valid, 0.0, NEG_INF).astype(jnp.float32)
    return mha_xla(q, kf, vf, mask, scale=scale)


def decode_attention(q, k, v, lens, k_scale=None, v_scale=None, *, scale=None,
                     recent_k=None, recent_v=None, t=None, window: int = 0):
    """Route decode_mha to Pallas on TPU, XLA elsewhere."""
    if on_tpu():
        return decode_mha(q, k, v, lens, k_scale, v_scale, scale=scale,
                          recent_k=recent_k, recent_v=recent_v, t=t,
                          window=window)
    return decode_mha_xla(q, k, v, lens, k_scale, v_scale, scale=scale,
                          recent_k=recent_k, recent_v=recent_v, t=t,
                          window=window)


def decode_attention_deferred(q, k, v, lens0, k_scale=None, v_scale=None, *,
                              scale=None, recent_k, recent_v, t, k_new,
                              v_new, use_flash=True, interpret=False):
    """Deferred-KV decode step: returns (out, new_recent_k, new_recent_v).

    On TPU (aligned window) the Pallas kernel appends the new row into the
    aliased window via in-kernel DMA and scores it from VMEM; elsewhere
    the append is a dynamic_update_slice followed by the standard
    window-inclusive attention. Both orders compute identical math (the
    online softmax is order-free)."""
    B, Hkv = k_new.shape[0], k_new.shape[1]
    D = k_new.shape[3]
    aligned = (
        recent_k.shape[2] % 8 == 0
        # The DMA destination slice covers the FULL head dim, and Mosaic
        # requires HBM slice shapes 128-aligned on the lane axis — D=64
        # narrow-lane models (GPT-2) must take the dus fallback (padding
        # the window to 128 would break the no-copy output alias).
        and D % 128 == 0
        and q.shape[2] == 1
        # Single-row DMA writes need sublane-granular tiling: bf16 packs
        # 2 rows per tile word, so a 1-row slice is unaligned (Mosaic:
        # "Slice shape along dimension 2 must be aligned to tiling (2)").
        # bf16 windows keep the XLA dus append.
        and jnp.dtype(recent_k.dtype).itemsize >= 4
    )
    if use_flash and (on_tpu() or interpret) and aligned:
        return decode_mha(
            q, k, v, lens0, k_scale, v_scale, scale=scale,
            recent_k=recent_k, recent_v=recent_v, t=t,
            k_new=k_new, v_new=v_new, interpret=interpret,
        )
    tt = jnp.asarray(t, jnp.int32).reshape(())
    rk = jax.lax.dynamic_update_slice(
        recent_k, k_new.astype(recent_k.dtype), (0, 0, tt, 0)
    )
    rv = jax.lax.dynamic_update_slice(
        recent_v, v_new.astype(recent_v.dtype), (0, 0, tt, 0)
    )
    f = decode_attention if use_flash else decode_mha_xla
    out = f(q, k, v, lens0, k_scale, v_scale, scale=scale,
            recent_k=rk, recent_v=rv, t=t)
    return out, rk, rv


# --- in-kernel cache append (serving decode hot path) ------------------------
#
# The deferred-KV design (recent windows + once-per-dispatch commit) paid
# three taxes the round-4 trace measured at slots=96: the bf16 window
# streamed 196KB/slot/layer into every decode-attention call (~33% of the
# kernel's bytes), the per-step window dus cost ~180us/step, and the
# per-slot commit chains cost ~550us/step. Mosaic cannot DMA a single s8
# or bf16 cache row (sublane tiling / 128-lane alignment), so instead the
# new row is merged in VMEM and written back through ALIASED OUTPUT
# BLOCKS whose index maps are constant over the key-block grid axis: one
# small block write per slot replaces windows, window-appends and commits
# entirely.
#
# Layout notes (what the first, transposed attempt got wrong): ALL VPU
# work must stay lane-major — scores [Hp, Hkv*bk] with cache positions on
# LANES, exactly like _decode_kernel_folded_nt (the [W, Hp] transposed
# variant used 16 of 128 lanes for every exp/mask/reduce and measured
# 892us/call vs 136us on the chip). The write-back K/V block is 32 rows
# (the s8 sublane tile), NOT the full 128-row read block: appending one
# row must not cost a 131KB block write per slot per layer. Scales keep
# the decode path's lane-major [B,Hkv,1,cap] layout and write back at
# full lane-block granularity (the block is only Hkv*bk*4 bytes).


def _append_kernel(lens_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref,
                   kn_ref, vn_ref, out_ref, kw_ref, vw_ref, ksw_ref,
                   vsw_ref, m_ref, l_ref, acc_ref, *, scale: float,
                   cap: int, block_k: int, block_w: int, quant: bool,
                   group: int, window: int = 0,
                   single_block: bool = False):
    """Lane-major NT decode attention (S==1) with integrated cache append.

    Grid (slot, key-block). Blocks strictly BELOW the one holding the
    write position run _decode_kernel_folded_nt's score path verbatim
    (one [Hp,D]x[D,Hkv*bk] score dot + one value dot, GQA via lane
    masking, int8 scales lane-merged). The LAST grid step — whose
    resident block the read index map clamps to the write block — does
    everything else in a single merge:

      * quantizes the incoming K/V row (absmax/127, identical math to
        ops/attention.quantize) and scores the current token from the
        QUANTIZED row times its scale — bit-identical to what any later
        step computes when it re-reads the row from the cache;
      * lane-CONCATENATES the new-row scores/values onto the resident
        block's, so the whole tail costs ONE online-softmax merge (a
        separate new-row merge measured +46us/call at slots=96);
      * merges the row into a block_w-row slice of the resident block
        and writes it back through an aliased output targeting the
        32-row block containing row lens[b].

    Cache rows are valid strictly below lens[b]; the new row lands AT
    lens[b] (clamped to cap-1; the engine never decodes a full slot).

    single_block (nkb == 1, e.g. cap 256 at the default block_k): the
    whole body runs straight-line — no pl.when wrappers (an always-true
    scf.if around the body keeps Mosaic from pipelining DMA across
    slots: +18us/call at slots=96) and no online-softmax scratch (the
    single merge has no predecessor, so m/l/acc reads and alpha
    rescaling are dead weight: +7us).
    """
    b = pl.program_id(0)
    kb = pl.program_id(1)
    nkb = pl.num_programs(1)
    Hkv = k_ref.shape[1]
    D = k_ref.shape[3]
    H = q_ref.shape[1]
    Hp = m_ref.shape[0]
    bk = block_k
    bw = block_w

    lens_b = lens_ref[b]
    wpos = jnp.minimum(lens_b, cap - 1)
    wblk = wpos // bk

    q_sm = q_ref[0, :, 0, :]                       # [H, D] (S == 1)
    if Hp > H:
        q_t = jnp.concatenate(
            [q_sm, jnp.zeros((Hp - H, D), q_sm.dtype)], axis=0
        )
    else:
        q_t = q_sm

    def merge(s, vmat, vs_row=None):
        """Online-softmax merge of one lane-major score block (identical
        to _decode_kernel_folded_nt.merge)."""
        m_prev = m_ref[:]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        p = jnp.where(
            jnp.broadcast_to(m_new, s.shape) <= NEG_INF / 2, 0.0, p
        )
        alpha = jnp.where(
            m_prev <= NEG_INF / 2, 0.0, jnp.exp(m_prev - m_new)
        )
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
        if vs_row is not None:
            p = p * vs_row
        acc_ref[:] = acc_ref[:] * alpha + _dot_f32(
            p, vmat, (((1,), (0,)), ((), ()))
        )
        m_ref[:] = m_new

    def lane_merge(sc_ref, width):
        return jnp.concatenate(
            [sc_ref[0, kvh, 0, :].reshape(1, width) for kvh in range(Hkv)],
            axis=1,
        )

    def block_scores(blk, width):
        """Masked scores for the resident K block ([Hp, Hkv*width])."""
        km = k_ref[0].reshape(Hkv * width, D)
        s = _dot_f32(
            q_t, km, (((1,), (1,)), ((), ()))
        ) * scale
        if quant:
            s = s * lane_merge(ks_ref, width)
        sub = jax.lax.broadcasted_iota(jnp.int32, (Hp, Hkv * width), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (Hp, Hkv * width), 1)
        col = blk * width + lane % width
        valid = ((lane // width) == (sub // group)) & (sub < H)
        valid &= (col < lens_b) & (col < cap)
        if window:
            # The query sits at position lens; it attends (lens-window,
            # lens]: cached rows need col > lens - window.
            valid &= col > lens_b - window
        return jnp.where(valid, s, NEG_INF)

    def final_tail():
        knm = kn_ref[0, :, 0, :].astype(jnp.float32)   # [Hkv, D]
        vnm = vn_ref[0, :, 0, :].astype(jnp.float32)
        if quant:
            eye = (
                jax.lax.broadcasted_iota(jnp.int32, (Hkv, Hkv), 0)
                == jax.lax.broadcasted_iota(jnp.int32, (Hkv, Hkv), 1)
            ).astype(jnp.float32)

            def sub_to_lane(x):                        # [Hkv, 1] -> [1, Hkv]
                return jax.lax.dot_general(
                    x, eye, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )

            ks_new = jnp.maximum(
                jnp.max(jnp.abs(knm), axis=-1, keepdims=True) / 127.0, 1e-8
            )                                          # [Hkv, 1]
            vs_new = jnp.maximum(
                jnp.max(jnp.abs(vnm), axis=-1, keepdims=True) / 127.0, 1e-8
            )
            k_q = jnp.clip(jnp.round(knm / ks_new), -127, 127)
            v_q = jnp.clip(jnp.round(vnm / vs_new), -127, 127)
            # Score/value the row from its CACHE representation (s8):
            # _dot_f32 converts s8 the same way a later cache read does.
            k_row = k_q.astype(k_ref.dtype)
            v_row = v_q.astype(v_ref.dtype)
            ks_row = sub_to_lane(ks_new)               # [1, Hkv]
            vs_row = sub_to_lane(vs_new)
        else:
            # Score from the value the cache will hold (cast roundtrip).
            k_row = knm.astype(k_ref.dtype)
            v_row = vnm.astype(v_ref.dtype)
            ks_row = vs_row = None

        # Resident-block scores + new-row scores, one merge for both.
        sr = block_scores(wblk, bk)                    # [Hp, Hkv*bk]
        sn = _dot_f32(
            q_t, k_row, (((1,), (1,)), ((), ()))
        ) * scale                                      # [Hp, Hkv]
        if quant:
            sn = sn * ks_row
        subn = jax.lax.broadcasted_iota(jnp.int32, (Hp, Hkv), 0)
        lanen = jax.lax.broadcasted_iota(jnp.int32, (Hp, Hkv), 1)
        validn = (lanen == (subn // group)) & (subn < H)
        sn = jnp.where(validn, sn, NEG_INF)

        s_all = jnp.concatenate([sr, sn], axis=1)      # [Hp, Hkv*(bk+1)]
        vm_all = jnp.concatenate(
            [v_ref[0].reshape(Hkv * bk, D), v_row], axis=0
        )
        if quant:
            vs_all = jnp.concatenate(
                [lane_merge(vs_ref, bk), vs_row], axis=1
            )
        else:
            vs_all = None
        if single_block:
            # One key block: no prior merges, so skip the online-softmax
            # scratch entirely (m_prev = -inf, l_prev = 0, acc_prev = 0).
            # Straight-line code here (no always-true pl.when around the
            # body) lets Mosaic pipeline DMA across slots: 115 -> ~90us
            # per call at slots=96 in the round-4 bisect.
            m_new = jnp.max(s_all, axis=1, keepdims=True)
            p = jnp.exp(s_all - m_new)
            p = jnp.where(
                jnp.broadcast_to(m_new, s_all.shape) <= NEG_INF / 2, 0.0, p
            )
            l = jnp.sum(p, axis=1, keepdims=True)
            if vs_all is not None:
                p = p * vs_all
            acc = _dot_f32(p, vm_all, (((1,), (0,)), ((), ())))
        else:
            merge(s_all, vm_all, vs_all)
            l = l_ref[:]
            acc = acc_ref[:]
        l = jnp.where(l == 0.0, 1.0, l)
        out = (acc / l)[:H]                            # [H, D]
        bq = out_ref.shape[2]
        out_ref[0] = jnp.broadcast_to(
            out[:, None, :], (H, bq, D)
        ).astype(out_ref.dtype)

        # --- write-back ------------------------------------------------
        # The read index map clamps to wpos//bk, so at THIS (final) grid
        # step the resident K/V/scale input blocks are exactly the blocks
        # containing the write position — the bw-row write block is
        # always a live slice of the resident block (off in [0, bk-bw]).
        off = pl.multiple_of((wpos // bw) * bw - wblk * bk, bw)
        wrow = wpos % bw
        rowsel = (
            jax.lax.broadcasted_iota(jnp.int32, (Hkv, bw, D), 1) == wrow
        )

        def write_kv(w_ref, src_ref, row):
            base = src_ref[0, :, pl.ds(off, bw), :]
            w_ref[0] = jnp.where(rowsel, row[:, None, :], base)

        write_kv(kw_ref, k_ref, k_row)
        write_kv(vw_ref, v_ref, v_row)
        if quant:
            # Scales: full lane-block granularity ([Hkv, 1, bk] is tiny).
            lsel = (
                jax.lax.broadcasted_iota(jnp.int32, (Hkv, 1, bk), 2)
                == wpos % bk
            )
            ksw_ref[0] = jnp.where(lsel, ks_new[:, :, None], ks_ref[0])
            vsw_ref[0] = jnp.where(lsel, vs_new[:, :, None], vs_ref[0])

    if single_block:
        final_tail()
        return

    @pl.when(kb == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # Blocks strictly below the write block (the write block itself is
    # the LAST step's resident block and merges there, new row included).
    @pl.when(kb < wblk)
    def _():
        s = block_scores(kb, bk)
        vm = v_ref[0].reshape(Hkv * bk, D)
        merge(s, vm, lane_merge(vs_ref, bk) if quant else None)

    @pl.when(kb == nkb - 1)
    def _():
        final_tail()


def _append_entry(*refs, quant: bool, **kw):
    """Arity adapter: the non-quant variant has no scale operands."""
    if quant:
        (lens, q, k, v, ks, vs, kn, vn,
         out, kw_, vw_, ksw, vsw, m, l, acc) = refs
    else:
        (lens, q, k, v, kn, vn, out, kw_, vw_, m, l, acc) = refs
        ks = vs = ksw = vsw = None
    return _append_kernel(
        lens, q, k, v, ks, vs, kn, vn, out, kw_, vw_, ksw, vsw,
        m, l, acc, quant=quant, **kw
    )


def decode_mha_append(q, k, v, lens, k_scale=None, v_scale=None, *,
                      k_new, v_new, scale=None, block_k: int = 256,
                      window: int = 0, interpret: bool = False):
    """Decode attention with integrated cache append (S == 1 only).

    q [B,H,1,D]; k/v [B,Hkv,cap,D] caches holding rows < lens[b]; k_new /
    v_new [B,Hkv,1,D] f32 rows for position lens[b]. Quantized caches
    (k_scale/v_scale [B,Hkv,cap] lane-major) quantize the row in-kernel.

    Returns (out [B,H,1,D], new_k, new_v) or (+ new_k_scale, new_v_scale)
    for quantized caches — the cache outputs alias their inputs, so under
    jit-with-donation the append is in place.
    """
    B, H, S, D = q.shape
    _, Hkv, cap, _ = k.shape
    assert S == 1, "decode_mha_append is a single-token decode kernel"
    assert D in (64, 128, 256, 512), f"unsupported head dim {D}"
    group = H // Hkv
    if scale is None:
        scale = 1.0 / float(np.sqrt(D))
    quant = k_scale is not None
    bk = min(block_k, round_up(cap, 128))
    assert cap % bk == 0, f"cap {cap} must be a multiple of block_k {bk}"
    # Write-back granularity: the s8 sublane tile (32) is the smallest
    # block Mosaic can address for every cache dtype in play.
    bw = min(32, bk)
    nkb = cap // bk
    Hp = round_up(H, 8)
    bq = 8

    qp = pad_dim(q, 2, bq)
    lens = jnp.asarray(lens, jnp.int32)

    # Read clamp: wpos//bk (not jmax) so the FINAL grid step's resident
    # block is the one containing the write position — the write-back
    # base is then always a live slice of the resident block, and dead
    # rows in the cache are preserved bit-exactly. For kb <= jmax the
    # clamp is the identity, so attention reads are unchanged.
    kv_index = lambda b, j, lens: (
        b, 0, jnp.minimum(j, jnp.minimum(lens[b], cap - 1) // bk), 0
    )
    sc_index = lambda b, j, lens: (
        b, 0, 0, jnp.minimum(j, jnp.minimum(lens[b], cap - 1) // bk)
    )
    w_index = lambda b, j, lens: (
        b, 0, jnp.minimum(lens[b], cap - 1) // bw, 0
    )
    sw_index = lambda b, j, lens: (
        b, 0, 0, jnp.minimum(lens[b], cap - 1) // bk
    )
    fixed = lambda b, j, lens: (b, 0, 0, 0)

    kernel = functools.partial(
        _append_entry,
        scale=float(scale), cap=cap, block_k=bk, block_w=bw, quant=quant,
        group=group, window=int(window), single_block=(nkb == 1),
    )
    in_specs = [
        pl.BlockSpec((1, H, bq, D), fixed),
        pl.BlockSpec((1, Hkv, bk, D), kv_index),
        pl.BlockSpec((1, Hkv, bk, D), kv_index),
    ]
    operands = [qp, k, v]
    if quant:
        ksp = k_scale.reshape(B, Hkv, 1, cap)
        vsp = v_scale.reshape(B, Hkv, 1, cap)
        in_specs += [
            pl.BlockSpec((1, Hkv, 1, bk), sc_index),
            pl.BlockSpec((1, Hkv, 1, bk), sc_index),
        ]
        operands += [ksp, vsp]
    in_specs += [
        pl.BlockSpec((1, Hkv, 1, D), fixed),
        pl.BlockSpec((1, Hkv, 1, D), fixed),
    ]
    operands += [jnp.asarray(k_new, jnp.float32),
                 jnp.asarray(v_new, jnp.float32)]

    out_specs = [
        pl.BlockSpec((1, H, bq, D), fixed),
        pl.BlockSpec((1, Hkv, bw, D), w_index),
        pl.BlockSpec((1, Hkv, bw, D), w_index),
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((B, H, bq, D), q.dtype),
        jax.ShapeDtypeStruct(k.shape, k.dtype),
        jax.ShapeDtypeStruct(v.shape, v.dtype),
    ]
    # Operand indices include the scalar-prefetch lens (index 0): the k/v
    # caches (and scale pools) alias straight through to their outputs.
    aliases = {2: 1, 3: 2}
    if quant:
        out_specs += [
            pl.BlockSpec((1, Hkv, 1, bk), sw_index),
            pl.BlockSpec((1, Hkv, 1, bk), sw_index),
        ]
        out_shapes += [
            jax.ShapeDtypeStruct(ksp.shape, ksp.dtype),
            jax.ShapeDtypeStruct(vsp.shape, vsp.dtype),
        ]
        aliases = {2: 1, 3: 2, 4: 3, 5: 4}

    res = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, nkb),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((Hp, 1), jnp.float32),
                pltpu.VMEM((Hp, 1), jnp.float32),
                pltpu.VMEM((Hp, D), jnp.float32),
            ],
        ),
        out_shape=out_shapes,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * cap * D,
            bytes_accessed=(
                B * H * bq * D * 8
                + 2 * B * Hkv * cap * (1 if quant else k.dtype.itemsize)
                + 2 * B * Hkv * bw * D * k.dtype.itemsize
            ),
            transcendentals=B * H * cap,
        ),
        interpret=interpret,
    )(lens, *operands)
    out = res[0][:, :, :S, :D]
    if quant:
        sshape = k_scale.shape
        return (out, res[1], res[2],
                res[3].reshape(sshape), res[4].reshape(sshape))
    return out, res[1], res[2]


def decode_attention_append(q, k, v, lens, k_scale=None, v_scale=None, *,
                            k_new, v_new, scale=None, window: int = 0,
                            use_flash=True, interpret=False):
    """Route the append-mode decode step: the Pallas kernel on TPU, an
    equivalent dus-write + attention elsewhere. Both compute identical
    math (quantize row, write at lens, attend rows <= lens)."""
    B, Hkv = k_new.shape[0], k_new.shape[1]
    cap = k.shape[2]
    quant = k_scale is not None
    eligible = (
        use_flash
        and (on_tpu() or interpret)
        and q.shape[2] == 1
        and q.shape[3] in (64, 128, 256, 512)
        and k.dtype != jnp.uint8  # int4 stays on the deferred path
    )
    if eligible:
        return decode_mha_append(
            q, k, v, lens, k_scale, v_scale, k_new=k_new, v_new=v_new,
            scale=scale, window=window, interpret=interpret,
        )
    # Fallback: quantize + row-write + standard attention.
    lens = jnp.asarray(lens, jnp.int32).reshape(B)
    if quant:
        knm = jnp.asarray(k_new, jnp.float32)
        vnm = jnp.asarray(v_new, jnp.float32)
        ks_new = jnp.maximum(
            jnp.max(jnp.abs(knm), axis=-1, keepdims=True) / 127.0, 1e-8
        )
        vs_new = jnp.maximum(
            jnp.max(jnp.abs(vnm), axis=-1, keepdims=True) / 127.0, 1e-8
        )
        k_q = jnp.clip(jnp.round(knm / ks_new), -127, 127).astype(jnp.int8)
        v_q = jnp.clip(jnp.round(vnm / vs_new), -127, 127).astype(jnp.int8)

        def row_write(buf, new, starts):
            for i in range(B):
                buf = jax.lax.dynamic_update_slice(
                    buf, new[i: i + 1], (i, 0, starts[i], 0)
                )
            return buf

        nk = row_write(k, k_q, lens)
        nv = row_write(v, v_q, lens)
        nks = row_write(k_scale, ks_new.astype(k_scale.dtype), lens)
        nvs = row_write(v_scale, vs_new.astype(v_scale.dtype), lens)
        f = decode_attention if use_flash else decode_mha_xla
        out = f(q, nk, nv, lens,
                nks.reshape(B, Hkv, cap), nvs.reshape(B, Hkv, cap),
                scale=scale, window=window)
        return out, nk, nv, nks, nvs
    nk = k
    nv = v
    for i in range(B):
        nk = jax.lax.dynamic_update_slice(
            nk, k_new[i: i + 1].astype(k.dtype), (i, 0, lens[i], 0)
        )
        nv = jax.lax.dynamic_update_slice(
            nv, v_new[i: i + 1].astype(v.dtype), (i, 0, lens[i], 0)
        )
    f = decode_attention if use_flash else decode_mha_xla
    out = f(q, nk, nv, lens, scale=scale, window=window)
    return out, nk, nv


# --- cat-layout caches ([slots, cap, Hkv*D]) ---------------------------------
#
# The 4D cache layout [B, Hkv, cap, D] leaves the minor dimension at
# D=64 for GPT-2-class heads: every s8 VMEM tile is half-empty (64 of
# 128 lanes) and the HBM->VMEM streams measured ~444 GB/s. Storing each
# cache row CONCATENATED across heads — [B, cap, Hkv*D], the natural
# layout of the QKV projection output — packs the minor dimension (768+)
# and the same stream measured 732 GB/s (round-4 microbench). It also
# collapses the score path to ONE 2D NT dot per block:
#
#   qblk [Hp, Hkv*D] (row h carries q[h] in lane slice h//group, zeros
#   elsewhere) x Kcat [bk, Hkv*D] -> scores [Hp, bk]
#
# so exp/mask/merge run on bk lanes instead of Hkv*bk (12x less VPU work
# for MHA), and the value dot is p [Hp, bk] x Vcat [bk, Hkv*D] ->
# out_cat [Hp, Hkv*D], extracted per head with Hkv static lane slices.
# MXU work is unchanged (the contraction is padded with structural
# zeros, which the systolic array streams at full rate).


def _append_cat_kernel(lens_ref, q_ref, kc_ref, vc_ref, ks_ref, vs_ref,
                       kn_ref, vn_ref, knc_ref, vnc_ref, out_ref, kcw_ref,
                       vcw_ref, ksw_ref, vsw_ref, m_ref, l_ref, acc_ref,
                       kr_ref=None, vr_ref=None, ksr_ref=None, vsr_ref=None,
                       sems=None, *,
                       scale: float, cap: int, block_k: int, block_w: int,
                       quant: bool, group: int, window: int = 0,
                       single_block: bool = False, cat_q: bool = False,
                       row_dma: bool = False):
    """Cat-layout decode attention (S==1) with integrated cache append.

    Same contract as _append_kernel with caches in [B, cap, Hkv*D] form:
    rows < lens[b] are valid, the new row (given BOTH head-major
    [B,Hkv,1,D] for per-head absmax and cat [B,1,Hkv*D] for scoring and
    writing — Mosaic cannot shape-cast sublanes to lanes) lands AT
    lens[b] through an aliased block_w-row output block.

    cat_q (MHA only, group == 1): q arrives AND the attention output
    leaves as one cat row [1, Hkv*D] instead of padded head-major
    [H, bq, D] blocks — the row IS the QKV projection's natural output
    and the proj matmul's natural input, so the serving graph sheds the
    8-sublane pad on q (2.4MB -> 0.3MB read at slots=96) and the padded
    out write plus its downstream slice/transpose glue.

    row_dma (round 5): the cache/scale outputs are ANY-space aliases of
    their inputs and the kernel DMAs ONLY the new row into HBM (1.6KB vs
    the bw-row aliased block's 48KB/slot read-modify-write), overlapping
    the copy with the output extract. Kills the ~17us/call write-back
    stall the block alias cost (docs/serving.md round-4 notes).
    """
    b = pl.program_id(0)
    kb = pl.program_id(1)
    nkb = pl.num_programs(1)
    Hkv = kn_ref.shape[1]
    D = kn_ref.shape[3]
    HkvD = Hkv * D
    H = Hkv if cat_q else q_ref.shape[1]  # cat_q implies group == 1
    Hp = m_ref.shape[0]
    bk = block_k
    bw = block_w

    lens_b = lens_ref[b]
    wpos = jnp.minimum(lens_b, cap - 1)
    wblk = wpos // bk

    subq = jax.lax.broadcasted_iota(jnp.int32, (Hp, HkvD), 0)
    laneq = jax.lax.broadcasted_iota(jnp.int32, (Hp, HkvD), 1)
    if cat_q:
        # Row h keeps its own lane slice of the cat q row: with group==1
        # head h's query already sits at lane slice h.
        qblk = jnp.where(
            (laneq // D) == subq,
            jnp.broadcast_to(q_ref[0], (Hp, HkvD)), 0.0,
        )
    else:
        q_sm = q_ref[0, :, 0, :]                   # [H, D] (S == 1)
        if Hp > H:
            q_t = jnp.concatenate(
                [q_sm, jnp.zeros((Hp - H, D), q_sm.dtype)], axis=0
            )
        else:
            q_t = q_sm
        qblk = jnp.where(
            (laneq // D) == (subq // group), jnp.tile(q_t, (1, Hkv)), 0.0
        )
    # One-hot head->row expander: row h selects kv head h//group.
    oneh = (
        jax.lax.broadcasted_iota(jnp.int32, (Hp, Hkv), 1)
        == jax.lax.broadcasted_iota(jnp.int32, (Hp, Hkv), 0) // group
    ).astype(jnp.float32)

    sub_b = jax.lax.broadcasted_iota(jnp.int32, (Hp, bk), 0)
    lane_b = jax.lax.broadcasted_iota(jnp.int32, (Hp, bk), 1)

    def expand(sc):                                # [Hkv, w] -> [Hp, w]
        return jax.lax.dot_general(
            oneh, sc, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def block_scores(blk):
        s = _dot_f32(qblk, kc_ref[0], (((1,), (1,)), ((), ()))) * scale
        if quant:
            s = s * expand(ks_ref[0, :, 0, :])
        col = blk * bk + lane_b
        valid = (sub_b < H) & (col < lens_b) & (col < cap)
        if window:
            valid &= col > lens_b - window
        return jnp.where(valid, s, NEG_INF)

    def pv_cat(p):                                 # [Hp, bk] -> [Hp, HkvD]
        if quant:
            p = p * expand(vs_ref[0, :, 0, :])
        return _dot_f32(p, vc_ref[0], (((1,), (0,)), ((), ())))

    def merge(s, pv_fn):
        m_prev = m_ref[:]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        p = jnp.where(
            jnp.broadcast_to(m_new, s.shape) <= NEG_INF / 2, 0.0, p
        )
        alpha = jnp.where(
            m_prev <= NEG_INF / 2, 0.0, jnp.exp(m_prev - m_new)
        )
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_ref[:] = acc_ref[:] * alpha + pv_fn(p)
        m_ref[:] = m_new

    def extract(out_cat):                          # [Hp, HkvD] -> [Hp, D]
        out = jnp.zeros((Hp, D), jnp.float32)
        for kvh in range(Hkv):
            out = out + out_cat[:, kvh * D:(kvh + 1) * D] \
                * oneh[:, kvh:kvh + 1]
        return out

    def final_tail():
        knm = kn_ref[0, :, 0, :].astype(jnp.float32)   # [Hkv, D]
        vnm = vn_ref[0, :, 0, :].astype(jnp.float32)
        kn_cat = knc_ref[0].astype(jnp.float32)        # [1, HkvD]
        vn_cat = vnc_ref[0].astype(jnp.float32)
        if quant:
            segq = (
                (jax.lax.broadcasted_iota(jnp.int32, (Hkv, HkvD), 1) // D)
                == jax.lax.broadcasted_iota(jnp.int32, (Hkv, HkvD), 0)
            ).astype(jnp.float32)

            def cat_expand(x):                     # [Hkv, 1] -> [1, HkvD]
                return jax.lax.dot_general(
                    x, segq, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

            ks_new = jnp.maximum(
                jnp.max(jnp.abs(knm), axis=-1, keepdims=True) / 127.0, 1e-8
            )                                          # [Hkv, 1]
            vs_new = jnp.maximum(
                jnp.max(jnp.abs(vnm), axis=-1, keepdims=True) / 127.0, 1e-8
            )
            k_row = jnp.clip(
                jnp.round(kn_cat / cat_expand(ks_new)), -127, 127
            ).astype(kcw_ref.dtype)
            v_row = jnp.clip(
                jnp.round(vn_cat / cat_expand(vs_new)), -127, 127
            ).astype(vcw_ref.dtype)
        else:
            k_row = kn_cat.astype(kcw_ref.dtype)
            v_row = vn_cat.astype(vcw_ref.dtype)

        if row_dma:
            # Stage tile-ALIGNED windows around the write position (int8's
            # packed (8,128)(4,1) tiling rejects 1-row HBM slices: 4 rows
            # share a sublane word) and fire the HBM copies NOW — they
            # overlap with the score/value dots below. 32 rows covers the
            # packing of every cache dtype in play; scale lanes align 128.
            b_ = pl.program_id(0)
            woff = (wpos // 32) * 32               # global, 32-aligned
            woff_in = pl.multiple_of(woff - wblk * bk, 32)
            rsel = (
                jax.lax.broadcasted_iota(jnp.int32, (32, HkvD), 0)
                == wpos % 32
            )
            kr_ref[:] = jnp.where(
                rsel, jnp.broadcast_to(k_row, (32, HkvD)),
                kc_ref[0, pl.ds(woff_in, 32), :],
            )
            vr_ref[:] = jnp.where(
                rsel, jnp.broadcast_to(v_row, (32, HkvD)),
                vc_ref[0, pl.ds(woff_in, 32), :],
            )
            dst_r = pl.ds(pl.multiple_of(woff, 32), 32)
            cps = [
                pltpu.make_async_copy(
                    kr_ref, kcw_ref.at[b_, dst_r, :], sems.at[0]
                ),
                pltpu.make_async_copy(
                    vr_ref, vcw_ref.at[b_, dst_r, :], sems.at[1]
                ),
            ]
            if quant:
                loff = (wpos // 128) * 128
                loff_in = pl.multiple_of(loff - wblk * bk, 128)
                lsel = (
                    jax.lax.broadcasted_iota(jnp.int32, (Hkv, 1, 128), 2)
                    == wpos % 128
                )
                ksr_ref[:] = jnp.where(
                    lsel, ks_new[:, :, None],
                    ks_ref[0, :, :, pl.ds(loff_in, 128)],
                )
                vsr_ref[:] = jnp.where(
                    lsel, vs_new[:, :, None],
                    vs_ref[0, :, :, pl.ds(loff_in, 128)],
                )
                dst_l = pl.ds(pl.multiple_of(loff, 128), 128)
                cps += [
                    pltpu.make_async_copy(
                        ksr_ref, ksw_ref.at[b_, :, :, dst_l], sems.at[2]
                    ),
                    pltpu.make_async_copy(
                        vsr_ref, vsw_ref.at[b_, :, :, dst_l], sems.at[3]
                    ),
                ]
            for cp in cps:
                cp.start()

        sr = block_scores(wblk)                        # [Hp, bk]
        sn = _dot_f32(
            qblk, k_row, (((1,), (1,)), ((), ()))
        ) * scale                                      # [Hp, 1]
        if quant:
            sn = sn * expand(ks_new)
        sub1 = jax.lax.broadcasted_iota(jnp.int32, (Hp, 1), 0)
        sn = jnp.where(sub1 < H, sn, NEG_INF)
        s_all = jnp.concatenate([sr, sn], axis=1)      # [Hp, bk+1]

        def pv_all(p_all):
            p_r, p_n = p_all[:, :bk], p_all[:, bk:]
            acc = pv_cat(p_r)
            if quant:
                p_n = p_n * expand(vs_new)
            return acc + _dot_f32(
                p_n, v_row, (((1,), (0,)), ((), ()))
            )

        if single_block:
            # One key block: no prior merges — skip the online-softmax
            # scratch and pl.when wrappers entirely (see _append_kernel).
            m_new = jnp.max(s_all, axis=1, keepdims=True)
            p = jnp.exp(s_all - m_new)
            p = jnp.where(
                jnp.broadcast_to(m_new, s_all.shape) <= NEG_INF / 2, 0.0, p
            )
            l = jnp.sum(p, axis=1, keepdims=True)
            acc = pv_all(p)
        else:
            merge(s_all, pv_all)
            l = l_ref[:]
            acc = acc_ref[:]
        l = jnp.where(l == 0.0, 1.0, l)
        if cat_q:
            # Diagonal extract straight into a cat row: head h's output
            # is lane slice h of row h (group == 1); rows >= H are zero
            # (their scores were masked, acc == 0). A sublane reduce of
            # the diag-masked accumulator adds only exact zeros, so the
            # values are bit-identical to the head-major extract.
            x = acc / l                                # [Hp, HkvD]
            out_ref[0] = jnp.sum(
                jnp.where((laneq // D) == subq, x, 0.0),
                axis=0, keepdims=True,
            ).astype(out_ref.dtype)
        else:
            out = extract(acc / l)[:H]                 # [H, D]
            bq = out_ref.shape[2]
            out_ref[0] = jnp.broadcast_to(
                out[:, None, :], (H, bq, D)
            ).astype(out_ref.dtype)

        if row_dma:
            for cp in cps:
                cp.wait()
        else:
            # Write-back: the read clamp puts the write position inside the
            # resident block; the bw-row output block is a live slice of it.
            off = pl.multiple_of((wpos // bw) * bw - wblk * bk, bw)
            wrow = wpos % bw
            rowsel = (
                jax.lax.broadcasted_iota(jnp.int32, (bw, HkvD), 0) == wrow
            )
            kcw_ref[0] = jnp.where(
                rowsel, jnp.broadcast_to(k_row, (bw, HkvD)),
                kc_ref[0, pl.ds(off, bw), :],
            )
            vcw_ref[0] = jnp.where(
                rowsel, jnp.broadcast_to(v_row, (bw, HkvD)),
                vc_ref[0, pl.ds(off, bw), :],
            )
            if quant:
                lsel = (
                    jax.lax.broadcasted_iota(jnp.int32, (Hkv, 1, bk), 2)
                    == wpos % bk
                )
                ksw_ref[0] = jnp.where(lsel, ks_new[:, :, None], ks_ref[0])
                vsw_ref[0] = jnp.where(lsel, vs_new[:, :, None], vs_ref[0])

    if single_block:
        final_tail()
        return

    @pl.when(kb == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(kb < wblk)
    def _():
        merge(block_scores(kb), pv_cat)

    @pl.when(kb == nkb - 1)
    def _():
        final_tail()


def _append_cat_entry(*refs, quant: bool, row_dma: bool = False,
                      paged: bool = False, **kw):
    """Arity adapter: the non-quant variant has no scale operands; the
    row_dma variant appends row-staging scratch + DMA semaphores; the
    paged variant carries a block-table scalar ref the BODY never reads
    (indirection happens in the BlockSpec index maps)."""
    if paged:
        refs = refs[:1] + refs[2:]     # drop the bt scalar ref
    kr = vr = ksr = vsr = sems = None
    if quant and row_dma:
        (lens, q, kc, vc, ks, vs, kn, vn, knc, vnc,
         out, kcw, vcw, ksw, vsw, m, l, acc, kr, vr, ksr, vsr, sems) = refs
    elif quant:
        (lens, q, kc, vc, ks, vs, kn, vn, knc, vnc,
         out, kcw, vcw, ksw, vsw, m, l, acc) = refs
    elif row_dma:
        (lens, q, kc, vc, kn, vn, knc, vnc,
         out, kcw, vcw, m, l, acc, kr, vr, sems) = refs
        ks = vs = ksw = vsw = None
    else:
        (lens, q, kc, vc, kn, vn, knc, vnc,
         out, kcw, vcw, m, l, acc) = refs
        ks = vs = ksw = vsw = None
    return _append_cat_kernel(
        lens, q, kc, vc, ks, vs, kn, vn, knc, vnc, out, kcw, vcw,
        ksw, vsw, m, l, acc, kr, vr, ksr, vsr, sems,
        quant=quant, row_dma=row_dma, **kw
    )


def _append_cat_fold_kernel(lens_ref, q_ref, kc_ref, vc_ref, ks_ref, vs_ref,
                            kn_ref, vn_ref, knc_ref, vnc_ref, out_ref,
                            kcw_ref, vcw_ref, ksw_ref, vsw_ref,
                            kr_ref, vr_ref, ksr_ref, vsr_ref, sems, *,
                            scale: float, cap: int, quant: bool, G: int,
                            Hp: int, group: int = 1):
    """G-slot-folded cat append kernel (single resident block; MHA rides
    cat q/out rows, GQA (group > 1) head-major q with a masked extract).

    The per-slot grid of _append_cat_kernel is DMA-ISSUE-bound at the
    headline shape: ~14 block copies per grid step against a 0.48us/slot
    stream floor (round-5 trace). Folding G slots into one grid step
    amortizes the input-side issue G-fold; the per-slot cache/scale
    write-backs become tile-aligned async copies (32 cache rows, 128 scale
    lanes) fired as each slot's row is ready and awaited once per step, so
    they overlap the remaining slots' compute instead of stalling the
    pipeline the way the aliased bw-block outputs did.
    """
    b0 = pl.program_id(0) * G
    Hkv = kn_ref.shape[1]
    D = kn_ref.shape[3]
    HkvD = Hkv * D
    H = Hkv * group
    cat_q = group == 1

    subq = jax.lax.broadcasted_iota(jnp.int32, (Hp, HkvD), 0)
    laneq = jax.lax.broadcasted_iota(jnp.int32, (Hp, HkvD), 1)
    diag = (laneq // D) == (subq // group)
    oneh = (
        jax.lax.broadcasted_iota(jnp.int32, (Hp, Hkv), 1)
        == jax.lax.broadcasted_iota(jnp.int32, (Hp, Hkv), 0) // group
    ).astype(jnp.float32)
    sub_b = jax.lax.broadcasted_iota(jnp.int32, (Hp, cap), 0)
    lane_b = jax.lax.broadcasted_iota(jnp.int32, (Hp, cap), 1)
    segq = (
        (jax.lax.broadcasted_iota(jnp.int32, (Hkv, HkvD), 1) // D)
        == jax.lax.broadcasted_iota(jnp.int32, (Hkv, HkvD), 0)
    ).astype(jnp.float32)

    def expand(sc):                                # [Hkv, w] -> [Hp, w]
        return jax.lax.dot_general(
            oneh, sc, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def cat_expand(x):                             # [Hkv, 1] -> [1, HkvD]
        return jax.lax.dot_general(
            x, segq, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def slot_copies(gi):
        """The slot's write-back copies (same descriptors used to start and
        later to wait: recomputed from lens, so both sites agree)."""
        wpos = jnp.minimum(lens_ref[b0 + gi], cap - 1)
        woff = pl.multiple_of((wpos // 32) * 32, 32)
        bb = b0 + gi
        cps = [
            pltpu.make_async_copy(
                kr_ref.at[gi], kcw_ref.at[bb, pl.ds(woff, 32), :],
                sems.at[gi, 0],
            ),
            pltpu.make_async_copy(
                vr_ref.at[gi], vcw_ref.at[bb, pl.ds(woff, 32), :],
                sems.at[gi, 1],
            ),
        ]
        if quant:
            loff = pl.multiple_of((wpos // 128) * 128, 128)
            cps += [
                pltpu.make_async_copy(
                    ksr_ref.at[gi], ksw_ref.at[bb, :, :, pl.ds(loff, 128)],
                    sems.at[gi, 2],
                ),
                pltpu.make_async_copy(
                    vsr_ref.at[gi], vsw_ref.at[bb, :, :, pl.ds(loff, 128)],
                    sems.at[gi, 3],
                ),
            ]
        return cps

    def body(gi, carry):
        # fori_loop (not a Python unroll): the unrolled G=8 body blew Mosaic
        # compile time past 9 minutes; the loop compiles the slot body once.
        lens_b = lens_ref[b0 + gi]
        wpos = jnp.minimum(lens_b, cap - 1)
        if cat_q:
            q_row = q_ref[pl.ds(gi, 1), :, :][0]        # [1, HkvD]
            qblk = jnp.where(
                diag, jnp.broadcast_to(q_row, (Hp, HkvD)), 0.0
            )
        else:
            q_sm = q_ref[pl.ds(gi, 1), :, :][0]         # [H, D]
            if Hp > H:
                q_sm = jnp.concatenate(
                    [q_sm, jnp.zeros((Hp - H, D), q_sm.dtype)], axis=0
                )
            qblk = jnp.where(diag, jnp.tile(q_sm, (1, Hkv)), 0.0)
        kc_g = kc_ref[pl.ds(gi, 1), :, :][0]            # [cap, HkvD]
        vc_g = vc_ref[pl.ds(gi, 1), :, :][0]
        kn_cat = knc_ref[pl.ds(gi, 1), :, :][0].astype(jnp.float32)
        vn_cat = vnc_ref[pl.ds(gi, 1), :, :][0].astype(jnp.float32)
        if quant:
            knm = kn_ref[pl.ds(gi, 1), :, :, :][0, :, 0, :].astype(
                jnp.float32)                            # [Hkv, D]
            vnm = vn_ref[pl.ds(gi, 1), :, :, :][0, :, 0, :].astype(
                jnp.float32)
            ks_g = ks_ref[pl.ds(gi, 1), :, :, :][0, :, 0, :]  # [Hkv, cap]
            vs_g = vs_ref[pl.ds(gi, 1), :, :, :][0, :, 0, :]
            ks_new = jnp.maximum(
                jnp.max(jnp.abs(knm), axis=-1, keepdims=True) / 127.0, 1e-8
            )
            vs_new = jnp.maximum(
                jnp.max(jnp.abs(vnm), axis=-1, keepdims=True) / 127.0, 1e-8
            )
            k_row = jnp.clip(
                jnp.round(kn_cat / cat_expand(ks_new)), -127, 127
            ).astype(kr_ref.dtype)
            v_row = jnp.clip(
                jnp.round(vn_cat / cat_expand(vs_new)), -127, 127
            ).astype(vr_ref.dtype)
        else:
            k_row = kn_cat.astype(kr_ref.dtype)
            v_row = vn_cat.astype(vr_ref.dtype)

        s = _dot_f32(
            qblk, kc_g, (((1,), (1,)), ((), ()))
        ) * scale                                       # [Hp, cap]
        if quant:
            s = s * expand(ks_g)
        valid = (sub_b < H) & (lane_b < lens_b)
        s = jnp.where(valid, s, NEG_INF)
        sn = _dot_f32(
            qblk, k_row, (((1,), (1,)), ((), ()))
        ) * scale                                       # [Hp, 1]
        if quant:
            sn = sn * expand(ks_new)
        sn = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (Hp, 1), 0) < H, sn, NEG_INF
        )
        s_all = jnp.concatenate([s, sn], axis=1)        # [Hp, cap+1]
        m = jnp.max(s_all, axis=1, keepdims=True)
        p = jnp.exp(s_all - m)
        p = jnp.where(
            jnp.broadcast_to(m, s_all.shape) <= NEG_INF / 2, 0.0, p
        )
        l = jnp.sum(p, axis=1, keepdims=True)
        p_r, p_n = p[:, :cap], p[:, cap:]
        if quant:
            p_r = p_r * expand(vs_g)
            p_n = p_n * expand(vs_new)
        acc = _dot_f32(p_r, vc_g, (((1,), (0,)), ((), ())))
        acc = acc + _dot_f32(p_n, v_row, (((1,), (0,)), ((), ())))
        l = jnp.where(l == 0.0, 1.0, l)
        x = acc / l                                     # [Hp, HkvD]
        if cat_q:
            out_ref[pl.ds(gi, 1), :, :] = jnp.sum(
                jnp.where(diag, x, 0.0), axis=0, keepdims=True
            ).astype(out_ref.dtype)[None]
        else:
            o = jnp.zeros((Hp, D), jnp.float32)
            for kvh in range(Hkv):
                o = o + x[:, kvh * D:(kvh + 1) * D] * oneh[:, kvh:kvh + 1]
            out_ref[pl.ds(gi, 1), :, :] = o[:H].astype(out_ref.dtype)[None]

        # Stage tile-aligned write windows and fire the HBM copies; all
        # waits are deferred to after the loop so each slot's writes
        # overlap the remaining slots' compute.
        woff = pl.multiple_of((wpos // 32) * 32, 32)
        rsel = (
            jax.lax.broadcasted_iota(jnp.int32, (32, HkvD), 0) == wpos % 32
        )
        kr_ref[pl.ds(gi, 1), :, :] = jnp.where(
            rsel, jnp.broadcast_to(k_row, (32, HkvD)),
            kc_ref[pl.ds(gi, 1), pl.ds(woff, 32), :][0],
        )[None]
        vr_ref[pl.ds(gi, 1), :, :] = jnp.where(
            rsel, jnp.broadcast_to(v_row, (32, HkvD)),
            vc_ref[pl.ds(gi, 1), pl.ds(woff, 32), :][0],
        )[None]
        if quant:
            loff = pl.multiple_of((wpos // 128) * 128, 128)
            lsel = (
                jax.lax.broadcasted_iota(jnp.int32, (Hkv, 1, 128), 2)
                == wpos % 128
            )
            ksr_ref[pl.ds(gi, 1), :, :, :] = jnp.where(
                lsel, ks_new[:, :, None],
                ks_ref[pl.ds(gi, 1), :, :, pl.ds(loff, 128)][0],
            )[None]
            vsr_ref[pl.ds(gi, 1), :, :, :] = jnp.where(
                lsel, vs_new[:, :, None],
                vs_ref[pl.ds(gi, 1), :, :, pl.ds(loff, 128)][0],
            )[None]
        for cp in slot_copies(gi):
            cp.start()
        return carry

    jax.lax.fori_loop(0, G, body, 0)

    def wait_body(gi, carry):
        for cp in slot_copies(gi):
            cp.wait()
        return carry

    jax.lax.fori_loop(0, G, wait_body, 0)


def _append_cat_fold_entry(*refs, quant: bool, **kw):
    if quant:
        (lens, q, kc, vc, ks, vs, kn, vn, knc, vnc,
         out, kcw, vcw, ksw, vsw, kr, vr, ksr, vsr, sems) = refs
    else:
        (lens, q, kc, vc, kn, vn, knc, vnc,
         out, kcw, vcw, kr, vr, sems) = refs
        ks = vs = ksw = vsw = ksr = vsr = None
    return _append_cat_fold_kernel(
        lens, q, kc, vc, ks, vs, kn, vn, knc, vnc, out, kcw, vcw,
        ksw, vsw, kr, vr, ksr, vsr, sems, quant=quant, **kw
    )


def _append_cat_fold_vec_kernel(lens_ref, q_ref, kc_ref, vc_ref, ks_ref,
                                vs_ref, kn_ref, vn_ref, knc_ref, vnc_ref,
                                lensv_ref, out_ref, kcw_ref, vcw_ref,
                                ksw_ref, vsw_ref, kr_ref, vr_ref, ksr_ref,
                                vsr_ref, krow_ref, vrow_ref, ksn_ref,
                                vsn_ref, kbuf_ref, vbuf_ref, isem, sems, *,
                                bt_ref=None, ksbuf_ref=None, vsbuf_ref=None,
                                scale: float, cap: int,
                                quant: bool, G: int, Hp: int,
                                group: int = 1, window: int = 0,
                                stream: bool = False, paged: bool = False):
    """Vectorized G-slot fold: all compute batched over
    the G slots — batched MXU dots + full-width VPU softmax — with the
    fori_loop kept only for the per-slot dynamic-offset write staging.

    Why: ablating the loop kernel on-chip showed the per-slot fori_loop
    body is ISSUE-bound, not compute- or byte-bound — removing the whole
    PV dot saved 4% while halving cap saved only the byte-proportional
    ~24us (the stream itself runs near peak). Batching the ~15 small
    per-slot ops into G-wide tensors removes the ~56us/layer fixed issue
    cost; Mosaic lowers the batched dot_general natively.
    ``lensv_ref`` re-feeds lens as a VMEM [G, 1] vector (SMEM scalar
    prefetch cannot vector-load).

    ``stream=True`` (experiment knob; REQUIRED for paged): kc/vc ride as
    full HBM refs and the kernel runs its own double-buffered group-fetch
    pipeline with STATIC parity branches (a dynamically-indexed buffer
    read would materialize a whole-block VMEM copy before the dots).
    Measured NEUTRAL vs the Mosaic block pipeline on flat caches (97.5
    vs 99.2 us/layer on the 12-cache chain): a no-fetch ablation puts
    COMPUTE alone at 74us/layer — the kernel is compute-bound (batched
    M=Hp dots ~48us/layer MXU at the inherent skinny-M shape plus
    s8->bf16 block converts ~39us VPU, partially overlapped), so fetch
    overlap is not the lever. For paged pools the manual per-slot DMAs
    are the only way to gather through the block table.
    """
    b = pl.program_id(0)
    b0 = b * G
    Hkv = kn_ref.shape[1]
    D = kn_ref.shape[3]
    HkvD = Hkv * D
    H = Hkv * group
    cat_q = group == 1

    subq = jax.lax.broadcasted_iota(jnp.int32, (Hp, HkvD), 0)
    laneq = jax.lax.broadcasted_iota(jnp.int32, (Hp, HkvD), 1)
    diag = (laneq // D) == (subq // group)
    segq = (
        (jax.lax.broadcasted_iota(jnp.int32, (Hkv, HkvD), 1) // D)
        == jax.lax.broadcasted_iota(jnp.int32, (Hkv, HkvD), 0)
    ).astype(jnp.float32)
    oneh = (
        jax.lax.broadcasted_iota(jnp.int32, (Hp, Hkv), 1)
        == jax.lax.broadcasted_iota(jnp.int32, (Hp, Hkv), 0) // group
    ).astype(jnp.float32)

    def padh(x):                        # [G, Hkv, w] -> [G, Hp, w]
        # GQA: row h of the folded block belongs to kv-head h // group —
        # expand by static sublane repeat, then pad to Hp.
        if group > 1:
            x = jnp.repeat(x, group, axis=1)
        if Hp > x.shape[1]:
            x = jnp.concatenate(
                [x, jnp.zeros((G, Hp - x.shape[1]) + x.shape[2:], x.dtype)],
                axis=1,
            )
        return x

    lens3 = lensv_ref[:][:, :1, :1]                # [G, 1, 1]
    if cat_q:
        q_all = q_ref[:]                           # [G, 1, HkvD]
        qblk = jnp.where(
            diag[None], jnp.broadcast_to(q_all, (G, Hp, HkvD)), 0.0
        )
    else:
        q_sm = q_ref[:]                            # [G, H, D] head-major
        if Hp > H:
            q_sm = jnp.concatenate(
                [q_sm, jnp.zeros((G, Hp - H, D), q_sm.dtype)], axis=1
            )
        qblk = jnp.where(diag[None], jnp.tile(q_sm, (1, 1, Hkv)), 0.0)
    kn_cat = knc_ref[:].astype(jnp.float32)        # [G, 1, HkvD]
    vn_cat = vnc_ref[:].astype(jnp.float32)
    if quant:
        knm = kn_ref[:][:, :, 0, :].astype(jnp.float32)    # [G, Hkv, D]
        vnm = vn_ref[:][:, :, 0, :].astype(jnp.float32)
        ks_new = jnp.maximum(
            jnp.max(jnp.abs(knm), axis=-1, keepdims=True) / 127.0, 1e-8
        )                                          # [G, Hkv, 1]
        vs_new = jnp.maximum(
            jnp.max(jnp.abs(vnm), axis=-1, keepdims=True) / 127.0, 1e-8
        )
        ks_cat = jax.lax.dot_general(
            ks_new, segq, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                          # [G, 1, HkvD]
        vs_cat = jax.lax.dot_general(
            vs_new, segq, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        k_row = jnp.clip(
            jnp.round(kn_cat / ks_cat), -127, 127
        ).astype(kr_ref.dtype)                     # [G, 1, HkvD]
        v_row = jnp.clip(
            jnp.round(vn_cat / vs_cat), -127, 127
        ).astype(vr_ref.dtype)
        if not paged:
            ks_g = ks_ref[:][:, :, 0, :]           # [G, Hkv, cap]
            vs_g = vs_ref[:][:, :, 0, :]
    else:
        k_row = kn_cat.astype(kr_ref.dtype)
        v_row = vn_cat.astype(vr_ref.dtype)
        ks_new = vs_new = ks_g = vs_g = None

    if stream:
        par = jax.lax.rem(b, 2)
        nxt = jax.lax.rem(b + 1, 2)
        nsteps = pl.num_programs(0)

        def in_copies(step, buf):
            if not paged:
                g0 = step * G
                return [
                    pltpu.make_async_copy(
                        kc_ref.at[pl.ds(g0, G)], kbuf_ref.at[buf],
                        isem.at[buf, 0],
                    ),
                    pltpu.make_async_copy(
                        vc_ref.at[pl.ds(g0, G)], vbuf_ref.at[buf],
                        isem.at[buf, 1],
                    ),
                ]
            # paged: gather each slot's single pool block (+ scale rows)
            # through the block table — per-slot descriptors, one
            # semaphore per stream so the waits drain in issue order
            cps = []
            for g in range(G):
                blk = bt_ref[step * G + g]
                cps.append(pltpu.make_async_copy(
                    kc_ref.at[blk], kbuf_ref.at[buf, g], isem.at[buf, 0]))
                cps.append(pltpu.make_async_copy(
                    vc_ref.at[blk], vbuf_ref.at[buf, g], isem.at[buf, 1]))
                if quant:
                    cps.append(pltpu.make_async_copy(
                        ks_ref.at[blk], ksbuf_ref.at[buf, g],
                        isem.at[buf, 2]))
                    cps.append(pltpu.make_async_copy(
                        vs_ref.at[blk], vsbuf_ref.at[buf, g],
                        isem.at[buf, 3]))
            return cps

        @pl.when(b == 0)
        def _prologue():
            for cp in in_copies(0, 0):
                cp.start()

        @pl.when(b + 1 < nsteps)
        def _prefetch_next():
            for cp in in_copies(b + 1, nxt):
                cp.start()

        for cp in in_copies(b, par):
            cp.wait()
    else:
        par = None

    # Hand the batched rows/scales to the staging loop through VMEM
    # scratch (Mosaic has no dynamic_slice on VALUES, only on refs).
    krow_ref[:] = k_row
    vrow_ref[:] = v_row
    if quant:
        ksn_ref[:] = ks_new
        vsn_ref[:] = vs_new

    def slot_copies(gi):
        wpos = jnp.minimum(lens_ref[b0 + gi], cap - 1)
        woff = pl.multiple_of((wpos // 32) * 32, 32)
        # paged: write-backs land in the slot's pool block via the table
        bb = bt_ref[b0 + gi] if paged else b0 + gi
        cps = [
            pltpu.make_async_copy(
                kr_ref.at[gi], kcw_ref.at[bb, pl.ds(woff, 32), :],
                sems.at[gi, 0],
            ),
            pltpu.make_async_copy(
                vr_ref.at[gi], vcw_ref.at[bb, pl.ds(woff, 32), :],
                sems.at[gi, 1],
            ),
        ]
        if quant:
            loff = pl.multiple_of((wpos // 128) * 128, 128)
            cps += [
                pltpu.make_async_copy(
                    ksr_ref.at[gi], ksw_ref.at[bb, :, :, pl.ds(loff, 128)],
                    sems.at[gi, 2],
                ),
                pltpu.make_async_copy(
                    vsr_ref.at[gi], vsw_ref.at[bb, :, :, pl.ds(loff, 128)],
                    sems.at[gi, 3],
                ),
            ]
        return cps

    def run_compute(kc, vc, ks_g, vs_g, bufidx):
        """The kc/vc-dependent phase: dots, softmax, out write, window
        staging + write-back starts. ``bufidx`` is a STATIC buffer index
        (stream parity branch) or None (Mosaic-pipelined inputs) — a
        dynamically-indexed buffer read would materialize a whole-block
        VMEM copy before the dots (the measured cost that made the
        dynamic-parity stream variant neutral)."""
        s = jax.lax.dot_general(
            qblk.astype(jnp.bfloat16), kc.astype(jnp.bfloat16),
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale                                  # [G, Hp, cap]
        if quant:
            s = s * padh(ks_g)
        sub_b = jax.lax.broadcasted_iota(jnp.int32, (G, Hp, cap), 1)
        lane_b = jax.lax.broadcasted_iota(jnp.int32, (G, Hp, cap), 2)
        valid = (sub_b < H) & (lane_b < lens3)
        if window:
            # sliding window (S==1): the query sits at position lens and
            # attends keys in (lens - window, lens]
            valid &= lane_b > lens3 - window
        s = jnp.where(valid, s, NEG_INF)
        # new-token column: elementwise outer-reduce (a K=1 batched dot
        # is Mosaic-hostile), same quantized-k semantics as cached cols
        sn = jnp.sum(
            qblk * k_row.astype(jnp.float32), axis=2, keepdims=True
        ) * scale                                  # [G, Hp, 1]
        if quant:
            sn = sn * padh(ks_new)
        sn = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (G, Hp, 1), 1) < H,
            sn, NEG_INF,
        )
        s_all = jnp.concatenate([s, sn], axis=2)   # [G, Hp, cap+1]
        m = jnp.max(s_all, axis=2, keepdims=True)
        p = jnp.exp(s_all - m)
        p = jnp.where(
            jnp.broadcast_to(m, s_all.shape) <= NEG_INF / 2, 0.0, p
        )
        l = jnp.sum(p, axis=2, keepdims=True)
        p_r, p_n = p[:, :, :cap], p[:, :, cap:]
        if quant:
            p_r = p_r * padh(vs_g)
            p_n = p_n * padh(vs_new)
        acc = jax.lax.dot_general(
            p_r.astype(jnp.bfloat16), vc.astype(jnp.bfloat16),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                          # [G, Hp, HkvD]
        acc = acc + p_n * v_row.astype(jnp.float32)
        l = jnp.where(l == 0.0, 1.0, l)
        x = acc / l
        if cat_q:
            out_ref[:] = jnp.sum(
                jnp.where(diag[None], x, 0.0), axis=1, keepdims=True
            ).astype(out_ref.dtype)
        else:
            # masked extract: head h's output is in lane block h // group
            o = jnp.zeros((G, Hp, D), jnp.float32)
            for kvh in range(Hkv):
                o = o + (x[:, :, kvh * D:(kvh + 1) * D]
                         * oneh[:, kvh:kvh + 1][None])
            out_ref[:] = o[:, :H, :].astype(out_ref.dtype)

        def stage_body(gi, carry):
            lens_b = lens_ref[b0 + gi]
            wpos = jnp.minimum(lens_b, cap - 1)
            woff = pl.multiple_of((wpos // 32) * 32, 32)
            rsel = (
                jax.lax.broadcasted_iota(jnp.int32, (32, HkvD), 0)
                == wpos % 32
            )
            k_row_g = krow_ref[pl.ds(gi, 1), :, :][0]
            v_row_g = vrow_ref[pl.ds(gi, 1), :, :][0]
            if bufidx is not None:
                kwin = kbuf_ref[
                    bufidx, pl.ds(gi, 1), pl.ds(woff, 32), :][0]
                vwin = vbuf_ref[
                    bufidx, pl.ds(gi, 1), pl.ds(woff, 32), :][0]
            else:
                kwin = kc_ref[pl.ds(gi, 1), pl.ds(woff, 32), :][0]
                vwin = vc_ref[pl.ds(gi, 1), pl.ds(woff, 32), :][0]
            kr_ref[pl.ds(gi, 1), :, :] = jnp.where(
                rsel, jnp.broadcast_to(k_row_g, (32, HkvD)), kwin,
            )[None]
            vr_ref[pl.ds(gi, 1), :, :] = jnp.where(
                rsel, jnp.broadcast_to(v_row_g, (32, HkvD)), vwin,
            )[None]
            if quant:
                loff = pl.multiple_of((wpos // 128) * 128, 128)
                lsel = (
                    jax.lax.broadcasted_iota(jnp.int32, (Hkv, 1, 128), 2)
                    == wpos % 128
                )
                ks_new_g = ksn_ref[pl.ds(gi, 1), :, :][0]
                vs_new_g = vsn_ref[pl.ds(gi, 1), :, :][0]
                if paged:
                    kswin = ksbuf_ref[bufidx, pl.ds(gi, 1), :, :,
                                      pl.ds(loff, 128)][0]
                    vswin = vsbuf_ref[bufidx, pl.ds(gi, 1), :, :,
                                      pl.ds(loff, 128)][0]
                else:
                    kswin = ks_ref[pl.ds(gi, 1), :, :, pl.ds(loff, 128)][0]
                    vswin = vs_ref[pl.ds(gi, 1), :, :, pl.ds(loff, 128)][0]
                ksr_ref[pl.ds(gi, 1), :, :, :] = jnp.where(
                    lsel, ks_new_g[:, :, None], kswin,
                )[None]
                vsr_ref[pl.ds(gi, 1), :, :, :] = jnp.where(
                    lsel, vs_new_g[:, :, None], vswin,
                )[None]
            for cp in slot_copies(gi):
                cp.start()
            return carry

        jax.lax.fori_loop(0, G, stage_body, 0)

    if stream:
        # STATIC parity branches: each reads its buffer in place
        for i in (0, 1):
            @pl.when(par == i)
            def _branch(i=i):
                if paged and quant:
                    run_compute(
                        kbuf_ref[i], vbuf_ref[i],
                        ksbuf_ref[i][:, :, 0, :],
                        vsbuf_ref[i][:, :, 0, :], i,
                    )
                else:
                    run_compute(kbuf_ref[i], vbuf_ref[i], ks_g, vs_g, i)
    else:
        run_compute(kc_ref[:], vc_ref[:], ks_g, vs_g, None)

    def wait_body(gi, carry):
        for cp in slot_copies(gi):
            cp.wait()
        return carry

    jax.lax.fori_loop(0, G, wait_body, 0)


def _append_cat_fold_vec_entry(*refs, quant: bool, stream: bool = False,
                               paged: bool = False, **kw):
    if paged:
        bt = refs[1]
        refs = refs[:1] + refs[2:]
    else:
        bt = None
    if quant:
        (lens, q, kc, vc, ks, vs, kn, vn, knc, vnc, lensv,
         out, kcw, vcw, ksw, vsw, kr, vr, ksr, vsr,
         krow, vrow, ksn, vsn, *rest) = refs
    else:
        (lens, q, kc, vc, kn, vn, knc, vnc, lensv,
         out, kcw, vcw, kr, vr, krow, vrow, *rest) = refs
        ks = vs = ksw = vsw = ksr = vsr = ksn = vsn = None
    ksbuf = vsbuf = None
    if stream:
        if paged and quant:
            kbuf, vbuf, ksbuf, vsbuf, isem, sems = rest
        else:
            kbuf, vbuf, isem, sems = rest
    else:
        kbuf = vbuf = isem = None
        (sems,) = rest
    return _append_cat_fold_vec_kernel(
        lens, q, kc, vc, ks, vs, kn, vn, knc, vnc, lensv, out, kcw, vcw,
        ksw, vsw, kr, vr, ksr, vsr, krow, vrow, ksn, vsn,
        kbuf, vbuf, isem, sems, bt_ref=bt, ksbuf_ref=ksbuf,
        vsbuf_ref=vsbuf, quant=quant, stream=stream, paged=paged, **kw
    )


def decode_mha_append_cat(q, kc, vc, lens, k_scale=None, v_scale=None, *,
                          k_new, v_new, scale=None, block_k: int = 256,
                          window: int = 0, interpret: bool = False,
                          row_dma: Optional[bool] = None, block_table=None):
    """Decode attention + append on cat-layout caches (S == 1 only).

    q [B,H,1,D]; kc/vc [B,cap,Hkv*D] caches holding rows < lens[b];
    k_new/v_new [B,Hkv,1,D] f32 rows for position lens[b]. Quantized
    caches (k_scale/v_scale lane-major per head) quantize the row
    in-kernel. Pass scales in the engine's canonical [B,Hkv,cap,1] (this
    kernel canonicalizes by flat reshape, so the trailing-1 and 1-cap
    forms coincide — but the jnp fallback writes by AXIS and requires
    the canonical shape, so callers must not rely on the looser form).
    Returns (out, new_kc, new_vc[, new_ks, new_vs]) with out
    in CAT layout [B, S, H*D] (== merged heads); cache outputs alias
    their inputs.

    block_table (round 5, paged unification): kc/vc are shared block
    POOLS [NB, BS, Hkv*D] (scales [NB, Hkv, 1, BS]) and block_table
    [B, max_blocks] maps slot-virtual block j to pool block bt[b, j].
    The SAME kernel body runs — only the BlockSpec index maps change (the
    block table rides scalar prefetch), so paged serving keeps the
    round-4 in-kernel append instead of the round-3 scatter+gather path.
    """
    B, H, S, D = q.shape
    Hkv = k_new.shape[1]
    HkvD = Hkv * D
    paged = block_table is not None
    if paged:
        BS = kc.shape[1]
        MB = block_table.shape[1]
        cap = MB * BS                  # slot-virtual capacity
        block_k = BS                   # one pool block per grid step
    else:
        cap = kc.shape[1]
    assert S == 1, "decode_mha_append_cat is a single-token decode kernel"
    assert kc.shape[2] == HkvD
    group = H // Hkv
    if scale is None:
        scale = 1.0 / float(np.sqrt(D))
    if row_dma is None:
        # The manual row-DMA write-back WITHOUT slot folding loses to the
        # aliased-block path isolated (92.7 vs 75.5us on-chip) — it only
        # pays combined with the G-slot fold below, which enables it when
        # eligible. RTEN_APPEND_ROW_DMA=1 forces it alone (experiments).
        row_dma = (
            os.environ.get("RTEN_APPEND_ROW_DMA", "0") == "1" and not paged
        )
    quant = k_scale is not None
    bk = min(block_k, round_up(cap, 128))
    assert cap % bk == 0, f"cap {cap} must be a multiple of block_k {bk}"
    bw = min(32, bk)
    nkb = cap // bk
    Hp = round_up(H, 8)
    bq = 8
    cat_q = group == 1  # MHA: q/out ride as single cat rows

    if cat_q:
        qp = heads_to_cat(q)  # [B, 1, HkvD] — cancels the upstream split
    else:
        qp = pad_dim(q, 2, bq)
    lens = jnp.asarray(lens, jnp.int32)
    knf = jnp.asarray(k_new, jnp.float32)
    vnf = jnp.asarray(v_new, jnp.float32)
    knc = jnp.transpose(knf, (0, 2, 1, 3)).reshape(B, 1, HkvD)
    vnc = jnp.transpose(vnf, (0, 2, 1, 3)).reshape(B, 1, HkvD)

    # G-slot folded path — DEFAULT for the headline decode configuration
    # (round-5 bench A/B: 32,520 vs 28,363 tok/s, device step 1.588 ->
    # 1.326ms): one grid step covers G slots via a fori_loop body, which
    # amortizes the per-step DMA issue the per-slot grid pays 14x per
    # slot; write-back is tile-aligned row DMAs. Requires MHA cat_q, one
    # resident block (cap <= block_k) and G | B. RTEN_APPEND_FOLD=G
    # overrides; 0/1 disables.
    fold_env = os.environ.get("RTEN_APPEND_FOLD")
    # Vectorized fold (MHA only): batched-over-G compute, loop only
    # for write staging — the loop body's per-slot issue cost is the
    # measured bound (see _append_cat_fold_vec_kernel docstring).
    fold_vec = os.environ.get("RTEN_FOLD_VEC", "1") != "0"
    # Paged fold (round 5): with ONE pool block per slot (BS == cap) the
    # vec fold runs on block pools — the stream machinery gathers each
    # slot's block/scales through the block table with per-slot DMAs and
    # the write-backs land through the same indirection.
    fold_paged = (
        paged and fold_vec and block_table.shape[1] == 1 and window == 0
        and os.environ.get("RTEN_FOLD_PAGED", "1") != "0"
    )
    fold_window_ok = window == 0 or (fold_vec and not paged)
    if fold_env is not None:
        G = int(fold_env)
        if G > 1 and B % G != 0:
            G = 1
    else:
        # G=12 first: the vec fold chain-microbenches best at G=8 (94.5 vs
        # 99.2 us/layer) but the ENGINE wave measures G=12 ahead (34.0k vs
        # 30.7-32.3k tok/s) — admission/prefill interleaving changes the
        # trade; trust the end-to-end number.
        G = next(
            (g for g in (12, 8, 6, 4, 3, 2) if B % g == 0), 1
        ) if (nkb == 1 and (not paged or fold_paged)
              and fold_window_ok) else 1
    if (nkb == 1 and G > 1 and B % G == 0 and fold_window_ok
            and (not paged or fold_paged)):
        # Manual double-buffered input streaming: measured NEUTRAL-to-worse
        # vs the Mosaic block pipeline at G=8/12 (97.8-99.8 vs 94.5 us/layer
        # on the 12-cache chain — the dynamic-parity buffer read costs a
        # VMEM copy), kept as an experiment knob. The paged fold REQUIRES
        # it (BlockSpec cannot gather through a table).
        fold_stream = paged or (
            fold_vec and os.environ.get("RTEN_FOLD_STREAM", "0") == "1"
        )
        if fold_vec:
            kernel = functools.partial(
                _append_cat_fold_vec_entry,
                scale=float(scale), cap=cap, quant=quant, G=G, Hp=Hp,
                group=group, window=window, stream=fold_stream,
                paged=paged,
            )
        else:
            kernel = functools.partial(
                _append_cat_fold_entry,
                scale=float(scale), cap=cap, quant=quant, G=G, Hp=Hp,
                group=group,
            )
        f3 = lambda b, *refs: (b, 0, 0)
        f4 = lambda b, *refs: (b, 0, 0, 0)
        # MHA: q/out ride cat rows [B, 1, Hkv*D]; GQA: head-major
        # squeezed [B, H, D] with the masked extract in-kernel.
        q_fold = qp if cat_q else q[:, :, 0, :]
        kv_spec = (
            pl.BlockSpec(memory_space=pltpu.ANY) if fold_stream
            else pl.BlockSpec((G, cap, HkvD), f3)
        )
        in_specs = [
            pl.BlockSpec((G, 1, HkvD), f3) if cat_q
            else pl.BlockSpec((G, H, D), f3),
            kv_spec,
            kv_spec,
        ]
        operands = [q_fold, kc, vc]
        if quant:
            if paged:
                ksp, vsp = k_scale, v_scale    # [NB, Hkv, 1, BS] pools
                in_specs += [
                    pl.BlockSpec(memory_space=pltpu.ANY),
                    pl.BlockSpec(memory_space=pltpu.ANY),
                ]
            else:
                ksp = k_scale.reshape(B, Hkv, 1, cap)
                vsp = v_scale.reshape(B, Hkv, 1, cap)
                in_specs += [
                    pl.BlockSpec((G, Hkv, 1, cap), f4),
                    pl.BlockSpec((G, Hkv, 1, cap), f4),
                ]
            operands += [ksp, vsp]
        in_specs += [
            pl.BlockSpec((G, Hkv, 1, D), f4),
            pl.BlockSpec((G, Hkv, 1, D), f4),
            pl.BlockSpec((G, 1, HkvD), f3),
            pl.BlockSpec((G, 1, HkvD), f3),
        ]
        operands += [knf, vnf, knc, vnc]
        if fold_vec:
            # lens again as a VMEM vector (SMEM prefetch can't vector-load;
            # lane-padded to 128 to satisfy TPU block tiling)
            in_specs += [pl.BlockSpec((G, 1, 128), f3)]
            operands += [
                jnp.broadcast_to(lens.reshape(B, 1, 1), (B, 1, 128))
            ]
        out_specs = [
            pl.BlockSpec((G, 1, HkvD), f3) if cat_q
            else pl.BlockSpec((G, H, D), f3),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ]
        out_shapes = [
            jax.ShapeDtypeStruct(
                (B, 1, HkvD) if cat_q else (B, H, D), q.dtype
            ),
            jax.ShapeDtypeStruct(kc.shape, kc.dtype),
            jax.ShapeDtypeStruct(vc.shape, vc.dtype),
        ]
        npf = 2 if paged else 1        # scalar-prefetch operand count
        aliases = {npf + 1: 1, npf + 2: 2}
        scratch = [
            pltpu.VMEM((G, 32, HkvD), kc.dtype),
            pltpu.VMEM((G, 32, HkvD), vc.dtype),
        ]
        if quant:
            out_specs += [
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec(memory_space=pltpu.HBM),
            ]
            out_shapes += [
                jax.ShapeDtypeStruct(ksp.shape, ksp.dtype),
                jax.ShapeDtypeStruct(vsp.shape, vsp.dtype),
            ]
            aliases[npf + 3] = 3
            aliases[npf + 4] = 4
            scratch += [
                pltpu.VMEM((G, Hkv, 1, 128), jnp.float32),
                pltpu.VMEM((G, Hkv, 1, 128), jnp.float32),
            ]
        if fold_vec:
            # batched-phase -> staging-loop handoff buffers
            scratch += [
                pltpu.VMEM((G, 1, HkvD), kc.dtype),
                pltpu.VMEM((G, 1, HkvD), vc.dtype),
            ]
            if quant:
                scratch += [
                    pltpu.VMEM((G, Hkv, 1), jnp.float32),
                    pltpu.VMEM((G, Hkv, 1), jnp.float32),
                ]
            if fold_stream:
                scratch += [
                    pltpu.VMEM((2, G, cap, HkvD), kc.dtype),
                    pltpu.VMEM((2, G, cap, HkvD), vc.dtype),
                ]
                if paged and quant:
                    scratch += [
                        pltpu.VMEM((2, G, Hkv, 1, cap), jnp.float32),
                        pltpu.VMEM((2, G, Hkv, 1, cap), jnp.float32),
                    ]
                scratch.append(pltpu.SemaphoreType.DMA((2, 4)))
        scratch.append(pltpu.SemaphoreType.DMA((G, 4 if quant else 2)))
        prefetch = (lens,) if not paged else (
            lens, jnp.asarray(block_table[:, 0], jnp.int32)
        )
        res = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=npf,
                grid=(B // G,),
                in_specs=in_specs,
                out_specs=out_specs,
                scratch_shapes=scratch,
            ),
            out_shape=out_shapes,
            input_output_aliases=aliases,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
            cost_estimate=pl.CostEstimate(
                flops=4 * B * H * cap * D,
                bytes_accessed=(
                    2 * B * HkvD * 4
                    + 2 * B * cap * HkvD * (1 if quant else kc.dtype.itemsize)
                    + 2 * B * 32 * HkvD * kc.dtype.itemsize
                ),
                transcendentals=B * H * cap,
            ),
            interpret=interpret,
        )(*prefetch, *operands)
        out = res[0] if cat_q else heads_to_cat(res[0][:, :, None, :])
        if quant:
            sshape = k_scale.shape
            return (out, res[1], res[2],
                    res[3].reshape(sshape), res[4].reshape(sshape))
        return out, res[1], res[2]

    if paged:
        # Pool-block indirection: slot-virtual block j lives at pool block
        # bt[b, j]. Same clamps as the flat maps (never fetch past the
        # tail block — repeated indices skip the DMA), then a table read.
        def _pblk(b, j, lens, bt):
            wb = jnp.minimum(lens[b], cap - 1) // bk
            return bt[b, jnp.minimum(j, wb)]

        def _ptail(b, lens, bt):
            return bt[b, jnp.minimum(lens[b], cap - 1) // bk]

        kv_index = lambda b, j, lens, bt: (_pblk(b, j, lens, bt), 0, 0)
        sc_index = lambda b, j, lens, bt: (_pblk(b, j, lens, bt), 0, 0, 0)
        w_index = lambda b, j, lens, bt: (
            _ptail(b, lens, bt),
            (jnp.minimum(lens[b], cap - 1) % bk) // bw, 0,
        )
        sw_index = lambda b, j, lens, bt: (_ptail(b, lens, bt), 0, 0, 0)
        fixed4 = lambda b, j, lens, bt: (b, 0, 0, 0)
        fixed3 = lambda b, j, lens, bt: (b, 0, 0)
    else:
        kv_index = lambda b, j, lens: (
            b, jnp.minimum(j, jnp.minimum(lens[b], cap - 1) // bk), 0
        )
        sc_index = lambda b, j, lens: (
            b, 0, 0, jnp.minimum(j, jnp.minimum(lens[b], cap - 1) // bk)
        )
        w_index = lambda b, j, lens: (
            b, jnp.minimum(lens[b], cap - 1) // bw, 0
        )
        sw_index = lambda b, j, lens: (
            b, 0, 0, jnp.minimum(lens[b], cap - 1) // bk
        )
        fixed4 = lambda b, j, lens: (b, 0, 0, 0)
        fixed3 = lambda b, j, lens: (b, 0, 0)

    kernel = functools.partial(
        _append_cat_entry,
        scale=float(scale), cap=cap, block_k=bk, block_w=bw, quant=quant,
        group=group, window=int(window), single_block=(nkb == 1),
        cat_q=cat_q, row_dma=row_dma, paged=paged,
    )
    in_specs = [
        pl.BlockSpec((1, 1, HkvD), fixed3) if cat_q
        else pl.BlockSpec((1, H, bq, D), fixed4),
        pl.BlockSpec((1, bk, HkvD), kv_index),
        pl.BlockSpec((1, bk, HkvD), kv_index),
    ]
    operands = [qp, kc, vc]
    if quant:
        if paged:
            ksp, vsp = k_scale, v_scale    # already [NB, Hkv, 1, BS]
        else:
            ksp = k_scale.reshape(B, Hkv, 1, cap)
            vsp = v_scale.reshape(B, Hkv, 1, cap)
        in_specs += [
            pl.BlockSpec((1, Hkv, 1, bk), sc_index),
            pl.BlockSpec((1, Hkv, 1, bk), sc_index),
        ]
        operands += [ksp, vsp]
    in_specs += [
        pl.BlockSpec((1, Hkv, 1, D), fixed4),
        pl.BlockSpec((1, Hkv, 1, D), fixed4),
        pl.BlockSpec((1, 1, HkvD), fixed3),
        pl.BlockSpec((1, 1, HkvD), fixed3),
    ]
    operands += [knf, vnf, knc, vnc]

    cache_out_spec = (
        # HBM (not ANY): the row-DMA target must stay off-chip and
        # untiled — ANY let Mosaic pick VMEM, which both overflows (the
        # full cache is ~19MB at the headline shape) and imposes (8,128)
        # tile alignment on the 1-row copy.
        pl.BlockSpec(memory_space=pltpu.HBM) if row_dma
        else pl.BlockSpec((1, bw, HkvD), w_index)
    )
    out_specs = [
        pl.BlockSpec((1, 1, HkvD), fixed3) if cat_q
        else pl.BlockSpec((1, H, bq, D), fixed4),
        cache_out_spec,
        cache_out_spec,
    ]
    out_shapes = [
        jax.ShapeDtypeStruct(
            (B, 1, HkvD) if cat_q else (B, H, bq, D), q.dtype
        ),
        jax.ShapeDtypeStruct(kc.shape, kc.dtype),
        jax.ShapeDtypeStruct(vc.shape, vc.dtype),
    ]
    # Operand indices include the scalar-prefetch args (lens [+ bt]).
    nsp = 2 if paged else 1
    aliases = {nsp + 1: 1, nsp + 2: 2}
    if quant:
        scale_out_spec = (
            pl.BlockSpec(memory_space=pltpu.HBM) if row_dma
            else pl.BlockSpec((1, Hkv, 1, bk), sw_index)
        )
        out_specs += [scale_out_spec, scale_out_spec]
        out_shapes += [
            jax.ShapeDtypeStruct(ksp.shape, ksp.dtype),
            jax.ShapeDtypeStruct(vsp.shape, vsp.dtype),
        ]
        aliases = {nsp + 1: 1, nsp + 2: 2, nsp + 3: 3, nsp + 4: 4}

    scratch_shapes = [
        pltpu.VMEM((Hp, 1), jnp.float32),
        pltpu.VMEM((Hp, 1), jnp.float32),
        pltpu.VMEM((Hp, HkvD), jnp.float32),
    ]
    if row_dma:
        scratch_shapes += [
            pltpu.VMEM((32, HkvD), kc.dtype),  # staged aligned write window
            pltpu.VMEM((32, HkvD), vc.dtype),
        ]
        if quant:
            scratch_shapes += [
                pltpu.VMEM((Hkv, 1, 128), jnp.float32),
                pltpu.VMEM((Hkv, 1, 128), jnp.float32),
            ]
        scratch_shapes.append(pltpu.SemaphoreType.DMA((4 if quant else 2,)))

    scalar_ops = (lens,) if not paged else (
        lens, jnp.asarray(block_table, jnp.int32)
    )
    res = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=nsp,
            grid=(B, nkb),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch_shapes,
        ),
        out_shape=out_shapes,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * cap * D,
            bytes_accessed=(
                (2 * B * HkvD * 4 if cat_q else B * H * bq * D * 8)
                + 2 * B * cap * HkvD * (1 if quant else kc.dtype.itemsize)
                + 2 * B * bw * HkvD * kc.dtype.itemsize
            ),
            transcendentals=B * H * cap,
        ),
        interpret=interpret,
    )(*scalar_ops, *operands)
    if cat_q:
        out = res[0]                                   # [B, 1, HkvD]
    else:
        out = heads_to_cat(res[0][:, :, :S, :D])       # -> [B, S, H*D]
    if quant:
        sshape = k_scale.shape
        return (out, res[1], res[2],
                res[3].reshape(sshape), res[4].reshape(sshape))
    return out, res[1], res[2]


def cat_to_heads(c, Hkv):
    """[B, cap, Hkv*D] cat cache -> [B, Hkv, cap, D] head-major view."""
    B, cap, HkvD = c.shape
    return jnp.transpose(
        c.reshape(B, cap, Hkv, HkvD // Hkv), (0, 2, 1, 3)
    )


def heads_to_cat(x):
    """[B, Hkv, S, D] head-major rows -> [B, S, Hkv*D] cat rows."""
    B, Hkv, S, D = x.shape
    return jnp.transpose(x, (0, 2, 1, 3)).reshape(B, S, Hkv * D)


def _append_cat_paged_fallback(q, pool_kc, pool_vc, lens, k_scale_pool,
                               v_scale_pool, *, k_new, v_new, scale,
                               window, use_flash, block_table):
    """CPU/golden path for the paged cat append step: quantize the new row
    (same math as the kernel), scatter it into the pools through the block
    table, then attend over per-slot gathered contiguous views."""
    B, Hkv = k_new.shape[0], k_new.shape[1]
    NB, BS, HkvD = pool_kc.shape
    bt = jnp.asarray(block_table, jnp.int32)
    MB = bt.shape[1]
    cap = MB * BS
    lens = jnp.asarray(lens, jnp.int32).reshape(B)
    quant = k_scale_pool is not None
    wpos = jnp.minimum(lens, cap - 1)
    # Physical target: pool block bt[b, wpos//BS], row wpos%BS. Unallocated
    # table entries are 0 == the engine's reserved garbage block.
    blk = jnp.take_along_axis(bt, (wpos // BS)[:, None], axis=1)[:, 0]
    off = wpos % BS

    knm = jnp.asarray(k_new, jnp.float32)
    vnm = jnp.asarray(v_new, jnp.float32)
    if quant:
        ks_new = jnp.maximum(
            jnp.max(jnp.abs(knm), axis=-1, keepdims=True) / 127.0, 1e-8
        )
        vs_new = jnp.maximum(
            jnp.max(jnp.abs(vnm), axis=-1, keepdims=True) / 127.0, 1e-8
        )
        k_rows = heads_to_cat(
            jnp.clip(jnp.round(knm / ks_new), -127, 127).astype(jnp.int8)
        )                                              # [B, 1, HkvD]
        v_rows = heads_to_cat(
            jnp.clip(jnp.round(vnm / vs_new), -127, 127).astype(jnp.int8)
        )
    else:
        k_rows = heads_to_cat(knm).astype(pool_kc.dtype)
        v_rows = heads_to_cat(vnm).astype(pool_vc.dtype)
    for i in range(B):
        pool_kc = jax.lax.dynamic_update_slice(
            pool_kc, k_rows[i][None], (blk[i], off[i], 0)
        )
        pool_vc = jax.lax.dynamic_update_slice(
            pool_vc, v_rows[i][None], (blk[i], off[i], 0)
        )
        if quant:
            k_scale_pool = jax.lax.dynamic_update_slice(
                k_scale_pool,
                ks_new[i].reshape(1, Hkv, 1, 1).astype(k_scale_pool.dtype),
                (blk[i], 0, 0, off[i]),
            )
            v_scale_pool = jax.lax.dynamic_update_slice(
                v_scale_pool,
                vs_new[i].reshape(1, Hkv, 1, 1).astype(v_scale_pool.dtype),
                (blk[i], 0, 0, off[i]),
            )

    # Gather contiguous per-slot views and attend head-major.
    kc_flat = pool_kc[bt].reshape(B, cap, HkvD)
    vc_flat = pool_vc[bt].reshape(B, cap, HkvD)
    f = decode_attention if use_flash else decode_mha_xla
    if quant:
        ks_flat = jnp.transpose(
            k_scale_pool[bt][:, :, :, 0, :], (0, 2, 1, 3)
        ).reshape(B, Hkv, cap)
        vs_flat = jnp.transpose(
            v_scale_pool[bt][:, :, :, 0, :], (0, 2, 1, 3)
        ).reshape(B, Hkv, cap)
        out = f(q, cat_to_heads(kc_flat, Hkv), cat_to_heads(vc_flat, Hkv),
                lens, ks_flat, vs_flat, scale=scale, window=window)
        return (heads_to_cat(out), pool_kc, pool_vc,
                k_scale_pool, v_scale_pool)
    out = f(q, cat_to_heads(kc_flat, Hkv).astype(jnp.float32),
            cat_to_heads(vc_flat, Hkv).astype(jnp.float32), lens,
            scale=scale, window=window)
    return heads_to_cat(out), pool_kc, pool_vc


def decode_attention_append_cat(q, kc, vc, lens, k_scale=None,
                                v_scale=None, *, k_new, v_new, scale=None,
                                window: int = 0, use_flash=True,
                                interpret=False, block_table=None):
    """Route the cat-layout append decode step: the Pallas kernel on TPU,
    an equivalent row-write + head-major attention elsewhere. The
    attention output is returned in CAT layout [B, S, H*D] (== merged
    heads), matching what the proj matmul consumes.

    With ``block_table``, kc/vc are paged block pools [NB, BS, Hkv*D]
    (scales [NB, Hkv, 1, BS]) — the Pallas kernel reads/writes through the
    table; the fallback scatters the row into the pool and attends over a
    gathered contiguous view."""
    B, Hkv = k_new.shape[0], k_new.shape[1]
    quant = k_scale is not None
    eligible = (
        use_flash
        and (on_tpu() or interpret)
        and q.shape[2] == 1
        and q.shape[3] in (64, 128, 256, 512)
        and kc.dtype != jnp.uint8
    )
    if eligible:
        return decode_mha_append_cat(
            q, kc, vc, lens, k_scale, v_scale, k_new=k_new, v_new=v_new,
            scale=scale, window=window, interpret=interpret,
            block_table=block_table,
        )
    if block_table is not None:
        return _append_cat_paged_fallback(
            q, kc, vc, lens, k_scale, v_scale, k_new=k_new, v_new=v_new,
            scale=scale, window=window, use_flash=use_flash,
            block_table=block_table,
        )
    cap = kc.shape[1]
    # Fallback: quantize + cat row-write + head-major attention.
    lens = jnp.asarray(lens, jnp.int32).reshape(B)

    def row_write3(buf, new, starts):
        for i in range(B):
            buf = jax.lax.dynamic_update_slice(
                buf, new[i: i + 1], (i, starts[i], 0)
            )
        return buf

    def row_write4(buf, new, starts):
        for i in range(B):
            buf = jax.lax.dynamic_update_slice(
                buf, new[i: i + 1], (i, 0, starts[i], 0)
            )
        return buf

    f = decode_attention if use_flash else decode_mha_xla
    if quant:
        knm = jnp.asarray(k_new, jnp.float32)
        vnm = jnp.asarray(v_new, jnp.float32)
        ks_new = jnp.maximum(
            jnp.max(jnp.abs(knm), axis=-1, keepdims=True) / 127.0, 1e-8
        )
        vs_new = jnp.maximum(
            jnp.max(jnp.abs(vnm), axis=-1, keepdims=True) / 127.0, 1e-8
        )
        k_q = jnp.clip(jnp.round(knm / ks_new), -127, 127).astype(jnp.int8)
        v_q = jnp.clip(jnp.round(vnm / vs_new), -127, 127).astype(jnp.int8)
        nkc = row_write3(kc, heads_to_cat(k_q), lens)
        nvc = row_write3(vc, heads_to_cat(v_q), lens)
        nks = row_write4(k_scale, ks_new.astype(k_scale.dtype), lens)
        nvs = row_write4(v_scale, vs_new.astype(v_scale.dtype), lens)
        out = f(q, cat_to_heads(nkc, Hkv), cat_to_heads(nvc, Hkv), lens,
                nks.reshape(B, Hkv, cap), nvs.reshape(B, Hkv, cap),
                scale=scale, window=window)
        return heads_to_cat(out), nkc, nvc, nks, nvs
    nkc = row_write3(kc, heads_to_cat(k_new).astype(kc.dtype), lens)
    nvc = row_write3(vc, heads_to_cat(v_new).astype(vc.dtype), lens)
    out = f(q, cat_to_heads(nkc, Hkv).astype(jnp.float32),
            cat_to_heads(nvc, Hkv).astype(jnp.float32), lens,
            scale=scale, window=window)
    return heads_to_cat(out), nkc, nvc


def _prefill_cat_kernel(lens_ref, q_ref, kc_ref, vc_ref, ks_ref, vs_ref,
                        out_ref, m_ref, l_ref, acc_ref, *, scale: float,
                        cap: int, S: int, block_q: int, block_k: int,
                        quant: bool, group: int, window: int = 0):
    """Prefill attention over cat-layout caches (S > 1, per-slot lens).

    Grid (slot, q-block, key-block); heads run as an UNROLLED in-kernel
    loop of per-head 2D dots on static lane slices of the cat block —
    useful MACs only (a folded block-diagonal variant did Hkv-x redundant
    MXU work and measured slower than the per-head GRID at S=128; the
    per-head grid itself pays B*H*Sq step overheads, ~800us/layer at the
    96x128 admission wave). Dots run at bf16-pass rate with f32
    accumulate (s8 cache values are exact in bf16). Query row r of slot b
    attends cache cols <= lens[b]+sq*bq+r (the row-write precedes
    attention, so the chunk's own rows are in the cache).
    """
    b = pl.program_id(0)
    sq = pl.program_id(1)
    kb = pl.program_id(2)
    D = q_ref.shape[3]
    Hkv = (
        ks_ref.shape[1] if quant else vc_ref.shape[2] // D
    )
    H = q_ref.shape[1]
    bq = block_q
    bk = block_k

    @pl.when(kb == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    lens_b = lens_ref[b]
    row = sq * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
    qpos = lens_b + row
    col = kb * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
    valid = (col <= qpos) & (row < S) & (col < cap)
    if window:
        valid &= col > qpos - window

    single_block = cap == bk  # one key block: no online merge needed

    # Skip key blocks entirely above this q-block's last row.
    @pl.when(kb * bk <= lens_b + (sq + 1) * bq - 1)
    def _():
        kcm = kc_ref[0].astype(jnp.bfloat16)       # [bk, Hkv*D]
        vcm = vc_ref[0].astype(jnp.bfloat16)
        for h in range(H):
            kvh = h // group
            sl = slice(kvh * D, (kvh + 1) * D)
            rs = slice(h * bq, (h + 1) * bq)
            qh = q_ref[0, h].astype(jnp.bfloat16)  # [bq, D]
            s = jax.lax.dot_general(
                qh, kcm[:, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale                              # [bq, bk]
            if quant:
                s = s * ks_ref[0, kvh, 0, :][None, :]
            s = jnp.where(valid, s, NEG_INF)
            if single_block:
                m_new = jnp.max(s, axis=1, keepdims=True)
                p = jnp.exp(s - m_new)
                p = jnp.where(
                    jnp.broadcast_to(m_new, s.shape) <= NEG_INF / 2, 0.0, p
                )
                l_ref[rs] = jnp.sum(p, axis=1, keepdims=True)
                if quant:
                    p = p * vs_ref[0, kvh, 0, :][None, :]
                acc_ref[rs] = jax.lax.dot_general(
                    p.astype(jnp.bfloat16), vcm[:, sl],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                continue
            m_prev = m_ref[rs]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            p = jnp.exp(s - m_new)
            p = jnp.where(
                jnp.broadcast_to(m_new, s.shape) <= NEG_INF / 2, 0.0, p
            )
            alpha = jnp.where(
                m_prev <= NEG_INF / 2, 0.0, jnp.exp(m_prev - m_new)
            )
            l_ref[rs] = l_ref[rs] * alpha + jnp.sum(p, axis=1, keepdims=True)
            if quant:
                p = p * vs_ref[0, kvh, 0, :][None, :]
            acc_ref[rs] = acc_ref[rs] * alpha + jax.lax.dot_general(
                p.astype(jnp.bfloat16), vcm[:, sl],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            m_ref[rs] = m_new

    @pl.when(kb == pl.num_programs(2) - 1)
    def _():
        l = jnp.where(l_ref[:] == 0.0, 1.0, l_ref[:])
        out = (acc_ref[:] / l).reshape(H, bq, D)
        out_ref[0] = out.astype(out_ref.dtype)


def _prefill_cat_entry(*refs, quant: bool, **kw):
    if quant:
        (lens, q, kc, vc, ks, vs, out, m, l, acc) = refs
    else:
        (lens, q, kc, vc, out, m, l, acc) = refs
        ks = vs = None
    return _prefill_cat_kernel(
        lens, q, kc, vc, ks, vs, out, m, l, acc, quant=quant, **kw
    )


def prefill_mha_cat(q, kc, vc, lens, k_scale=None, v_scale=None, *,
                    scale=None, block_q: int = 128, block_k: int = 256,
                    window: int = 0, interpret: bool = False):
    """Prefill attention on cat-layout caches: q [B,H,S,D], kc/vc
    [B,cap,Hkv*D] holding rows < lens[b]+S (the chunk's rows included);
    row r of slot b attends cols <= lens[b]+r. -> [B,H,S,D] f32."""
    B, H, S, D = q.shape
    cap = kc.shape[1]
    quant = k_scale is not None
    Hkv = k_scale.shape[1] if quant else kc.shape[2] // D
    HkvD = Hkv * D
    assert kc.shape[2] == HkvD
    group = H // Hkv
    if scale is None:
        scale = 1.0 / float(np.sqrt(D))
    bq = min(block_q, round_up(S, 8))
    Sp = round_up(S, bq)
    bk = min(block_k, round_up(cap, 128))
    assert cap % bk == 0
    nkb = cap // bk
    nsq = Sp // bq

    qp = pad_dim(q, 2, Sp).astype(jnp.float32)
    lens = jnp.asarray(lens, jnp.int32)

    # Clamp key-block reads to the last block this q-block can attend.
    kv_index = lambda b, s, j, lens: (
        b,
        jnp.minimum(
            j, jnp.minimum(lens[b] + (s + 1) * bq - 1, cap - 1) // bk
        ),
        0,
    )
    sc_index = lambda b, s, j, lens: (
        b, 0, 0,
        jnp.minimum(
            j, jnp.minimum(lens[b] + (s + 1) * bq - 1, cap - 1) // bk
        ),
    )
    q_index = lambda b, s, j, lens: (b, 0, s, 0)

    kernel = functools.partial(
        _prefill_cat_entry,
        scale=float(scale), cap=cap, S=S, block_q=bq, block_k=bk,
        quant=quant, group=group, window=int(window),
    )
    in_specs = [
        pl.BlockSpec((1, H, bq, D), q_index),
        pl.BlockSpec((1, bk, HkvD), kv_index),
        pl.BlockSpec((1, bk, HkvD), kv_index),
    ]
    operands = [qp, kc, vc]
    if quant:
        ksp = k_scale.reshape(B, Hkv, 1, cap)
        vsp = v_scale.reshape(B, Hkv, 1, cap)
        in_specs += [
            pl.BlockSpec((1, Hkv, 1, bk), sc_index),
            pl.BlockSpec((1, Hkv, 1, bk), sc_index),
        ]
        operands += [ksp, vsp]

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, nsq, nkb),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, H, bq, D), q_index),
            scratch_shapes=[
                pltpu.VMEM((H * bq, 1), jnp.float32),
                pltpu.VMEM((H * bq, 1), jnp.float32),
                pltpu.VMEM((H * bq, D), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, Sp, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * Sp * cap * D,
            bytes_accessed=(
                B * H * Sp * D * 8
                + 2 * B * cap * HkvD * kc.dtype.itemsize * nsq
            ),
            transcendentals=B * H * Sp * cap,
        ),
        interpret=interpret,
    )(lens, *operands)
    return out[:, :, :S, :]


# --- paged KV cache (block tables) -------------------------------------------
#
# vLLM-style paged attention, TPU-native: the KV cache is a shared POOL of
# fixed-size blocks [n_blocks, Hkv, block_size, D]; each serving slot owns a
# list of block ids (its block-table row). The decode kernel is the SAME
# NT-folded online-softmax body as decode_mha — only the K/V BlockSpec index
# maps change: grid step (slot, j) DMAs pool block ``bt[slot, j]`` instead of
# cache rows [slot, j*bk:(j+1)*bk]. The block table rides scalar prefetch,
# exactly like ``lens``. No reference analog (rten is single-sequence
# inference; SURVEY §2.6) — this exists for the serving engine's
# heterogeneous-length continuous batching.


def paged_gather_kv(pool, bt):
    """pool [NB, H, BS, D] gathered per slot -> [B, H, MB*BS, D] (the XLA
    fallback's contiguous view; also the prefill formulation)."""
    g = pool[bt]  # [B, MB, H, BS, D]
    B, MB, H, BS, D = g.shape
    return g.transpose(0, 2, 1, 3, 4).reshape(B, H, MB * BS, D)


def _paged_nt_entry(lens_ref, t_ref, bt_ref, q_ref, k_ref, v_ref, ks_ref,
                    vs_ref, rk_ref, rv_ref, kn_ref, vn_ref, out_ref,
                    m_ref, l_ref, acc_ref, sems, **kw):
    """Scalar-prefetch adapter: the paged grid prefetches (lens, t, bt); the
    NT body itself never reads the block table (the index maps do)."""
    return _decode_kernel_folded_nt(
        lens_ref, t_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref, rk_ref,
        rv_ref, kn_ref, vn_ref, out_ref, None, None, m_ref, l_ref,
        acc_ref, sems, **kw
    )


def paged_decode_mha(q, pool_k, pool_v, lens, block_table,
                     pool_ks=None, pool_vs=None, *,
                     scale: Optional[float] = None, window: int = 0,
                     interpret: bool = False):
    """Paged decode attention (S == 1): q [B,H,1,D] against pool K/V
    [NB,Hkv,BS,D] indexed by block_table [B,MB] with per-slot live lengths
    ``lens`` [B] (query of slot b sits at position lens[b], already written
    into its block). Logical position p of slot b lives at
    pool[bt[b, p // BS], :, p % BS, :].

    int8 KV: pool_ks/pool_vs are per-position scale POOLS [NB, Hkv, 1, BS]
    (positions lane-major, the NT body's native scale layout) addressed
    through the same block table."""
    B, H, S, D = q.shape
    assert S == 1, "paged decode kernel is S==1 (prefill gathers)"
    NB, Hkv, BS, _ = pool_k.shape
    assert BS % 8 == 0, f"block_size must be a multiple of 8, got {BS}"
    MB = block_table.shape[1]
    cap = MB * BS
    group = H // Hkv
    quant = pool_ks is not None
    if scale is None:
        scale = 1.0 / float(np.sqrt(D))
    bq = round_up(S, 8)
    Dp = D if D in (64, 128, 256, 512) else round_up(D, 128)
    qp = pad_dim(pad_dim(q, 2, bq), 3, Dp)
    kp = pad_dim(pool_k, 3, Dp)
    vp = pad_dim(pool_v, 3, Dp)
    Hp = round_up(H, 8)

    def kv_index(b, j, lens, t, bt):
        # Clamp to the last live block: dead blocks are never DMA'd, and
        # their table entries may be unallocated (0).
        jc = jnp.minimum(j, lens[b] // BS)
        return (bt[b, jc], 0, 0, 0)

    zero4 = lambda b, j, *_: (0, 0, 0, 0)
    if quant:
        ksp, vsp = pool_ks, pool_vs
        sc_index = kv_index
    else:
        ksp = vsp = jnp.ones((1, Hkv, 1, BS), jnp.float32)
        sc_index = zero4
    rk_dummy = jnp.zeros((1, Hkv, 8, Dp), jnp.float32)
    kn_dummy = jnp.zeros((1, Hkv, 1, Dp), jnp.float32)
    kernel = functools.partial(
        _paged_nt_entry,
        scale=float(scale), S=S, cap=cap, block_k=BS, quant=quant,
        group=group, recent=0, append=False, bits=8, window=int(window),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(B, MB),
            in_specs=[
                pl.BlockSpec((1, H, bq, Dp), lambda b, j, *_: (b, 0, 0, 0)),
                pl.BlockSpec((1, Hkv, BS, Dp), kv_index),
                pl.BlockSpec((1, Hkv, BS, Dp), kv_index),
                pl.BlockSpec((1, Hkv, 1, BS), sc_index),
                pl.BlockSpec((1, Hkv, 1, BS), sc_index),
                pl.BlockSpec((1, Hkv, 8, Dp), zero4),
                pl.BlockSpec((1, Hkv, 8, Dp), zero4),
                pl.BlockSpec((1, Hkv, 1, Dp), zero4),
                pl.BlockSpec((1, Hkv, 1, Dp), zero4),
            ],
            out_specs=[
                pl.BlockSpec((1, H, bq, Dp), lambda b, j, *_: (b, 0, 0, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((Hp, 1), jnp.float32),
                pltpu.VMEM((Hp, 1), jnp.float32),
                pltpu.VMEM((Hp, Dp), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=[jax.ShapeDtypeStruct((B, H, bq, Dp), q.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * bq * cap * Dp,
            bytes_accessed=(
                B * H * bq * Dp * 8
                + 2 * B * Hkv * cap * Dp * pool_k.dtype.itemsize
            ),
            transcendentals=B * H * bq * cap,
        ),
        interpret=interpret,
    )(
        jnp.asarray(lens, jnp.int32),
        jnp.zeros(1, jnp.int32),
        jnp.asarray(block_table, jnp.int32),
        qp, kp, vp, ksp, vsp, rk_dummy, rk_dummy,
        kn_dummy, kn_dummy,
    )[0]
    return out[:, :, :S, :D]


def paged_gather_scales(spool, bt):
    """Scale pool [NB, Hkv, 1, BS] -> contiguous [B, Hkv, MB*BS]."""
    g = spool[bt]  # [B, MB, Hkv, 1, BS]
    B, MB, Hkv, _, BS = g.shape
    return g.transpose(0, 2, 1, 3, 4).reshape(B, Hkv, MB * BS)


def paged_attention(q, pool_k, pool_v, lens, block_table,
                    pool_ks=None, pool_vs=None, *, scale=None,
                    window: int = 0, use_flash: bool = True,
                    interpret: bool = False):
    """Route paged attention: the Pallas block-table kernel for decode
    (S==1) on TPU; gather-to-contiguous + the standard per-slot attention
    elsewhere (prefill, CPU). pool_ks/pool_vs: int8-KV scale pools."""
    S = q.shape[2]
    B, H, _, D = q.shape
    # Same head-fold VMEM gate as decode_mha: the NT body holds every
    # head's q/acc in VMEM per grid step; past the budget fall through to
    # the gather path instead of failing Mosaic compilation.
    fold_ok = (
        os.environ.get("RTEN_DECODE_FOLD_HEADS", "1") != "0"
        and H * round_up(S, 8) * max(D, 64) <= 64 * 1024
    )
    if use_flash and (on_tpu() or interpret) and S == 1 and fold_ok:
        return paged_decode_mha(q, pool_k, pool_v, lens, block_table,
                                pool_ks, pool_vs,
                                scale=scale, window=window,
                                interpret=interpret)
    kf = paged_gather_kv(pool_k, block_table)
    vf = paged_gather_kv(pool_v, block_table)
    ks = vs = None
    if pool_ks is not None:
        ks = paged_gather_scales(pool_ks, block_table)
        vs = paged_gather_scales(pool_vs, block_table)
    if use_flash and on_tpu():
        return decode_attention(q, kf, vf, lens, ks, vs, scale=scale,
                                window=window)
    return decode_mha_xla(q, kf, vf, lens, ks, vs, scale=scale,
                          window=window)


def mha_xla(q, k, v, mask=None, *, scale=None, causal=False, softcap=0.0):
    """Reference attention: materialized scores (CPU fallback + golden)."""
    B, Hq, Tq, D = q.shape
    _, Hkv, Tk, _ = k.shape
    if scale is None:
        scale = 1.0 / float(np.sqrt(D))
    if Hq != Hkv:
        k = jnp.repeat(k, Hq // Hkv, axis=1)
        v = jnp.repeat(v, Hq // Hkv, axis=1)
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32)) * scale
    if softcap:
        s = softcap * jnp.tanh(s / softcap)
    if mask is not None:
        s = s + mask.astype(jnp.float32)
    if causal:
        q_pos = jnp.arange(Tq)[:, None]
        k_pos = jnp.arange(Tk)[None, :]
        s = jnp.where(k_pos <= q_pos + (Tk - Tq), s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32))
    return out.astype(q.dtype)


def mha(q, k, v, mask=None, *, scale=None, causal=False, softcap=0.0,
        prefer_flash=True):
    """Dispatch: Pallas flash kernel on TPU (prefill-sized q), XLA otherwise."""
    if prefer_flash and on_tpu() and q.shape[2] >= 8:
        return mha_pallas(q, k, v, mask, scale=scale, causal=causal, softcap=softcap)
    return mha_xla(q, k, v, mask, scale=scale, causal=causal, softcap=softcap)
