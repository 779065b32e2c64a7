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
    save -- round-3 trace: int8-KV attention 155us/layer vs f32 138)."""
    if b.dtype == jnp.bfloat16:
        a = a.astype(jnp.bfloat16)
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
