"""Fused int8 dequant + matmul on the MXU.

TPU analog of the reference's packed int8 GEMM microkernels
(rten-gemm `kernels/x86_64.rs:698` VNNI / `aarch64.rs:288` SDOT) and the
`MatMulIntegerToFloat` fusion (rten `src/optimize/fusions.rs:966`):

    C = ((A - zp_a) . (B - zp_b)) * scale_a * scale_b

computed as a native s8 x s8 -> s32 MXU matmul plus a zero-point correction
from row/col sums (same algebra as rten `rten-gemm/src/packing/int8.rs:19-46`):

    C_int = A.B - zp_a * col_sums(B) - zp_b * row_sums(A) + K * zp_a * zp_b

The dequant epilogue (correction + scales) runs on the VPU in the same
kernel, so the int32 accumulator never round-trips through HBM.

Zero-point support: per-tensor or per-row (LHS) / per-col (RHS), matching
rten `QuantParams` (rten-gemm/src/kernels.rs:104-110). u8 operands are
reinterpreted as s8 with the sign-bit flip + zp shift (see common.py).
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import on_tpu, pad_dim, round_up, u8_to_s8_shift


def _as_col(v, m, dtype):
    """Broadcast scalar-or-[M] to an [M, 1] column."""
    v = jnp.asarray(v, dtype)
    if v.ndim == 0:
        v = jnp.full((m,), v, dtype)
    return v.reshape(m, 1)


def _as_row(v, n, dtype):
    v = jnp.asarray(v, dtype)
    if v.ndim == 0:
        v = jnp.full((n,), v, dtype)
    return v.reshape(1, n)


def _kernel(a_ref, b_ref, rs_ref, azp_ref, sa_ref, cs_ref, bzp_ref, sb_ref,
            out_ref, acc_ref, *, k_logical: int, has_azp: bool, has_bzp: bool):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        a_ref[:],
        b_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        acc = acc_ref[:]
        if has_azp:
            azp = azp_ref[:]  # [BM, 1] int32
            acc = acc - azp * cs_ref[:]
        if has_bzp:
            bzp = bzp_ref[:]  # [1, BN] int32
            acc = acc - rs_ref[:] * bzp
        if has_azp and has_bzp:
            acc = acc + k_logical * azp_ref[:] * bzp_ref[:]
        out_ref[:] = acc.astype(jnp.float32) * sa_ref[:] * sb_ref[:]


def _divisor_block(dim: int, limit: int, align: int = 128):
    """Largest divisor of ``dim`` that is a multiple of ``align`` and <=
    ``limit``; None when none exists. Divisor blocks mean zero padding: a
    padded weight operand would force XLA to WRITE a fresh padded copy of
    the whole weight matrix every step — for a decode step that is pure
    HBM-bandwidth loss on the step's dominant traffic."""
    best = None
    for cand in range(align, min(limit, dim) + 1, align):
        if dim % cand == 0:
            best = cand
    return best


def _skinny_blocks(M: int, K: int, N: int):
    """Block choice for decode-shape (small-M) calls.

    At M<=64 the matmul is pure weight streaming; the dominant kernel cost
    is per-grid-step overhead, not FLOPs. The round-2 default blocks gave
    e.g. 27 grid steps for a [16,768]x[768,2304] call (~90us/call — slower
    than the XLA dot, which forced the pallas_int8_min_m routing
    concession). Here: full-K blocks (no K loop, no accumulator revisits)
    and wide N blocks sized to ~2MB of weight per step, so a GPT-2 decode
    matmul runs in 1-4 grid steps (the weights-stationary GEMV analog of
    rten's gemv fast path, rten-gemm/src/lib.rs:668,875-890).

    Returns (bm, bk, bn) or None when the shape doesn't fit the pattern
    (K not lane-aligned, or the weight block would blow VMEM).
    """
    if K % 128 != 0 or K > 8192:
        return None
    # Target ~4MB int8 weight block (VMEM is ~16MB and pallas
    # double-buffers), AND cap bn so the f32 out block + i32 accumulator
    # (bm x bn x 8 bytes) stay within ~4MB — at small K the weight target
    # alone would let the out block blow VMEM.
    bm = round_up(M, 32)
    limit_n = max(128, (4 * 1024 * 1024 // K) // 128 * 128)
    limit_n = min(limit_n, max(128, (4 * 1024 * 1024 // (8 * bm)) // 128 * 128))
    bn = _divisor_block(N, limit_n)
    if bn is None:
        bn = min(limit_n, round_up(N, 128))
    return bm, K, bn


def int8_matmul_dequant(
    a,
    b,
    a_scale,
    b_scale,
    a_zp=None,
    b_zp=None,
    b_colsums=None,
    *,
    block_m: int = 256,
    block_n: int = 256,
    block_k: int = 512,
    interpret: bool = False,
):
    """Pallas fused dequant matmul: a [M,K] (u8|s8) x b [K,N] s8 -> f32 [M,N].

    ``a_scale``: scalar or [M]; ``b_scale``: scalar or [N];
    ``a_zp``: scalar or [M]; ``b_zp``: scalar or [N].
    ``b_colsums``: optional precomputed int32 col sums of b (shape [N] or
    [1, N]) — the load-time prepack (rten packing/int8.rs col_sums analog)
    that saves a full weight re-read per step.
    """
    M, K = a.shape
    K2, N = b.shape
    assert K == K2, (a.shape, b.shape)

    # Normalize operands to s8 + int32 zero points.
    if a_zp is None:
        a_zp_i32 = jnp.int32(0)
        has_azp = False
    else:
        a_zp_i32 = jnp.asarray(a_zp).astype(jnp.int32)
        has_azp = True
    if a.dtype == jnp.uint8:
        a, a_zp_i32 = u8_to_s8_shift(a, a_zp_i32)
        has_azp = True
    if b_zp is None:
        b_zp_i32 = jnp.int32(0)
        has_bzp = False
    else:
        b_zp_i32 = jnp.asarray(b_zp).astype(jnp.int32)
        has_bzp = True
    if b.dtype == jnp.uint8:
        b, b_zp_i32 = u8_to_s8_shift(b, b_zp_i32)
        has_bzp = True

    # Row/col sums for the zero-point correction (rten packing/int8.rs
    # appends these to the packed panels). Col sums of the weight matrix
    # come precomputed from the load-time prepack when available — computing
    # them per step would re-read the full weight matrix.
    if has_bzp:
        rs = jnp.sum(a.astype(jnp.int32), axis=1, keepdims=True)
    else:
        rs = jnp.zeros((M, 1), jnp.int32)
    if not has_azp:
        cs = jnp.zeros((1, N), jnp.int32)
    elif b_colsums is not None:
        cs = jnp.asarray(b_colsums, jnp.int32).reshape(1, N)
    else:
        cs = jnp.sum(b.astype(jnp.int32), axis=0, keepdims=True)

    azp = _as_col(a_zp_i32, M, jnp.int32)
    bzp = _as_row(b_zp_i32, N, jnp.int32)
    sa = _as_col(a_scale, M, jnp.float32)
    sb = _as_row(b_scale, N, jnp.float32)

    # Tile-align. int8 min tile is (32, 128); f32 out is (8, 128). Prefer
    # divisor blocks for K/N: padding the weight operand would write+read a
    # full padded copy of it every call.
    # Decode shapes extend to M=128+ with continuous batching (M = live
    # slots); the weights-stationary full-K blocks beat the generic tiling
    # 2-3x there too (round-4 microbench at M=96: QKV 10.9 -> 5.1us,
    # lm_head 390 -> 123us). Above that, prefill/training shapes take the
    # generic 3-axis tiling.
    skinny = _skinny_blocks(M, K, N) if M <= 128 else None
    if skinny is not None:
        bm, bk, bn = skinny
    elif (block_m, block_n, block_k) == (256, 256, 512) and M > 128:
        # Large-batch (prefill/training) auto config: the 256/256/384
        # default tiles a [12288,768]x[768,2304] prefill matmul into 864
        # grid steps of ~96KB — per-step overhead dominates (466us vs the
        # 110us MXU bound). Fewer, larger steps with full-K blocks:
        # 167us on-chip (round-4 microbench), ~2.8x.
        bm = next((c for c in (512, 384, 256) if M % c == 0), 512)
        bn = _divisor_block(N, 512) or min(512, round_up(N, 128))
        if K % 128 == 0 and K <= 4096:
            bk = K
        else:
            bk = _divisor_block(K, 2048) or min(2048, round_up(K, 128))
    else:
        bm = min(block_m, round_up(M, 32))
        bn = _divisor_block(N, block_n) or min(block_n, round_up(N, 128))
        bk = _divisor_block(K, block_k) or min(block_k, round_up(K, 128))
    Mp, Np, Kp = round_up(M, bm), round_up(N, bn), round_up(K, bk)
    a_p = pad_dim(pad_dim(a, 0, Mp), 1, Kp)
    b_p = pad_dim(pad_dim(b, 0, Kp), 1, Np)
    rs_p = pad_dim(rs, 0, Mp)
    azp_p = pad_dim(azp, 0, Mp)
    sa_p = pad_dim(sa, 0, Mp)
    cs_p = pad_dim(cs, 1, Np)
    bzp_p = pad_dim(bzp, 1, Np)
    sb_p = pad_dim(sb, 1, Np)

    grid = (Mp // bm, Np // bn, Kp // bk)
    kernel = functools.partial(
        _kernel, k_logical=K, has_azp=has_azp, has_bzp=has_bzp
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda m, n, k: (m, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda m, n, k: (k, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda m, n, k: (m, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda m, n, k: (m, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda m, n, k: (m, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda m, n, k: (0, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda m, n, k: (0, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda m, n, k: (0, n), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bm, bn), lambda m, n, k: (m, n), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * Np * Kp,
            bytes_accessed=Mp * Kp + Kp * Np + 4 * Mp * Np,
            transcendentals=0,
        ),
        interpret=interpret,
    )(a_p, b_p, rs_p, azp_p, sa_p, cs_p, bzp_p, sb_p)
    return out[:M, :N]


def int8_matmul_dequant_xla(a, b, a_scale, b_scale, a_zp=None, b_zp=None):
    """XLA reference implementation (CPU fallback + test golden)."""
    a32 = a.astype(jnp.int32)
    b32 = b.astype(jnp.int32)
    if a_zp is not None:
        azp = jnp.asarray(a_zp, jnp.int32)
        a32 = a32 - (azp[..., :, None] if azp.ndim else azp)
    if b_zp is not None:
        bzp = jnp.asarray(b_zp, jnp.int32)
        b32 = b32 - (bzp[None, :] if bzp.ndim else bzp)
    acc = jnp.matmul(a32, b32, preferred_element_type=jnp.int32)
    sa = jnp.asarray(a_scale, jnp.float32)
    sb = jnp.asarray(b_scale, jnp.float32)
    if sa.ndim == 1:
        sa = sa[:, None]
    if sb.ndim == 1:
        sb = sb[None, :]
    return acc.astype(jnp.float32) * sa * sb


def int8_matmul_dequant_auto(a, b, a_scale, b_scale, a_zp=None, b_zp=None,
                             b_colsums=None):
    """Route to the Pallas kernel on TPU, XLA elsewhere.

    ``a`` may have leading batch dims; ``b`` is 2-D [K, N].
    """
    lead = a.shape[:-1]
    K = a.shape[-1]
    M = int(np.prod(lead)) if lead else 1
    a2 = a.reshape(M, K)
    # Per-row quant params follow the flattened M.
    if on_tpu():
        out = int8_matmul_dequant(
            a2, b, a_scale, b_scale, a_zp, b_zp, b_colsums
        )
    else:
        out = int8_matmul_dequant_xla(a2, b, a_scale, b_scale, a_zp, b_zp)
    return out.reshape(*lead, b.shape[-1])
