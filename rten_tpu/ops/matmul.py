"""MatMul family: MatMul, Gemm, FusedMatMul, MatMulInteger,
MatMulIntegerToFloat, MatMulNBits, MatMulAdd.

Reference coverage: rten `src/ops/matmul.rs` (+ `matmul/contrib.rs`), which
routes everything into rten-gemm's packed SIMD microkernels. Here the f32
path is a single `jnp.matmul` (XLA tiles it onto the MXU and fuses the
epilogue), and the quantized paths either use XLA integer dots or the
fused dequant Pallas kernels in `rten_tpu/kernels/` when profitable (chosen
via ``ctx.config``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .registry import OpError, get_input, opt_input, register


@register("MatMul")
def _matmul(ctx, inputs, attrs):
    a = get_input(inputs, 0, "a")
    b = get_input(inputs, 1, "b")
    return _mm(ctx, a, b)


def _mm(ctx, a, b):
    out_dtype = jnp.result_type(a, b)
    # f32 matmuls default to full precision for accuracy parity with the
    # reference's exact f32 GEMM; the TPU perf path is int8/bf16, where this
    # has no cost. RunConfig.prefer_bf16 flips the tradeoff.
    precision = None
    if out_dtype == jnp.float32 and not (ctx is not None and ctx.config.prefer_bf16):
        precision = jax.lax.Precision.HIGHEST
    return jnp.matmul(a, b, preferred_element_type=out_dtype, precision=precision)


@register("FusedMatMul")
def _fused_matmul(ctx, inputs, attrs):
    # Optimizer-produced MatMul with a folded scalar multiplier
    # (rten src/ops/matmul.rs:457 FusedMatMul{alpha}).
    a = get_input(inputs, 0, "a")
    b = get_input(inputs, 1, "b")
    alpha = attrs.get("alpha", 1.0)
    return _mm(ctx, a, b) * alpha


@register("MatMulAdd")
def _matmul_add(ctx, inputs, attrs):
    # Optimizer-produced MatMul+bias (rten fusions MatMulAdd).
    a = get_input(inputs, 0, "a")
    b = get_input(inputs, 1, "b")
    bias = get_input(inputs, 2, "bias")
    return _mm(ctx, a, b) + bias


@register("Gemm")
def _gemm(ctx, inputs, attrs):
    a = get_input(inputs, 0, "a")
    b = get_input(inputs, 1, "b")
    c = opt_input(inputs, 2)
    alpha = attrs.get("alpha", 1.0)
    beta = attrs.get("beta", 1.0)
    if attrs.get("transA", 0):
        a = jnp.swapaxes(a, -1, -2)
    if attrs.get("transB", 0):
        b = jnp.swapaxes(b, -1, -2)
    out = _mm(ctx, a, b)
    if alpha != 1.0:
        out = out * alpha
    if c is not None and beta != 0.0:
        out = out + beta * c
    return out


def _int_matmul_xla(a, b, a_zp, b_zp, b_colsums=None):
    """Zero-point-corrected integer matmul accumulated in int32.

    C = (A - zp_a) . (B - zp_b)
      = A.B - zp_a * col_sums(B) - zp_b * row_sums(A) + k * zp_a * zp_b

    The expanded form (same algebra as rten's packed-sum trick,
    `rten-gemm/src/packing/int8.rs:19-46`) keeps the main product as a
    native s8/u8 MXU dot instead of materializing widened operands.
    ``b_colsums``: optional precomputed col sums of B (prepack) — avoids a
    second full weight read per call.
    """
    k = a.shape[-1]
    a32 = a.astype(jnp.int32)
    b32 = b.astype(jnp.int32)
    prod = jax.lax.dot_general(
        a,
        b,
        dimension_numbers=(((a.ndim - 1,), (b.ndim - 2,)), ((), ())),
        preferred_element_type=jnp.int32,
    ) if a.ndim == 2 and b.ndim == 2 else jnp.matmul(
        a32, b32, preferred_element_type=jnp.int32
    )
    correction = 0
    if a_zp is not None:
        if b_colsums is not None:
            col_sums = jnp.asarray(b_colsums, jnp.int32).reshape(1, b.shape[-1])
        else:
            col_sums = jnp.sum(b32, axis=-2, keepdims=True)  # [..., 1, N]
        azp = jnp.asarray(a_zp, jnp.int32)
        if azp.ndim == 1:  # per-row of A
            azp = azp[:, None]
        correction = correction + azp * col_sums
    if b_zp is not None:
        row_sums = jnp.sum(a32, axis=-1, keepdims=True)  # [..., M, 1]
        bzp = jnp.asarray(b_zp, jnp.int32)
        correction = correction + row_sums * bzp
    if a_zp is not None and b_zp is not None:
        azp = jnp.asarray(a_zp, jnp.int32)
        bzp = jnp.asarray(b_zp, jnp.int32)
        if azp.ndim == 1:
            azp = azp[:, None]
        correction = correction - k * azp * bzp
    return prod - correction


@register("MatMulInteger")
def _matmul_integer(ctx, inputs, attrs):
    a = get_input(inputs, 0, "a")
    b = get_input(inputs, 1, "b")
    a_zp = opt_input(inputs, 2)
    b_zp = opt_input(inputs, 3)
    return _int_matmul_xla(a, b, a_zp, b_zp)


@register("MatMulIntegerToFloat")
def _matmul_integer_to_float(ctx, inputs, attrs):
    """Fused int matmul + dequant (+bias).

    Produced by the MatMulIntegerToFloat rewrite
    (rten `src/optimize/fusions.rs:966`): inputs are
    (a, b, a_scale, b_scale, a_zero_point, b_zero_point, bias).
    Routed to the Pallas fused dequant+MXU kernel when shapes allow.
    """
    a = get_input(inputs, 0, "a")
    b = get_input(inputs, 1, "b")
    a_scale = get_input(inputs, 2, "a_scale")
    b_scale = get_input(inputs, 3, "b_scale")
    a_zp = opt_input(inputs, 4)
    b_zp = opt_input(inputs, 5)
    bias = opt_input(inputs, 6)
    # Input 7: precomputed weight col sums from the load-time prepack pass
    # (optimize.prepack_int8_weights) — saves a full weight re-read/step.
    b_colsums = opt_input(inputs, 7)
    # Prepack may have padded N to a tile multiple; slice back after.
    orig_n = attrs.get("rten_orig_n")

    use_pallas = (
        ctx is not None and ctx.config.use_pallas_int8
        and a.ndim >= 2 and b.ndim == 2
    )
    if use_pallas and ctx.config.pallas_int8_min_m:
        m_rows = 1
        for d in a.shape[:-1]:
            m_rows *= int(d)
        if m_rows < ctx.config.pallas_int8_min_m:
            use_pallas = False
    if use_pallas:
        from ..kernels.int8_matmul import int8_matmul_dequant_auto

        out = int8_matmul_dequant_auto(
            a, b, a_scale, b_scale, a_zp, b_zp, b_colsums
        )
    else:
        acc = _int_matmul_xla(a, b, a_zp, b_zp, b_colsums)
        scale = jnp.asarray(a_scale, jnp.float32) * jnp.asarray(b_scale, jnp.float32)
        out = acc.astype(jnp.float32) * scale
    if orig_n is not None and out.shape[-1] != orig_n:
        out = out[..., :orig_n]
    if bias is not None:
        out = out + bias
    return out


@register("MatMulNBits")
def _matmul_nbits(ctx, inputs, attrs):
    """int4 block-quantized matmul (MS contrib op).

    Reference: rten `src/ops/matmul/contrib.rs:123` ->
    `rten-gemm/src/block_quant.rs`. Weights: [N, K/block, block/2] packed
    nibbles, per-block scales (+ optional zero-points).
    """
    a = get_input(inputs, 0, "a")
    b_packed = get_input(inputs, 1, "b")
    scales = get_input(inputs, 2, "scales")
    zero_points = opt_input(inputs, 3)
    K = attrs["K"]
    N = attrs["N"]
    bits = attrs.get("bits", 4)
    block_size = attrs.get("block_size", 32)
    if bits != 4:
        raise OpError(f"MatMulNBits: only bits=4 supported (got {bits})")

    if ctx is not None and ctx.config.use_pallas_int4:
        from ..kernels.int4_matmul import int4_matmul

        return int4_matmul(a, b_packed, scales, zero_points, K=K, N=N, block_size=block_size)

    w = dequant_nbits(b_packed, scales, zero_points, K=K, N=N, block_size=block_size)
    return _mm(ctx, a, w.astype(jnp.result_type(a)).T)


def dequant_nbits(b_packed, scales, zero_points, *, K, N, block_size):
    """Dequantize [N, ceil(K/bs), bs/2]-packed int4 nibbles to f32 [N, K]."""
    n_blocks = -(-K // block_size)
    b = jnp.asarray(b_packed).reshape(N, n_blocks, block_size // 2)
    lo = (b & 0x0F).astype(jnp.int32)
    hi = ((b >> 4) & 0x0F).astype(jnp.int32)
    # Nibbles are packed little-endian: element 2i in low nibble, 2i+1 high.
    vals = jnp.stack([lo, hi], axis=-1).reshape(N, n_blocks, block_size)
    scales = jnp.asarray(scales).reshape(N, n_blocks, 1).astype(jnp.float32)
    if zero_points is not None:
        zp = jnp.asarray(zero_points)
        if zp.dtype == jnp.uint8:  # packed nibble zero-points
            # ceil(n_blocks/2) bytes per output column (columns are padded to
            # a byte boundary) — unpack per row, then trim each row.
            bpc = (n_blocks + 1) // 2
            zp2 = zp.reshape(N, bpc)
            zp_lo = (zp2 & 0x0F).astype(jnp.int32)
            zp_hi = ((zp2 >> 4) & 0x0F).astype(jnp.int32)
            zp = jnp.stack([zp_lo, zp_hi], axis=-1).reshape(N, bpc * 2)[:, :n_blocks]
        zp = zp.reshape(N, n_blocks, 1).astype(jnp.int32)
    else:
        zp = 8
    w = (vals - zp).astype(jnp.float32) * scales
    return w.reshape(N, n_blocks * block_size)[:, :K]
