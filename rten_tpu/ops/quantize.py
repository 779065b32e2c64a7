"""Quantization ops: QuantizeLinear, DequantizeLinear, DynamicQuantizeLinear.

Reference coverage: rten `src/ops/quantize.rs` (per-tensor, per-channel
(axis) and blockwise scales; `DynamicQuantizeLinear` computes a per-tensor
u8 scale/zero-point at runtime, `quantize.rs:439`). Rounding is
half-to-even, matching ONNX and the reference's SIMD rounding mode.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .registry import OpError, get_input, opt_input, register


def _broadcast_qparam(p, x_ndim, axis, block_size, x_shape):
    """Reshape scale/zero-point for per-tensor / per-axis / blockwise quant."""
    p = jnp.asarray(p)
    if p.ndim == 0 or p.size == 1:
        return p.reshape(())
    if block_size:
        # Blockwise: p has shape of x with `axis` divided by block_size.
        reps = [1] * x_ndim
        reps[axis] = block_size
        expanded = jnp.repeat(p, block_size, axis=axis)
        # Trim in case the axis is not an exact multiple.
        sl = [slice(None)] * x_ndim
        sl[axis] = slice(0, x_shape[axis])
        return expanded[tuple(sl)]
    shape = [1] * x_ndim
    shape[axis] = p.size
    return p.reshape(shape)


def _round_half_even(x):
    return jnp.round(x)  # jnp.round is round-half-to-even


@register("QuantizeLinear")
def _quantize_linear(ctx, inputs, attrs):
    x = get_input(inputs, 0)
    scale = get_input(inputs, 1, "scale")
    zp = opt_input(inputs, 2)
    axis = attrs.get("axis", 1)
    block_size = attrs.get("block_size", 0)
    if axis < 0:
        axis += x.ndim
    s = _broadcast_qparam(scale, x.ndim, axis, block_size, x.shape)
    out_dtype = jnp.uint8 if zp is None else jnp.result_type(zp)
    z = 0 if zp is None else _broadcast_qparam(zp, x.ndim, axis, block_size, x.shape).astype(jnp.int32)
    q = _round_half_even(x / s) + z
    info = jnp.iinfo(out_dtype)
    return jnp.clip(q, info.min, info.max).astype(out_dtype)


@register("DequantizeLinear")
def _dequantize_linear(ctx, inputs, attrs):
    x = get_input(inputs, 0)
    scale = get_input(inputs, 1, "scale")
    zp = opt_input(inputs, 2)
    axis = attrs.get("axis", 1)
    block_size = attrs.get("block_size", 0)
    if axis < 0:
        axis += jnp.ndim(x)
    s = _broadcast_qparam(scale, jnp.ndim(x), axis, block_size, jnp.shape(x))
    xi = jnp.asarray(x).astype(jnp.int32)
    if zp is not None:
        z = _broadcast_qparam(zp, jnp.ndim(x), axis, block_size, jnp.shape(x)).astype(jnp.int32)
        xi = xi - z
    return xi.astype(jnp.result_type(s)) * s


@register("DynamicQuantizeLinear")
def _dynamic_quantize_linear(ctx, inputs, attrs):
    x = get_input(inputs, 0)
    return dynamic_quantize(x)


def dynamic_quantize(x):
    """Per-tensor u8 dynamic quantization (ONNX DynamicQuantizeLinear spec).

    Returns (y_u8, scale_f32_scalar, zero_point_u8_scalar).
    """
    qmin, qmax = 0.0, 255.0
    x_min = jnp.minimum(jnp.min(x), 0.0)
    x_max = jnp.maximum(jnp.max(x), 0.0)
    scale = (x_max - x_min) / (qmax - qmin)
    scale = jnp.where(scale == 0, 1.0, scale)
    zp_fp = qmin - x_min / scale
    zp = jnp.clip(_round_half_even(zp_fp), qmin, qmax).astype(jnp.uint8)
    y = jnp.clip(_round_half_even(x / scale) + zp.astype(jnp.int32), qmin, qmax).astype(
        jnp.uint8
    )
    return y, scale.astype(jnp.float32), zp
