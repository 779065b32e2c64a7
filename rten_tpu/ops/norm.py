"""Normalization & softmax ops.

Reference coverage: rten `src/ops/norm.rs` (+ contrib variants in
`src/ops/norm/contrib.rs`). The reference vectorizes the inner loops via
rten-vecmath; XLA fuses these reductions + scales natively on the VPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .registry import get_input, opt_input, register


@register("Softmax")
def _softmax(ctx, inputs, attrs):
    x = get_input(inputs, 0)
    axis = attrs.get("axis", -1)
    return jax.nn.softmax(x, axis=axis)


@register("LogSoftmax")
def _log_softmax(ctx, inputs, attrs):
    x = get_input(inputs, 0)
    axis = attrs.get("axis", -1)
    return jax.nn.log_softmax(x, axis=axis)


def _layer_norm(x, scale, bias, axis, epsilon):
    mean = jnp.mean(x, axis=axis, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=axis, keepdims=True)
    out = (x - mean) * jax.lax.rsqrt(var + epsilon)
    if scale is not None:
        out = out * scale
    if bias is not None:
        out = out + bias
    return out


@register("LayerNormalization")
def _layer_normalization(ctx, inputs, attrs):
    x = get_input(inputs, 0)
    scale = opt_input(inputs, 1)
    bias = opt_input(inputs, 2)
    axis = attrs.get("axis", -1)
    eps = attrs.get("epsilon", 1e-5)
    if axis < 0:
        axis += x.ndim
    axes = tuple(range(axis, x.ndim))
    return _layer_norm(x, scale, bias, axes, eps)


def _rms_norm(x, scale, axis, epsilon):
    ms = jnp.mean(jnp.square(x), axis=axis, keepdims=True)
    out = x * jax.lax.rsqrt(ms + epsilon)
    if scale is not None:
        out = out * scale
    return out


@register("RMSNormalization")
def _rms_normalization(ctx, inputs, attrs):
    x = get_input(inputs, 0)
    scale = opt_input(inputs, 1)
    axis = attrs.get("axis", -1)
    eps = attrs.get("epsilon", 1e-5)
    if axis < 0:
        axis += x.ndim
    axes = tuple(range(axis, x.ndim))
    return _rms_norm(x, scale, axes, eps)


@register("BatchNormalization")
def _batch_normalization(ctx, inputs, attrs):
    x = get_input(inputs, 0)
    scale = get_input(inputs, 1, "scale")
    bias = get_input(inputs, 2, "bias")
    mean = get_input(inputs, 3, "mean")
    var = get_input(inputs, 4, "var")
    eps = attrs.get("epsilon", 1e-5)
    # Stats are per-channel (axis 1 in NCHW).
    shape = (1, -1) + (1,) * (x.ndim - 2)
    scale = jnp.reshape(scale, shape)
    bias = jnp.reshape(bias, shape)
    mean = jnp.reshape(mean, shape)
    var = jnp.reshape(var, shape)
    return (x - mean) * (scale * jax.lax.rsqrt(var + eps)) + bias


@register("InstanceNormalization")
def _instance_normalization(ctx, inputs, attrs):
    x = get_input(inputs, 0)
    scale = get_input(inputs, 1, "scale")
    bias = get_input(inputs, 2, "bias")
    eps = attrs.get("epsilon", 1e-5)
    axes = tuple(range(2, x.ndim))
    mean = jnp.mean(x, axis=axes, keepdims=True)
    var = jnp.var(x, axis=axes, keepdims=True)
    shape = (1, -1) + (1,) * (x.ndim - 2)
    return (x - mean) * jax.lax.rsqrt(var + eps) * jnp.reshape(scale, shape) + jnp.reshape(
        bias, shape
    )


@register("LpNormalization")
def _lp_normalization(ctx, inputs, attrs):
    x = get_input(inputs, 0)
    axis = attrs.get("axis", -1)
    p = attrs.get("p", 2)
    if p == 1:
        norm = jnp.sum(jnp.abs(x), axis=axis, keepdims=True)
    else:
        norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=True))
    return x / norm


# ---- fused helper ops produced by the optimizer -----------------------------


@register("SafeSoftmax")
def _safe_softmax(ctx, inputs, attrs):
    # Softmax variant that outputs zeros (not NaN) for all -inf rows
    # (rten fusions SafeSoftmax — used after masked attention scores).
    x = get_input(inputs, 0)
    axis = attrs.get("axis", -1)
    m = jnp.max(x, axis=axis, keepdims=True)
    e = jnp.exp(x - jax.lax.stop_gradient(m))
    e = jnp.where(jnp.isfinite(m), e, 0.0)
    s = jnp.sum(e, axis=axis, keepdims=True)
    return jnp.where(s > 0, e / s, 0.0)


@register("AddSoftmax")
def _add_softmax(ctx, inputs, attrs):
    # Fused mask-add + softmax (rten src/ops/attention.rs:79).
    x = get_input(inputs, 0)
    mask = get_input(inputs, 1, "mask")
    axis = attrs.get("axis", -1)
    return jax.nn.softmax(x + mask, axis=axis)
