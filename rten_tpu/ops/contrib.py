"""Microsoft contrib ops (com.microsoft domain).

Reference: rten registers these alongside the standard set
(src/op_registry/onnx_registry.rs:275-295): gelu variants
(src/ops/unary_elementwise/contrib.rs), skip/simplified layer norms
(src/ops/norm/contrib.rs:86-186). On TPU these are thin compositions —
XLA fuses them — but registering them lets ORT-optimized models load.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .norm import _layer_norm, _rms_norm
from .registry import get_input, opt_input, register


@register("BiasGelu")
def _bias_gelu(ctx, inputs, attrs):
    x = get_input(inputs, 0)
    bias = get_input(inputs, 1, "bias")
    return jax.nn.gelu(x + bias, approximate=False)


@register("FastGelu")
def _fast_gelu(ctx, inputs, attrs):
    x = get_input(inputs, 0)
    bias = opt_input(inputs, 1)
    if bias is not None:
        x = x + bias
    return jax.nn.gelu(x, approximate=True)


@register("GeluMicrosoft")
def _gelu_ms(ctx, inputs, attrs):
    return jax.nn.gelu(get_input(inputs, 0), approximate=False)


@register("QuickGelu")
def _quick_gelu(ctx, inputs, attrs):
    x = get_input(inputs, 0)
    alpha = attrs.get("alpha", 1.702)
    return x * jax.nn.sigmoid(alpha * x)


@register("SimplifiedLayerNormalization")
def _simplified_layer_norm(ctx, inputs, attrs):
    # == RMSNormalization (rten norm/contrib.rs:86).
    x = get_input(inputs, 0)
    scale = get_input(inputs, 1, "scale")
    axis = attrs.get("axis", -1)
    eps = attrs.get("epsilon", 1e-5)
    return _rms_norm(x, scale, axis, eps)


@register("SkipLayerNormalization")
def _skip_layer_norm(ctx, inputs, attrs):
    # out = LayerNorm(x + skip (+ bias)); optional 4th output = the sum
    # (rten norm/contrib.rs:123).
    x = get_input(inputs, 0)
    skip = get_input(inputs, 1, "skip")
    gamma = get_input(inputs, 2, "gamma")
    beta = opt_input(inputs, 3)
    bias = opt_input(inputs, 4)
    eps = attrs.get("epsilon", 1e-5)
    total = x + skip
    if bias is not None:
        total = total + bias
    out = _layer_norm(total, gamma, beta, -1, eps)
    n_out = attrs.get("__n_outputs__", 1)
    if n_out >= 4:
        return (out, jnp.zeros(()), jnp.zeros(()), total)
    if n_out > 1:
        return (out,) + (jnp.zeros(()),) * (n_out - 1)
    return out


@register("SkipSimplifiedLayerNormalization")
def _skip_simplified_layer_norm(ctx, inputs, attrs):
    x = get_input(inputs, 0)
    skip = get_input(inputs, 1, "skip")
    gamma = get_input(inputs, 2, "gamma")
    bias = opt_input(inputs, 3)
    eps = attrs.get("epsilon", 1e-5)
    total = x + skip
    if bias is not None:
        total = total + bias
    out = _rms_norm(total, gamma, -1, eps)
    n_out = attrs.get("__n_outputs__", 1)
    if n_out >= 4:
        return (out, jnp.zeros(()), jnp.zeros(()), total)
    if n_out > 1:
        return (out,) + (jnp.zeros(()),) * (n_out - 1)
    return out
