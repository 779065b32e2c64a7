"""Unary / binary / variadic elementwise ops.

Reference coverage: rten `src/ops/unary_elementwise.rs`,
`src/ops/binary_elementwise.rs`, `src/ops/variadic_elementwise.rs`, plus the
contrib gelu variants (`src/ops/unary_elementwise/contrib.rs`). The
reference hand-vectorizes these through rten-vecmath; on TPU they are VPU
ops that XLA fuses into neighbouring matmuls, so the lowerings are direct
jnp expressions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .registry import OpError, get_input, opt_input, register


def _unary(name: str, fn):
    @register(name)
    def lower(ctx, inputs, attrs, _fn=fn):
        return _fn(get_input(inputs, 0))

    return lower


_unary("Abs", jnp.abs)
_unary("Acos", jnp.arccos)
_unary("Acosh", jnp.arccosh)
_unary("Asin", jnp.arcsin)
_unary("Asinh", jnp.arcsinh)
_unary("Atan", jnp.arctan)
_unary("Atanh", jnp.arctanh)
_unary("Ceil", jnp.ceil)
_unary("Cos", jnp.cos)
_unary("Cosh", jnp.cosh)
_unary("Erf", jax.lax.erf)
_unary("Exp", jnp.exp)
_unary("Floor", jnp.floor)
_unary("Log", jnp.log)
_unary("Neg", jnp.negative)
_unary("Not", jnp.logical_not)
_unary("Reciprocal", lambda x: 1.0 / x)
_unary("Relu", lambda x: jnp.maximum(x, 0))
_unary("Sigmoid", jax.nn.sigmoid)
_unary("Sign", jnp.sign)
_unary("Sin", jnp.sin)
_unary("Sinh", jnp.sinh)
_unary("Softplus", jax.nn.softplus)
_unary("Sqrt", jnp.sqrt)
_unary("Tan", jnp.tan)
_unary("Tanh", jnp.tanh)
_unary("IsNaN", jnp.isnan)
_unary("Silu", lambda x: x * jax.nn.sigmoid(x))


# ONNX Round uses banker's rounding (round half to even), same as jnp.round.
_unary("Round", jnp.round)


@register("IsInf")
def _isinf(ctx, inputs, attrs):
    x = get_input(inputs, 0)
    pos = attrs.get("detect_positive", 1)
    neg = attrs.get("detect_negative", 1)
    out = jnp.zeros(jnp.shape(x), dtype=bool)
    if pos:
        out = out | (x == jnp.inf)
    if neg:
        out = out | (x == -jnp.inf)
    return out


@register("Elu")
def _elu(ctx, inputs, attrs):
    x = get_input(inputs, 0)
    alpha = attrs.get("alpha", 1.0)
    return jnp.where(x > 0, x, alpha * (jnp.exp(x) - 1.0))


@register("LeakyRelu")
def _leaky_relu(ctx, inputs, attrs):
    x = get_input(inputs, 0)
    alpha = attrs.get("alpha", 0.01)
    return jnp.where(x >= 0, x, alpha * x)


@register("PRelu")
def _prelu(ctx, inputs, attrs):
    x = get_input(inputs, 0)
    slope = get_input(inputs, 1, "slope")
    return jnp.where(x >= 0, x, slope * x)


@register("Gelu")
def _gelu(ctx, inputs, attrs):
    x = get_input(inputs, 0)
    if attrs.get("approximate", "none") == "tanh":
        return jax.nn.gelu(x, approximate=True)
    return jax.nn.gelu(x, approximate=False)


@register("HardSigmoid")
def _hard_sigmoid(ctx, inputs, attrs):
    x = get_input(inputs, 0)
    alpha = attrs.get("alpha", 0.2)
    beta = attrs.get("beta", 0.5)
    return jnp.clip(alpha * x + beta, 0.0, 1.0)


@register("HardSwish")
def _hard_swish(ctx, inputs, attrs):
    x = get_input(inputs, 0)
    return x * jnp.clip(x / 6.0 + 0.5, 0.0, 1.0)


@register("Swish")
def _swish(ctx, inputs, attrs):
    # rten fused Swish (src/optimize/fusions.rs Swish{alpha}); ORT contrib
    # calls the same scale "beta" — accept either spelling.
    x = get_input(inputs, 0)
    beta = attrs.get("beta", attrs.get("alpha", 1.0))
    return x * jax.nn.sigmoid(beta * x)


@register("Clip")
def _clip(ctx, inputs, attrs):
    x = get_input(inputs, 0)
    # opset >= 11: min/max as optional inputs; older: attrs.
    lo = opt_input(inputs, 1, attrs.get("min"))
    hi = opt_input(inputs, 2, attrs.get("max"))
    if lo is not None:
        x = jnp.maximum(x, lo)
    if hi is not None:
        x = jnp.minimum(x, hi)
    return x


# ---- binary ---------------------------------------------------------------


def _binary(name: str, fn):
    @register(name)
    def lower(ctx, inputs, attrs, _fn=fn):
        return _fn(get_input(inputs, 0, "a"), get_input(inputs, 1, "b"))

    return lower


_binary("Add", jnp.add)
_binary("Sub", jnp.subtract)
_binary("Mul", jnp.multiply)
_binary("And", jnp.logical_and)
_binary("Or", jnp.logical_or)
_binary("Xor", jnp.logical_xor)
_binary("Equal", jnp.equal)
_binary("Greater", jnp.greater)
_binary("GreaterOrEqual", jnp.greater_equal)
_binary("Less", jnp.less)
_binary("LessOrEqual", jnp.less_equal)


@register("Div")
def _div(ctx, inputs, attrs):
    a = get_input(inputs, 0, "a")
    b = get_input(inputs, 1, "b")
    if jnp.issubdtype(jnp.result_type(a), jnp.integer):
        # ONNX integer Div truncates toward zero (C semantics), unlike
        # python floor division.
        q = jnp.abs(a) // jnp.abs(b)
        return jnp.where((a < 0) ^ (b < 0), -q, q).astype(jnp.result_type(a, b))
    return jnp.divide(a, b)


@register("Mod")
def _mod(ctx, inputs, attrs):
    a = get_input(inputs, 0, "a")
    b = get_input(inputs, 1, "b")
    if attrs.get("fmod", 0):
        return jnp.fmod(a, b)
    return jnp.mod(a, b)


@register("Pow")
def _pow(ctx, inputs, attrs):
    a = get_input(inputs, 0, "a")
    b = get_input(inputs, 1, "b")
    return jnp.power(a, b.astype(jnp.result_type(a)))


@register("Where")
def _where(ctx, inputs, attrs):
    cond = get_input(inputs, 0, "condition")
    x = get_input(inputs, 1, "x")
    y = get_input(inputs, 2, "y")
    return jnp.where(cond.astype(bool), x, y)


# ---- variadic ---------------------------------------------------------------


def _variadic(name: str, fn2):
    @register(name)
    def lower(ctx, inputs, attrs, _fn=fn2):
        vals = [v for v in inputs if v is not None]
        if not vals:
            raise OpError(f"{name} requires at least one input")
        out = vals[0]
        for v in vals[1:]:
            out = _fn(out, v)
        return out

    return lower


_variadic("Max", jnp.maximum)
_variadic("Min", jnp.minimum)
_variadic("Sum", jnp.add)


@register("Mean")
def _mean(ctx, inputs, attrs):
    vals = [v for v in inputs if v is not None]
    out = vals[0]
    for v in vals[1:]:
        out = jnp.add(out, v)
    return out / len(vals)
