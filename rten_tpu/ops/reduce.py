"""Reduction ops: Reduce*, ArgMax/Min, CumSum, TopK, NonZero.

Reference coverage: rten `src/ops/reduce.rs` (2,389 LoC of hand-rolled
loops); here each is a single XLA reduction. NonZero is inherently
dynamic-shaped and only supported when its input is a trace-time constant
(the common case after constant propagation — e.g. shape masks).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .registry import OpError, get_input, opt_input, register, static_value


def _axes_of(inputs, attrs, x):
    axes = opt_input(inputs, 1, attrs.get("axes"))
    noop_with_empty = attrs.get("noop_with_empty_axes", 0)
    if axes is None:
        return None, noop_with_empty
    axes = np.atleast_1d(static_value(axes, "axes")).astype(int)
    if axes.size == 0:
        return None, noop_with_empty
    return tuple(int(a) % x.ndim for a in axes), noop_with_empty


def _reduce(name, fn, pre=None, post=None):
    @register(name)
    def lower(ctx, inputs, attrs, _fn=fn, _pre=pre, _post=post):
        x = get_input(inputs, 0)
        axes, noop = _axes_of(inputs, attrs, x)
        keepdims = bool(attrs.get("keepdims", 1))
        if axes is None and noop:
            return x
        v = _pre(x) if _pre else x
        out = _fn(v, axis=axes, keepdims=keepdims)
        return _post(out) if _post else out

    return lower


_reduce("ReduceSum", jnp.sum)
_reduce("ReduceMean", jnp.mean)
_reduce("ReduceMax", jnp.max)
_reduce("ReduceMin", jnp.min)
_reduce("ReduceProd", jnp.prod)
_reduce("ReduceL1", jnp.sum, pre=jnp.abs)
_reduce("ReduceL2", jnp.sum, pre=jnp.square, post=jnp.sqrt)
_reduce("ReduceSumSquare", jnp.sum, pre=jnp.square)
_reduce("ReduceLogSum", jnp.sum, post=jnp.log)


@register("ReduceLogSumExp")
def _reduce_lse(ctx, inputs, attrs):
    x = get_input(inputs, 0)
    axes, noop = _axes_of(inputs, attrs, x)
    keepdims = bool(attrs.get("keepdims", 1))
    if axes is None and noop:
        return x
    if axes is None:
        axes = tuple(range(x.ndim))
    return jax.scipy.special.logsumexp(x, axis=axes, keepdims=keepdims)


def _arg_reduce(name, fn, last_fn):
    @register(name)
    def lower(ctx, inputs, attrs, _fn=fn, _last=last_fn):
        x = get_input(inputs, 0)
        axis = attrs.get("axis", 0)
        keepdims = bool(attrs.get("keepdims", 1))
        select_last = attrs.get("select_last_index", 0)
        if (name == "ArgMax" and not select_last and x.ndim >= 2
                and axis in (-1, x.ndim - 1)):
            # Serving greedy head: XLA's variadic (value, index) reduce
            # measured 3x its DMA bound on [96, 50257] logits; the Pallas
            # grid reduction streams the rows once (kernels/argmax.py).
            from ..kernels.argmax import argmax_lastdim
            from .attention import _use_flash

            idx = argmax_lastdim(x, use_flash=_use_flash(ctx))
        elif select_last:
            flipped = jnp.flip(x, axis=axis)
            idx = _fn(flipped, axis=axis)
            idx = x.shape[axis] - 1 - idx
        else:
            idx = _fn(x, axis=axis)
        idx = idx.astype(jnp.int32)
        if keepdims:
            idx = jnp.expand_dims(idx, axis=axis)
        return idx

    return lower


_arg_reduce("ArgMax", jnp.argmax, None)
_arg_reduce("ArgMin", jnp.argmin, None)


@register("CumSum")
def _cumsum(ctx, inputs, attrs):
    x = get_input(inputs, 0)
    axis = int(static_value(get_input(inputs, 1, "axis"), "axis").reshape(()))
    exclusive = attrs.get("exclusive", 0)
    reverse = attrs.get("reverse", 0)
    if reverse:
        x = jnp.flip(x, axis=axis)
    out = jnp.cumsum(x, axis=axis)
    if exclusive:
        out = out - x
    if reverse:
        out = jnp.flip(out, axis=axis)
    return out


@register("TopK")
def _topk(ctx, inputs, attrs):
    x = get_input(inputs, 0)
    k = int(static_value(get_input(inputs, 1, "k"), "k").reshape(()))
    axis = attrs.get("axis", -1)
    largest = attrs.get("largest", 1)
    sorted_ = attrs.get("sorted", 1)  # jax.lax.top_k always sorts
    del sorted_
    if axis < 0:
        axis += x.ndim
    moved = jnp.moveaxis(x, axis, -1)
    if largest:
        vals, idx = jax.lax.top_k(moved, k)
    else:
        vals, idx = jax.lax.top_k(-moved, k)
        vals = -vals
    vals = jnp.moveaxis(vals, -1, axis)
    idx = jnp.moveaxis(idx, -1, axis).astype(jnp.int32)
    return vals, idx


@register("NonZero")
def _nonzero(ctx, inputs, attrs):
    # Output shape is data-dependent; only computable when the input is a
    # trace-time constant (after const-prop this covers the typical uses).
    x = static_value(get_input(inputs, 0), "NonZero input")
    return np.stack(np.nonzero(x)).astype(np.int32)
