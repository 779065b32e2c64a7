"""Pooling ops: MaxPool, AveragePool, GlobalAveragePool, GlobalMaxPool.

Reference coverage: rten `src/ops/pooling.rs`. Lowered to
`lax.reduce_window`, which XLA maps to efficient VPU windowed reductions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .conv import _resolve_pads
from .registry import OpError, get_input, register


def _pool_params(x, attrs):
    n_sp = x.ndim - 2
    kernel = list(attrs["kernel_shape"])
    strides = list(attrs.get("strides", [1] * n_sp))
    dilations = list(attrs.get("dilations", [1] * n_sp))
    pads = _resolve_pads(
        attrs.get("auto_pad", "NOTSET"),
        attrs.get("pads"),
        x.shape[2:],
        kernel,
        strides,
        dilations,
    )
    if attrs.get("ceil_mode", 0):
        # Extend right padding so the last partial window is included.
        pads = [list(p) for p in pads]
        for i in range(n_sp):
            eff_k = (kernel[i] - 1) * dilations[i] + 1
            padded = x.shape[2 + i] + pads[i][0] + pads[i][1]
            rem = (padded - eff_k) % strides[i]
            if rem != 0:
                extra = strides[i] - rem
                # ONNX ceil_mode: window may start in padding only if it
                # also covers real input; extending by `extra` is enough.
                pads[i][1] += extra
        pads = [tuple(p) for p in pads]
    return kernel, strides, dilations, pads


@register("MaxPool")
def _max_pool(ctx, inputs, attrs):
    x = get_input(inputs, 0)
    kernel, strides, dilations, pads = _pool_params(x, attrs)
    init = -jnp.inf if jnp.issubdtype(jnp.result_type(x), jnp.floating) else jnp.iinfo(
        jnp.result_type(x)
    ).min
    return jax.lax.reduce_window(
        x,
        init,
        jax.lax.max,
        window_dimensions=(1, 1, *kernel),
        window_strides=(1, 1, *strides),
        window_dilation=(1, 1, *dilations),
        padding=((0, 0), (0, 0), *pads),
    )


@register("AveragePool")
def _average_pool(ctx, inputs, attrs):
    x = get_input(inputs, 0)
    kernel, strides, dilations, pads = _pool_params(x, attrs)
    count_include_pad = attrs.get("count_include_pad", 0)
    sums = jax.lax.reduce_window(
        x,
        0.0,
        jax.lax.add,
        window_dimensions=(1, 1, *kernel),
        window_strides=(1, 1, *strides),
        window_dilation=(1, 1, *dilations),
        padding=((0, 0), (0, 0), *pads),
    )
    if count_include_pad:
        counts = float(np.prod(kernel))
    else:
        ones = jnp.ones((1, 1) + x.shape[2:], dtype=x.dtype)
        counts = jax.lax.reduce_window(
            ones,
            0.0,
            jax.lax.add,
            window_dimensions=(1, 1, *kernel),
            window_strides=(1, 1, *strides),
            window_dilation=(1, 1, *dilations),
            padding=((0, 0), (0, 0), *pads),
        )
    return sums / counts


@register("GlobalAveragePool")
def _global_average_pool(ctx, inputs, attrs):
    x = get_input(inputs, 0)
    return jnp.mean(x, axis=tuple(range(2, x.ndim)), keepdims=True)


@register("GlobalMaxPool")
def _global_max_pool(ctx, inputs, attrs):
    x = get_input(inputs, 0)
    return jnp.max(x, axis=tuple(range(2, x.ndim)), keepdims=True)
