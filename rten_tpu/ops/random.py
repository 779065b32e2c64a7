"""Random ops (rten src/ops/random.rs, feature `random`).

Keys come from the trace context's PRNG supply (counter-based fold-in of
RunConfig.seed), so runs are reproducible per executor — the analog of the
reference's op-level seed attr handling. A per-op `seed` attr pins the key
exactly like ONNX specifies.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..dtypes import DataType
from .registry import OpError, get_input, register


def _key(ctx, attrs):
    seed = attrs.get("seed")
    if seed is not None:
        return jax.random.PRNGKey(np.int64(np.float64(seed)).item() & 0x7FFFFFFF)
    if ctx is None:
        return jax.random.PRNGKey(0)
    return ctx.next_rng()


def _dtype(attrs, default=jnp.float32):
    dt = attrs.get("dtype")
    if dt is None:
        return default
    if isinstance(dt, DataType):
        return dt.np_dtype
    return {1: jnp.float32, 11: jnp.float32, 10: jnp.float32}.get(int(dt), jnp.float32)


@register("RandomNormal")
def _random_normal(ctx, inputs, attrs):
    shape = tuple(attrs.get("shape", ()))
    mean = attrs.get("mean", 0.0)
    scale = attrs.get("scale", 1.0)
    return jax.random.normal(_key(ctx, attrs), shape, _dtype(attrs)) * scale + mean


@register("RandomNormalLike")
def _random_normal_like(ctx, inputs, attrs):
    x = get_input(inputs, 0)
    mean = attrs.get("mean", 0.0)
    scale = attrs.get("scale", 1.0)
    return jax.random.normal(_key(ctx, attrs), x.shape, _dtype(attrs)) * scale + mean


@register("RandomUniform")
def _random_uniform(ctx, inputs, attrs):
    shape = tuple(attrs.get("shape", ()))
    low = attrs.get("low", 0.0)
    high = attrs.get("high", 1.0)
    return jax.random.uniform(
        _key(ctx, attrs), shape, _dtype(attrs), minval=low, maxval=high
    )


@register("RandomUniformLike")
def _random_uniform_like(ctx, inputs, attrs):
    x = get_input(inputs, 0)
    low = attrs.get("low", 0.0)
    high = attrs.get("high", 1.0)
    return jax.random.uniform(
        _key(ctx, attrs), x.shape, _dtype(attrs), minval=low, maxval=high
    )


@register("Multinomial")
def _multinomial(ctx, inputs, attrs):
    x = get_input(inputs, 0)  # [batch, classes] unnormalized log-probs
    sample_size = attrs.get("sample_size", 1)
    out = jax.random.categorical(
        _key(ctx, attrs), jnp.asarray(x, jnp.float32), axis=-1,
        shape=(sample_size, x.shape[0]),
    ).T
    return out.astype(jnp.int32)
