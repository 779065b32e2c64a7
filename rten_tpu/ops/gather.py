"""Gather / scatter ops.

Reference coverage: rten `src/ops/gather.rs`, `src/ops/scatter.rs`.
Negative indices are normalized (ONNX allows them); out-of-range behavior
follows XLA clamping for gather (the reference errors instead — models in
practice never rely on OOB).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .registry import OpError, get_input, register


def _norm_indices(indices, dim_size):
    return jnp.where(indices < 0, indices + dim_size, indices)


@register("Gather")
def _gather(ctx, inputs, attrs):
    x = get_input(inputs, 0)
    indices = get_input(inputs, 1, "indices")
    axis = attrs.get("axis", 0)
    if axis < 0:
        axis += x.ndim
    idx = _norm_indices(jnp.asarray(indices), x.shape[axis])
    return jnp.take(x, idx, axis=axis)


@register("GatherElements")
def _gather_elements(ctx, inputs, attrs):
    x = get_input(inputs, 0)
    indices = get_input(inputs, 1, "indices")
    axis = attrs.get("axis", 0)
    if axis < 0:
        axis += x.ndim
    idx = _norm_indices(jnp.asarray(indices), x.shape[axis])
    return jnp.take_along_axis(x, idx.astype(jnp.int32), axis=axis)


@register("GatherND")
def _gather_nd(ctx, inputs, attrs):
    x = get_input(inputs, 0)
    indices = jnp.asarray(get_input(inputs, 1, "indices")).astype(jnp.int32)
    batch_dims = attrs.get("batch_dims", 0)
    k = indices.shape[-1]

    def gather_one(data, idx):
        # idx: [..., k]; data: [d0..dk-1, rest...]
        for i in range(k):
            sz = data.shape[i]
            idx = idx.at[..., i].set(jnp.where(idx[..., i] < 0, idx[..., i] + sz, idx[..., i]))
        flat_idx = jnp.zeros(idx.shape[:-1], dtype=jnp.int32)
        stride = 1
        for i in reversed(range(k)):
            flat_idx = flat_idx + idx[..., i] * stride
            stride *= data.shape[i]
        lead = int(np.prod(data.shape[:k]))
        data_flat = data.reshape((lead,) + data.shape[k:])
        return jnp.take(data_flat, flat_idx, axis=0)

    fn = gather_one
    for _ in range(batch_dims):
        fn = jax.vmap(fn)
    return fn(x, indices)


def _scatter_elements_impl(x, indices, updates, axis, reduction):
    idx = _norm_indices(jnp.asarray(indices).astype(jnp.int32), x.shape[axis])
    # Build full index grids for each element of `updates`.
    grids = jnp.meshgrid(
        *[jnp.arange(s) for s in updates.shape], indexing="ij", sparse=False
    )
    index_arrays = list(grids)
    index_arrays[axis] = idx
    locs = tuple(index_arrays)
    if reduction in (None, "none"):
        return x.at[locs].set(updates)
    if reduction == "add":
        return x.at[locs].add(updates)
    if reduction == "mul":
        return x.at[locs].multiply(updates)
    if reduction == "max":
        return x.at[locs].max(updates)
    if reduction == "min":
        return x.at[locs].min(updates)
    raise OpError(f"unsupported scatter reduction {reduction}")


@register("ScatterElements")
def _scatter_elements(ctx, inputs, attrs):
    x = get_input(inputs, 0)
    indices = get_input(inputs, 1, "indices")
    updates = get_input(inputs, 2, "updates")
    axis = attrs.get("axis", 0)
    if axis < 0:
        axis += x.ndim
    reduction = attrs.get("reduction", "none")
    if isinstance(reduction, bytes):
        reduction = reduction.decode()
    return _scatter_elements_impl(x, jnp.asarray(indices), jnp.asarray(updates), axis, reduction)


@register("Scatter")
def _scatter(ctx, inputs, attrs):
    # Deprecated ONNX alias of ScatterElements.
    return _scatter_elements(ctx, inputs, attrs)


@register("ScatterND")
def _scatter_nd(ctx, inputs, attrs):
    x = get_input(inputs, 0)
    indices = jnp.asarray(get_input(inputs, 1, "indices")).astype(jnp.int32)
    updates = jnp.asarray(get_input(inputs, 2, "updates"))
    reduction = attrs.get("reduction", "none")
    if isinstance(reduction, bytes):
        reduction = reduction.decode()
    k = indices.shape[-1]
    locs = tuple(indices[..., i] for i in range(k))
    if reduction in (None, "none"):
        return x.at[locs].set(updates)
    if reduction == "add":
        return x.at[locs].add(updates)
    if reduction == "mul":
        return x.at[locs].multiply(updates)
    if reduction == "max":
        return x.at[locs].max(updates)
    if reduction == "min":
        return x.at[locs].min(updates)
    raise OpError(f"unsupported scatter reduction {reduction}")
