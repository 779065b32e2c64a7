"""Layout / shape-manipulation ops.

Reference coverage: rten `src/ops/layout.rs`, `slice.rs`, `split.rs`,
`concat.rs`, `pad.rs`, `trilu.rs`, `convert.rs` (Cast), `identity.rs`,
`generate.rs` (Range/EyeLike/OneHot/ConstantOfShape), `compute_shape.rs`.
The reference implements these as stride tricks / zero-copy views; under
XLA they are free-ish reshapes/transposes fused away by the compiler.
Shape-carrying tensor inputs must be trace-time constants (see
`registry.static_value`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..dtypes import DataType
from .registry import (
    OpError,
    get_input,
    opt_input,
    opt_static,
    register,
    static_value,
)


@register("Identity")
def _identity(ctx, inputs, attrs):
    return get_input(inputs, 0)


@register("Dropout")
def _dropout(ctx, inputs, attrs):
    # Inference mode: identity. Mask output (if requested) is all-true.
    x = get_input(inputs, 0)
    return x


@register("Reshape")
def _reshape(ctx, inputs, attrs):
    x = get_input(inputs, 0)
    shape = static_value(get_input(inputs, 1, "shape"), "shape").astype(np.int64)
    allowzero = attrs.get("allowzero", 0)
    out = []
    for i, d in enumerate(shape):
        if d == 0 and not allowzero:
            out.append(x.shape[i])
        else:
            out.append(int(d))
    return jnp.reshape(x, out)


@register("Flatten")
def _flatten(ctx, inputs, attrs):
    x = get_input(inputs, 0)
    axis = attrs.get("axis", 1)
    if axis < 0:
        axis += x.ndim
    lead = int(np.prod(x.shape[:axis])) if axis > 0 else 1
    return jnp.reshape(x, (lead, -1))


@register("Transpose")
def _transpose(ctx, inputs, attrs):
    x = get_input(inputs, 0)
    perm = attrs.get("perm")
    if perm is None:
        perm = list(reversed(range(x.ndim)))
    return jnp.transpose(x, perm)


@register("Squeeze")
def _squeeze(ctx, inputs, attrs):
    x = get_input(inputs, 0)
    axes = opt_input(inputs, 1, attrs.get("axes"))
    if axes is None:
        return jnp.squeeze(x)
    axes = [int(a) % x.ndim if a >= 0 else int(a) + x.ndim for a in np.atleast_1d(static_value(axes, "axes"))]
    return jnp.squeeze(x, axis=tuple(axes))


@register("Unsqueeze")
def _unsqueeze(ctx, inputs, attrs):
    x = get_input(inputs, 0)
    axes = opt_input(inputs, 1, attrs.get("axes"))
    axes = np.atleast_1d(static_value(axes, "axes")).astype(int)
    out_ndim = x.ndim + len(axes)
    axes = sorted(a % out_ndim for a in axes)
    return jnp.expand_dims(x, axis=tuple(axes))


@register("Expand")
def _expand(ctx, inputs, attrs):
    x = get_input(inputs, 0)
    shape = static_value(get_input(inputs, 1, "shape"), "shape").astype(int).tolist()
    # ONNX Expand broadcasts bidirectionally: output dim = max(in, requested)
    # with 1s broadcast; requested may have more dims than input.
    ndim = max(x.ndim, len(shape))
    in_shape = (1,) * (ndim - x.ndim) + tuple(x.shape)
    shape = [1] * (ndim - len(shape)) + list(shape)
    out_shape = [max(a, b) for a, b in zip(in_shape, shape)]
    return jnp.broadcast_to(jnp.reshape(x, in_shape), out_shape)


@register("Tile")
def _tile(ctx, inputs, attrs):
    x = get_input(inputs, 0)
    repeats = static_value(get_input(inputs, 1, "repeats"), "repeats").astype(int)
    return jnp.tile(x, tuple(repeats))


@register("Slice")
def _slice(ctx, inputs, attrs):
    x = get_input(inputs, 0)
    if len(inputs) > 1 and inputs[1] is not None:
        starts = static_value(inputs[1], "starts").astype(np.int64)
        ends = static_value(inputs[2], "ends").astype(np.int64)
        axes = opt_static(opt_input(inputs, 3), None)
        steps = opt_static(opt_input(inputs, 4), None)
    else:  # opset < 10 attribute form
        starts = np.asarray(attrs["starts"], dtype=np.int64)
        ends = np.asarray(attrs["ends"], dtype=np.int64)
        axes = attrs.get("axes")
        steps = None
    starts = np.atleast_1d(starts)
    ends = np.atleast_1d(ends)
    if axes is None:
        axes = np.arange(len(starts))
    axes = np.atleast_1d(np.asarray(axes, dtype=np.int64))
    if steps is None:
        steps = np.ones(len(starts), dtype=np.int64)
    steps = np.atleast_1d(np.asarray(steps, dtype=np.int64))

    slices = [slice(None)] * x.ndim
    for st, en, ax, sp in zip(starts, ends, axes, steps):
        ax = int(ax) % x.ndim
        st, en, sp = int(st), int(en), int(sp)
        # Clamp the INT64 sentinel values used for "to the end".
        dim = x.shape[ax]
        if st > dim:
            st = dim
        if en > dim:
            en = dim
        if st < -dim:
            st = -dim
        if en < -dim - 1:
            en = -dim - 1
        slices[ax] = slice(st, en, sp)
    return x[tuple(slices)]


@register("Split")
def _split(ctx, inputs, attrs):
    x = get_input(inputs, 0)
    axis = attrs.get("axis", 0)
    if axis < 0:
        axis += x.ndim
    split = opt_input(inputs, 1, attrs.get("split"))
    n_out = attrs.get("__n_outputs__", attrs.get("num_outputs"))
    if split is not None:
        sizes = np.atleast_1d(static_value(split, "split")).astype(int).tolist()
        indices = np.cumsum(sizes)[:-1].tolist()
        parts = jnp.split(x, indices, axis=axis)
    else:
        if n_out is None:
            raise OpError("Split requires split sizes or num_outputs")
        dim = x.shape[axis]
        chunk = -(-dim // n_out)
        indices = list(range(chunk, dim, chunk))
        parts = jnp.split(x, indices, axis=axis)
    return tuple(parts)


@register("Concat")
def _concat(ctx, inputs, attrs):
    axis = attrs.get("axis", 0)
    vals = [v for v in inputs if v is not None]
    return jnp.concatenate(vals, axis=axis)


@register("Pad")
def _pad(ctx, inputs, attrs):
    x = get_input(inputs, 0)
    pads = opt_input(inputs, 1, attrs.get("pads"))
    pads = np.atleast_1d(static_value(pads, "pads")).astype(int)
    cval = opt_input(inputs, 2, attrs.get("value", 0.0))
    axes = opt_input(inputs, 3)
    mode = attrs.get("mode", "constant")
    if isinstance(mode, bytes):
        mode = mode.decode()
    n = x.ndim
    full = np.zeros((n, 2), dtype=int)
    if axes is not None:
        axes = np.atleast_1d(static_value(axes, "axes")).astype(int)
        k = len(axes)
        for i, ax in enumerate(axes):
            full[int(ax) % n, 0] = pads[i]
            full[int(ax) % n, 1] = pads[i + k]
    else:
        k = n
        for i in range(n):
            full[i, 0] = pads[i]
            full[i, 1] = pads[i + k]
    if np.any(full < 0):
        # Negative pads crop.
        slices = []
        for i in range(n):
            lo = -min(full[i, 0], 0)
            hi = min(full[i, 1], 0)
            slices.append(slice(lo, x.shape[i] + hi))
        x = x[tuple(slices)]
        full = np.maximum(full, 0)
    pad_width = [(int(a), int(b)) for a, b in full]
    if mode == "constant":
        if cval is None:
            cval = 0.0
        cval = jnp.asarray(cval, dtype=x.dtype)
        return jnp.pad(x, pad_width, mode="constant", constant_values=cval)
    mode_map = {"reflect": "reflect", "edge": "edge", "wrap": "wrap"}
    return jnp.pad(x, pad_width, mode=mode_map[mode])


@register("Trilu")
def _trilu(ctx, inputs, attrs):
    x = get_input(inputs, 0)
    k = int(opt_static(opt_input(inputs, 1), 0))
    if attrs.get("upper", 1):
        return jnp.triu(x, k=k)
    return jnp.tril(x, k=k)


@register("DepthToSpace")
def _depth_to_space(ctx, inputs, attrs):
    x = get_input(inputs, 0)
    b = attrs["blocksize"]
    mode = attrs.get("mode", "DCR")
    if isinstance(mode, bytes):
        mode = mode.decode()
    N, C, H, W = x.shape
    if mode == "DCR":
        x = jnp.reshape(x, (N, b, b, C // (b * b), H, W))
        x = jnp.transpose(x, (0, 3, 4, 1, 5, 2))
    else:  # CRD
        x = jnp.reshape(x, (N, C // (b * b), b, b, H, W))
        x = jnp.transpose(x, (0, 1, 4, 2, 5, 3))
    return jnp.reshape(x, (N, C // (b * b), H * b, W * b))


@register("SpaceToDepth")
def _space_to_depth(ctx, inputs, attrs):
    x = get_input(inputs, 0)
    b = attrs["blocksize"]
    N, C, H, W = x.shape
    x = jnp.reshape(x, (N, C, H // b, b, W // b, b))
    x = jnp.transpose(x, (0, 3, 5, 1, 2, 4))
    return jnp.reshape(x, (N, C * b * b, H // b, W // b))


@register("ReverseSequence")
def _reverse_sequence(ctx, inputs, attrs):
    x = get_input(inputs, 0)
    seq_lens = get_input(inputs, 1, "sequence_lens")
    batch_axis = attrs.get("batch_axis", 1)
    time_axis = attrs.get("time_axis", 0)
    T = x.shape[time_axis]
    idx = jnp.arange(T)
    # For each batch element b with length L: out[t] = x[L-1-t] if t < L else x[t]
    def rev_one(xb, L):
        src = jnp.where(idx < L, L - 1 - idx, idx)
        return jnp.take(xb, src, axis=time_axis if time_axis < batch_axis else time_axis - 1)

    return jax.vmap(rev_one, in_axes=(batch_axis, 0), out_axes=batch_axis)(
        x, seq_lens.astype(jnp.int32)
    )


# ---- shape queries & generators --------------------------------------------


@register("Shape")
def _shape(ctx, inputs, attrs):
    x = get_input(inputs, 0)
    shape = np.asarray(jnp.shape(x), dtype=np.int32)
    start = attrs.get("start", 0)
    end = attrs.get("end")
    n = len(shape)
    start = max(start + n, 0) if start < 0 else min(start, n)
    if end is None:
        end = n
    end = max(end + n, 0) if end < 0 else min(end, n)
    return shape[start:end]


@register("Size")
def _size(ctx, inputs, attrs):
    x = get_input(inputs, 0)
    return np.asarray(int(np.prod(jnp.shape(x))), dtype=np.int32)


@register("Cast")
def _cast(ctx, inputs, attrs):
    x = get_input(inputs, 0)
    to = attrs["to"]
    if isinstance(to, DataType):
        dtype = to.np_dtype
    else:
        dtype = np.dtype(to)
    return jnp.asarray(x).astype(dtype)


@register("CastLike")
def _cast_like(ctx, inputs, attrs):
    x = get_input(inputs, 0)
    target = get_input(inputs, 1, "target_type")
    return jnp.asarray(x).astype(jnp.result_type(target))


@register("Constant")
def _constant(ctx, inputs, attrs):
    # ONNX Constant node: value arrives as one of several attr spellings.
    # The optimizer folds these away; the lowering exists for unoptimized
    # runs (rten converts them at load, converter.py handles per-attr).
    for key in ("value", "value_float", "value_int", "value_floats", "value_ints"):
        if key in attrs:
            v = np.asarray(attrs[key])
            if key in ("value_int", "value_ints"):
                v = v.astype(np.int32)
            if key in ("value_float", "value_floats"):
                v = v.astype(np.float32)
            return v
    raise OpError("Constant node has no value attribute")


@register("ConstantOfShape")
def _constant_of_shape(ctx, inputs, attrs):
    shape = static_value(get_input(inputs, 0, "shape"), "shape").astype(int)
    value = attrs.get("value")
    if value is None:
        value = np.zeros(1, dtype=np.float32)
    value = np.asarray(value)
    return jnp.full(tuple(shape), value.reshape(-1)[0], dtype=value.dtype)


@register("EyeLike")
def _eye_like(ctx, inputs, attrs):
    x = get_input(inputs, 0)
    k = attrs.get("k", 0)
    dtype = attrs.get("dtype")
    if isinstance(dtype, DataType):
        dtype = dtype.np_dtype
    elif dtype is None:
        dtype = jnp.result_type(x)
    return jnp.eye(x.shape[0], x.shape[1], k=k, dtype=dtype)


@register("Range")
def _range(ctx, inputs, attrs):
    start = static_value(get_input(inputs, 0, "start"), "start")
    limit = static_value(get_input(inputs, 1, "limit"), "limit")
    delta = static_value(get_input(inputs, 2, "delta"), "delta")
    return jnp.arange(start.item(), limit.item(), delta.item(), dtype=start.dtype)


@register("OneHot")
def _one_hot(ctx, inputs, attrs):
    indices = get_input(inputs, 0, "indices")
    depth = int(static_value(get_input(inputs, 1, "depth"), "depth").reshape(()))
    values = get_input(inputs, 2, "values")  # [off, on]
    axis = attrs.get("axis", -1)
    oh = jax.nn.one_hot(indices % depth, depth, axis=axis, dtype=jnp.result_type(values))
    off, on = values[0], values[1]
    return oh * (on - off) + off
