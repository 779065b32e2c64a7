"""Resize / Upsample (rten src/ops/resize.rs).

Scales/sizes must be trace-time constants (true after constant propagation;
XLA needs static output shapes). Interpolation is separable: each resized
axis becomes a gather with precomputed (numpy) indices + weights, which XLA
fuses into a couple of dynamic-slices — no scatter, TPU-friendly.

Supported: nearest (all ONNX nearest_modes), linear, cubic (a=-0.75),
coordinate_transformation_modes half_pixel, pytorch_half_pixel, asymmetric,
align_corners, tf_half_pixel_for_nn.
"""

from __future__ import annotations

from typing import List

import jax.numpy as jnp
import numpy as np

from .registry import OpError, get_input, opt_input, register, static_value


def _src_coord(i: np.ndarray, scale: float, in_size: int, out_size: int, mode: str):
    if mode in ("half_pixel", "half_pixel_symmetric"):
        return (i + 0.5) / scale - 0.5
    if mode == "pytorch_half_pixel":
        return (i + 0.5) / scale - 0.5 if out_size > 1 else np.zeros_like(i, np.float64)
    if mode == "asymmetric":
        return i / scale
    if mode == "align_corners":
        if out_size == 1:
            return np.zeros_like(i, np.float64)
        return i * (in_size - 1) / (out_size - 1)
    if mode == "tf_half_pixel_for_nn":
        return (i + 0.5) / scale
    raise OpError(f"unsupported coordinate_transformation_mode {mode}")


def _nearest_index(x: np.ndarray, mode: str):
    if mode == "round_prefer_floor":
        return np.ceil(x - 0.5)
    if mode == "round_prefer_ceil":
        return np.floor(x + 0.5)
    if mode == "floor":
        return np.floor(x)
    if mode == "ceil":
        return np.ceil(x)
    raise OpError(f"unsupported nearest_mode {mode}")


def _cubic_weights(f: np.ndarray, a: float = -0.75):
    # Keys cubic kernel; taps at offsets -1, 0, 1, 2 from floor(x).
    def w(d):
        d = np.abs(d)
        return np.where(
            d <= 1,
            ((a + 2) * d - (a + 3)) * d * d + 1,
            np.where(d < 2, (((d - 5) * d + 8) * d - 4) * a, 0.0),
        )

    return [w(f + 1), w(f), w(1 - f), w(2 - f)]


def _resize_axis(x, axis, out_size, scale, mode, coord_mode, nearest_mode,
                 exclude_outside):
    in_size = x.shape[axis]
    if out_size == in_size:
        return x
    i = np.arange(out_size, dtype=np.float64)
    src = _src_coord(i, scale, in_size, out_size, coord_mode)
    if mode == "nearest":
        idx = np.clip(_nearest_index(src, nearest_mode), 0, in_size - 1).astype(np.int32)
        return jnp.take(x, jnp.asarray(idx), axis=axis)
    if mode == "linear":
        lo = np.floor(src)
        f = src - lo
        taps = [(lo, 1.0 - f), (lo + 1, f)]
    elif mode == "cubic":
        lo = np.floor(src)
        f = src - lo
        ws = _cubic_weights(f)
        taps = [(lo - 1 + t, ws[t]) for t in range(4)]
    else:
        raise OpError(f"unsupported resize mode {mode}")

    valid_ws = []
    for idx, w in taps:
        inside = (idx >= 0) & (idx <= in_size - 1)
        if exclude_outside:
            w = np.where(inside, w, 0.0)
        valid_ws.append(w)
    if exclude_outside:
        total = np.sum(valid_ws, axis=0)
        total = np.where(total == 0, 1.0, total)
        valid_ws = [w / total for w in valid_ws]

    out = None
    shape = [1] * x.ndim
    shape[axis] = out_size
    for (idx, _), w in zip(taps, valid_ws):
        idx = np.clip(idx, 0, in_size - 1).astype(np.int32)
        g = jnp.take(x, jnp.asarray(idx), axis=axis)
        wj = jnp.asarray(w.astype(np.float32)).reshape(shape)
        out = g * wj if out is None else out + g * wj
    return out


def _resize_impl(x, scales, sizes, mode, coord_mode, nearest_mode, exclude_outside):
    nd = x.ndim
    if sizes is not None:
        out_sizes = [int(s) for s in np.asarray(sizes).reshape(-1)]
        eff_scales = [out_sizes[i] / x.shape[i] for i in range(nd)]
    else:
        eff_scales = [float(s) for s in np.asarray(scales).reshape(-1)]
        out_sizes = [int(np.floor(x.shape[i] * eff_scales[i])) for i in range(nd)]
    orig_dtype = x.dtype
    compute = x
    if mode != "nearest" and not jnp.issubdtype(x.dtype, jnp.floating):
        compute = x.astype(jnp.float32)
    for axis in range(nd):
        compute = _resize_axis(
            compute, axis, out_sizes[axis], eff_scales[axis], mode, coord_mode,
            nearest_mode, exclude_outside,
        )
    if compute.dtype != orig_dtype:
        compute = jnp.round(compute).astype(orig_dtype)
    return compute


@register("Resize")
def _resize(ctx, inputs, attrs):
    x = get_input(inputs, 0)
    # opset>=11: (X, roi, scales, sizes); opset 10: (X, scales).
    if len(inputs) == 2:
        scales = opt_input(inputs, 1)
        sizes = None
    else:
        scales = opt_input(inputs, 2)
        sizes = opt_input(inputs, 3)
    if scales is not None and np.asarray(scales).size == 0:
        scales = None
    if scales is None and sizes is None:
        raise OpError("Resize requires scales or sizes")
    scales = static_value(scales, "scales") if scales is not None else None
    sizes = static_value(sizes, "sizes") if sizes is not None else None

    def s(name, default):
        v = attrs.get(name, default)
        return v.decode() if isinstance(v, bytes) else v

    mode = s("mode", "nearest")
    coord_mode = s("coordinate_transformation_mode", "half_pixel")
    nearest_mode = s("nearest_mode", "round_prefer_floor")
    if coord_mode == "tf_crop_and_resize":
        raise OpError("Resize tf_crop_and_resize is not supported")
    return _resize_impl(
        x, scales, sizes, mode, coord_mode, nearest_mode,
        bool(attrs.get("exclude_outside", 0)),
    )


@register("Upsample")
def _upsample(ctx, inputs, attrs):
    # Deprecated opset-9 op: Resize with asymmetric nearest/linear.
    x = get_input(inputs, 0)
    scales = opt_input(inputs, 1)
    if scales is None:
        scales = attrs.get("scales")
    scales = static_value(scales, "scales")
    mode = attrs.get("mode", "nearest")
    if isinstance(mode, bytes):
        mode = mode.decode()
    return _resize_impl(x, scales, None, mode, "asymmetric", "floor", False)
