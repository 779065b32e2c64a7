"""GridSample (rten src/ops/grid_sample.rs:335): 4D bilinear/nearest.

x [N,C,H,W], grid [N,Ho,Wo,2] with normalized coords in [-1,1] (x then y).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .registry import OpError, get_input, register


def _unnormalize(coord, size, align_corners):
    if align_corners:
        return (coord + 1) * (size - 1) / 2
    return ((coord + 1) * size - 1) / 2


def _reflect(coord, size, align_corners):
    # Reflection padding in continuous coordinates.
    if align_corners:
        span = 2 * (size - 1)
        if span == 0:
            return jnp.zeros_like(coord)
        c = jnp.abs(coord) % span
        return jnp.where(c > size - 1, span - c, c)
    span = 2 * size
    c = jnp.abs(coord + 0.5) % span
    c = jnp.where(c > size, span - c, c) - 0.5
    return jnp.clip(c, 0, size - 1)


@register("GridSample")
def _grid_sample(ctx, inputs, attrs):
    x = get_input(inputs, 0)
    grid = get_input(inputs, 1, "grid")
    if x.ndim != 4:
        raise OpError("GridSample: only 4D inputs supported")
    mode = attrs.get("mode", "linear")
    if isinstance(mode, bytes):
        mode = mode.decode()
    if mode == "bilinear":
        mode = "linear"
    padding = attrs.get("padding_mode", "zeros")
    if isinstance(padding, bytes):
        padding = padding.decode()
    align = bool(attrs.get("align_corners", 0))

    N, C, H, W = x.shape
    gx = _unnormalize(grid[..., 0].astype(jnp.float32), W, align)  # [N,Ho,Wo]
    gy = _unnormalize(grid[..., 1].astype(jnp.float32), H, align)

    if padding == "border":
        gx = jnp.clip(gx, 0, W - 1)
        gy = jnp.clip(gy, 0, H - 1)
    elif padding == "reflection":
        gx = _reflect(gx, W, align)
        gy = _reflect(gy, H, align)

    def gather(ix, iy):
        # x [N,C,H,W] indexed at integer (iy, ix) [N,Ho,Wo] -> [N,C,Ho,Wo]
        ixc = jnp.clip(ix, 0, W - 1)
        iyc = jnp.clip(iy, 0, H - 1)
        flat = x.reshape(N, C, H * W)
        idx = (iyc * W + ixc).reshape(N, 1, -1)
        idx = jnp.broadcast_to(idx, (N, C, idx.shape[-1]))
        vals = jnp.take_along_axis(flat, idx, axis=2).reshape(N, C, *ix.shape[1:])
        if padding == "zeros":
            inside = (ix >= 0) & (ix <= W - 1) & (iy >= 0) & (iy <= H - 1)
            vals = vals * inside[:, None].astype(vals.dtype)
        return vals

    if mode == "nearest":
        # ONNX/pytorch nearest: round half away from floor via round-half-even?
        # torch uses round-to-nearest (half towards +inf on .5 boundaries).
        ix = jnp.floor(gx + 0.5).astype(jnp.int32)
        iy = jnp.floor(gy + 0.5).astype(jnp.int32)
        return gather(ix, iy)
    if mode != "linear":
        raise OpError(f"GridSample mode {mode} not supported")

    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    fx = gx - x0
    fy = gy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    v00 = gather(x0i, y0i)
    v01 = gather(x0i + 1, y0i)
    v10 = gather(x0i, y0i + 1)
    v11 = gather(x0i + 1, y0i + 1)
    fx = fx[:, None]
    fy = fy[:, None]
    out = (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )
    return out.astype(x.dtype)
