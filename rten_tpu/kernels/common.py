"""Shared helpers for Pallas kernels: backend detection, tiling utils."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def on_tpu() -> bool:
    """True when the default backend is a real TPU.

    Kernel wrappers consult this at trace time: on CPU (unit tests, virtual
    meshes) they lower to the XLA reference implementation instead, which is
    also the numerical golden the Pallas path is tested against.
    """
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def pad_dim(x, axis: int, target: int, value=0):
    """Zero-pad ``axis`` of ``x`` up to ``target`` elements."""
    cur = x.shape[axis]
    if cur == target:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, target - cur)
    return jnp.pad(x, pads, constant_values=value)


def u8_to_s8_shift(a, a_zp):
    """Reinterpret u8 data as s8 by flipping the sign bit, adjusting the zp.

    u8 value v == (s8 reinterpretation of v^0x80) + 128, so
    (v - zp) == (v^0x80 viewed as s8) - (zp - 128).
    The MXU consumes s8; this is the TPU analog of rten's shift_cast
    (rten src/shift_cast.rs, used by matmul_integer src/ops/matmul.rs:582).
    """
    shifted = jax.lax.bitcast_convert_type(a ^ jnp.uint8(0x80), jnp.int8)
    new_zp = a_zp.astype(jnp.int32) - 128
    return shifted, new_zp
