"""Spectral ops: DFT, STFT (rten src/ops/fft.rs:137 STFT, :384 DFT).

Used by the Whisper mel front-end. jnp.fft maps to XLA's FFT; complex
results are returned in ONNX's trailing [real, imag] layout.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .registry import OpError, get_input, opt_input, register, static_value


def _to_complex(x):
    """ONNX complex layout [..., 2] -> jnp complex; real input passes through."""
    if x.shape[-1] == 2:
        return x[..., 0] + 1j * x[..., 1]
    return jnp.squeeze(x, -1) if x.shape[-1] == 1 else x


def _from_complex(z):
    return jnp.stack([jnp.real(z), jnp.imag(z)], axis=-1).astype(jnp.float32)


@register("DFT")
def _dft(ctx, inputs, attrs):
    x = get_input(inputs, 0)
    dft_length = opt_input(inputs, 1)
    axis_in = opt_input(inputs, 2)
    inverse = bool(attrs.get("inverse", 0))
    onesided = bool(attrs.get("onesided", 0))
    axis = attrs.get("axis", None)
    if axis is None:
        axis = int(static_value(axis_in, "axis").reshape(())) if axis_in is not None else 1
    n = int(static_value(dft_length, "dft_length").reshape(())) if dft_length is not None else None

    is_complex_input = x.shape[-1] == 2
    sig = _to_complex(x) if is_complex_input else jnp.squeeze(x, -1)
    ax = axis if axis >= 0 else axis + sig.ndim

    if inverse:
        if onesided:
            raise OpError("DFT: inverse+onesided unsupported")
        z = jnp.fft.ifft(sig, n=n, axis=ax)
        return _from_complex(z)
    if onesided:
        z = jnp.fft.rfft(jnp.real(sig), n=n, axis=ax)
    else:
        z = jnp.fft.fft(sig, n=n, axis=ax)
    return _from_complex(z)


@register("STFT")
def _stft(ctx, inputs, attrs):
    signal = get_input(inputs, 0)  # [B, L] or [B, L, 1] (real)
    frame_step = int(static_value(get_input(inputs, 1, "frame_step")).reshape(()))
    window = opt_input(inputs, 2)
    frame_length = opt_input(inputs, 3)
    onesided = bool(attrs.get("onesided", 1))

    if signal.shape[-1] == 1:
        signal = jnp.squeeze(signal, -1)
    elif signal.ndim == 3 and signal.shape[-1] == 2:
        raise OpError("STFT: complex signals unsupported")
    B, L = signal.shape

    if frame_length is not None:
        flen = int(static_value(frame_length, "frame_length").reshape(()))
    elif window is not None:
        flen = window.shape[-1]
    else:
        raise OpError("STFT requires window or frame_length")

    n_frames = 1 + (L - flen) // frame_step
    starts = np.arange(n_frames) * frame_step
    idx = starts[:, None] + np.arange(flen)[None, :]  # [F, flen]
    frames = signal[:, jnp.asarray(idx)]  # [B, F, flen]
    if window is not None:
        frames = frames * window
    if onesided:
        z = jnp.fft.rfft(frames, axis=-1)
    else:
        z = jnp.fft.fft(frames, axis=-1)
    return _from_complex(z)  # [B, F, bins, 2]
