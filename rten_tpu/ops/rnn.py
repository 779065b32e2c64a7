"""Recurrent ops: LSTM, GRU.

Reference: rten `src/ops/rnn.rs` (:388 LSTM, :110 GRU; fwd/rev/bidi).
TPU-native design: the time loop is a `lax.scan` (compiled once, no
per-step dispatch); gate matmuls against the input are hoisted out of the
scan as one big [T*B, 4H] GEMM so the MXU sees large matrices, and only the
recurrent [B,H]x[H,4H] matmul stays inside the loop.

ONNX semantics: X [T,B,I] (layout=0), W [dirs,G*H,I], R [dirs,G*H,H],
B [dirs,2*G*H]; LSTM gate order iofc, GRU gate order zrh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .registry import OpError, get_input, opt_input, register


def _prep(x, layout):
    if layout == 1:  # [B,T,I] -> [T,B,I]
        return jnp.swapaxes(x, 0, 1)
    return x


def _directions(attrs):
    d = attrs.get("direction", "forward")
    if isinstance(d, bytes):
        d = d.decode()
    if d not in ("forward", "reverse", "bidirectional"):
        raise OpError(f"bad RNN direction {d}")
    return d


def _seq_mask(seq_lens, T, B):
    if seq_lens is None:
        return None
    t = jnp.arange(T)[:, None]  # [T,1]
    return t < jnp.asarray(seq_lens)[None, :]  # [T,B]


def _run_dir(cell, x, w, r, b, h0, extra_state, T, B, H, reverse, mask):
    """Scan one direction. cell(carry, (xw_t, mask_t)) -> carry, y_t."""
    # Hoist input projections: [T,B,I] @ [I,GH] -> [T,B,GH].
    xw = jnp.einsum("tbi,gi->tbg", x, w, precision=jax.lax.Precision.HIGHEST)
    if b is not None:
        gh = w.shape[0]
        xw = xw + b[:gh] + b[gh:]
    if reverse:
        xw = jnp.flip(xw, 0)
        m = jnp.flip(mask, 0) if mask is not None else None
    else:
        m = mask
    if m is None:
        m = jnp.ones((T, B), bool)

    carry, ys = jax.lax.scan(cell, (h0, *extra_state), (xw, m))
    if reverse:
        ys = jnp.flip(ys, 0)
    return carry, ys


@register("LSTM")
def _lstm(ctx, inputs, attrs):
    x = get_input(inputs, 0)
    w = get_input(inputs, 1, "W")
    r = get_input(inputs, 2, "R")
    b = opt_input(inputs, 3)
    seq_lens = opt_input(inputs, 4)
    h0 = opt_input(inputs, 5)
    c0 = opt_input(inputs, 6)
    p = opt_input(inputs, 7)
    if p is not None:
        raise OpError("LSTM peepholes are not supported")
    layout = attrs.get("layout", 0)
    H = attrs.get("hidden_size", r.shape[-1])
    x = _prep(x, layout)
    T, B, _ = x.shape
    direction = _directions(attrs)
    dirs = w.shape[0]
    mask = _seq_mask(seq_lens, T, B)

    ys, hs, cs = [], [], []
    for d in range(dirs):
        reverse = (direction == "reverse") or (direction == "bidirectional" and d == 1)
        wd, rd = w[d], r[d]
        bd = b[d] if b is not None else None
        h_init = h0[d] if h0 is not None else jnp.zeros((B, H), x.dtype)
        c_init = c0[d] if c0 is not None else jnp.zeros((B, H), x.dtype)
        rT = rd.T  # [H, 4H]

        def cell(carry, step):
            h, c = carry
            xw_t, m_t = step
            g = xw_t + jnp.dot(h, rT, precision=jax.lax.Precision.HIGHEST)
            i, o, f, cc = jnp.split(g, 4, axis=-1)  # iofc
            i = jax.nn.sigmoid(i)
            o = jax.nn.sigmoid(o)
            f = jax.nn.sigmoid(f)
            cc = jnp.tanh(cc)
            c_new = f * c + i * cc
            h_new = o * jnp.tanh(c_new)
            keep = m_t[:, None]
            h_new = jnp.where(keep, h_new, h)
            c_new = jnp.where(keep, c_new, c)
            y = jnp.where(keep, h_new, 0.0)
            return (h_new, c_new), y

        (h_fin, c_fin), y = _run_dir(
            cell, x, wd, rd, bd, h_init, (c_init,), T, B, H, reverse, mask
        )
        ys.append(y)
        hs.append(h_fin)
        cs.append(c_fin)

    Y = jnp.stack(ys, axis=1)  # [T, dirs, B, H]
    Yh = jnp.stack(hs, axis=0)  # [dirs, B, H]
    Yc = jnp.stack(cs, axis=0)
    if layout == 1:  # Y -> [B, T, dirs, H], Y_h/Y_c -> [B, dirs, H]
        Y = jnp.transpose(Y, (2, 0, 1, 3))
        Yh = jnp.swapaxes(Yh, 0, 1)
        Yc = jnp.swapaxes(Yc, 0, 1)
    n_out = attrs.get("__n_outputs__", 1)
    outs = (Y, Yh, Yc)
    return outs[:n_out] if n_out > 1 else Y


@register("GRU")
def _gru(ctx, inputs, attrs):
    x = get_input(inputs, 0)
    w = get_input(inputs, 1, "W")
    r = get_input(inputs, 2, "R")
    b = opt_input(inputs, 3)
    seq_lens = opt_input(inputs, 4)
    h0 = opt_input(inputs, 5)
    layout = attrs.get("layout", 0)
    H = attrs.get("hidden_size", r.shape[-1])
    linear_before_reset = bool(attrs.get("linear_before_reset", 0))
    x = _prep(x, layout)
    T, B, _ = x.shape
    direction = _directions(attrs)
    dirs = w.shape[0]
    mask = _seq_mask(seq_lens, T, B)

    ys, hs = [], []
    for d in range(dirs):
        reverse = (direction == "reverse") or (direction == "bidirectional" and d == 1)
        wd, rd = w[d], r[d]
        h_init = h0[d] if h0 is not None else jnp.zeros((B, H), x.dtype)
        rT = rd.T  # [H, 3H]
        # GRU bias handling differs from LSTM: recurrent bias Rbh must stay
        # separate for the h-gate, so don't pre-add the recurrent half.
        if b is not None:
            wb = b[d][: 3 * H]
            rb = b[d][3 * H :]
        else:
            wb = rb = None

        # Hoist input projection (without recurrent bias).
        xw = jnp.einsum("tbi,gi->tbg", x, wd, precision=jax.lax.Precision.HIGHEST)
        if wb is not None:
            xw = xw + wb
        m = mask if mask is not None else jnp.ones((T, B), bool)
        if reverse:
            xw = jnp.flip(xw, 0)
            m = jnp.flip(m, 0)

        def cell(h, step):
            xw_t, m_t = step
            hr = jnp.dot(h, rT, precision=jax.lax.Precision.HIGHEST)  # [B,3H]
            if rb is not None:
                hr = hr + rb
            xz, xr, xh = jnp.split(xw_t, 3, axis=-1)  # zrh
            hz, hr_, hh = jnp.split(hr, 3, axis=-1)
            z = jax.nn.sigmoid(xz + hz)
            rgate = jax.nn.sigmoid(xr + hr_)
            if linear_before_reset:
                hcand = jnp.tanh(xh + rgate * hh)
            else:
                hh2 = jnp.dot(
                    rgate * h, rT[:, 2 * H :], precision=jax.lax.Precision.HIGHEST
                )
                if rb is not None:
                    hh2 = hh2 + rb[2 * H :]
                hcand = jnp.tanh(xh + hh2)
            h_new = (1 - z) * hcand + z * h
            keep = m_t[:, None]
            h_new = jnp.where(keep, h_new, h)
            y = jnp.where(keep, h_new, 0.0)
            return h_new, y

        h_fin, y = jax.lax.scan(cell, h_init, (xw, m))
        if reverse:
            y = jnp.flip(y, 0)
        ys.append(y)
        hs.append(h_fin)

    Y = jnp.stack(ys, axis=1)  # [T, dirs, B, H]
    Yh = jnp.stack(hs, axis=0)  # [dirs, B, H]
    if layout == 1:  # Y -> [B, T, dirs, H], Y_h -> [B, dirs, H]
        Y = jnp.transpose(Y, (2, 0, 1, 3))
        Yh = jnp.swapaxes(Yh, 0, 1)
    n_out = attrs.get("__n_outputs__", 1)
    outs = (Y, Yh)
    return outs[:n_out] if n_out > 1 else Y
