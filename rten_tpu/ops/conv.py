"""Convolution ops: Conv, ConvInteger, ConvTranspose.

Reference coverage: rten `src/ops/conv.rs` + `src/ops/conv/{im2col,depthwise}.rs`
and `conv_transpose.rs`. The reference lowers conv to a virtual-im2col GEMM;
on TPU the f32/bf16 path is `lax.conv_general_dilated` (XLA maps it onto the
MXU directly), and the integer path uses an explicit shifted-slice im2col +
int8 MXU dot so accumulation stays exact in int32 (float accumulation would
lose bits; TPU has no native int32 conv).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .registry import OpError, get_input, opt_input, register


def _resolve_pads(
    auto_pad: str,
    pads,
    in_spatial: Sequence[int],
    kernel: Sequence[int],
    strides: Sequence[int],
    dilations: Sequence[int],
) -> List[Tuple[int, int]]:
    ndim = len(in_spatial)
    if isinstance(auto_pad, bytes):
        auto_pad = auto_pad.decode()
    if auto_pad in ("NOTSET", "", None):
        if pads is None:
            pads = [0] * (2 * ndim)
        return [(int(pads[i]), int(pads[i + ndim])) for i in range(ndim)]
    if auto_pad == "VALID":
        return [(0, 0)] * ndim
    out = []
    for i in range(ndim):
        out_size = -(-in_spatial[i] // strides[i])
        eff_k = (kernel[i] - 1) * dilations[i] + 1
        total = max(0, (out_size - 1) * strides[i] + eff_k - in_spatial[i])
        if auto_pad == "SAME_UPPER":
            out.append((total // 2, total - total // 2))
        elif auto_pad == "SAME_LOWER":
            out.append((total - total // 2, total // 2))
        else:
            raise OpError(f"unsupported auto_pad {auto_pad}")
    return out


def _conv_params(x, w, attrs):
    n_spatial = x.ndim - 2
    strides = list(attrs.get("strides", [1] * n_spatial))
    dilations = list(attrs.get("dilations", [1] * n_spatial))
    kernel = list(w.shape[2:])
    pads = _resolve_pads(
        attrs.get("auto_pad", "NOTSET"),
        attrs.get("pads"),
        x.shape[2:],
        kernel,
        strides,
        dilations,
    )
    group = attrs.get("group", 1)
    return strides, dilations, pads, group


def _dim_numbers(n_spatial: int):
    sp = "".join(chr(ord("0") + i) for i in range(n_spatial))
    return jax.lax.conv_dimension_numbers(
        (1, 1) + (1,) * n_spatial,
        (1, 1) + (1,) * n_spatial,
        ("NC" + sp, "OI" + sp, "NC" + sp),
    )


@register("Conv")
def _conv(ctx, inputs, attrs):
    x = get_input(inputs, 0)
    w = get_input(inputs, 1, "weight")
    bias = opt_input(inputs, 2)
    strides, dilations, pads, group = _conv_params(x, w, attrs)
    is_float = jnp.issubdtype(jnp.result_type(x), jnp.floating)
    precision = None
    if jnp.result_type(x) == jnp.float32 and not (
        ctx is not None and ctx.config.prefer_bf16
    ):
        precision = jax.lax.Precision.HIGHEST
    out = jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=strides,
        padding=pads,
        rhs_dilation=dilations,
        dimension_numbers=_dim_numbers(x.ndim - 2),
        feature_group_count=group,
        precision=precision,
        preferred_element_type=jnp.float32 if is_float else jnp.int32,
    )
    if bias is not None:
        out = out + jnp.reshape(bias, (1, -1) + (1,) * (x.ndim - 2))
    return out.astype(jnp.result_type(x, w))


def _im2col_int(x, kernel, strides, dilations, pads, pad_value=0):
    """Shifted-slice im2col for integer convs.

    Returns patches [N, spatial_out..., C * prod(kernel)] in the input dtype
    so the contraction can run as a native int8 dot on the MXU with exact
    int32 accumulation (analog of rten's virtual Im2Col,
    `rten-gemm/src/im2col.rs:56`).

    ``pad_value`` is the input zero point: padding with it makes padded
    positions contribute exactly zero after the zero-point correction.
    """
    n_sp = x.ndim - 2
    pad_width = [(0, 0), (0, 0)] + [tuple(p) for p in pads]
    x = jnp.pad(x, pad_width, constant_values=jnp.asarray(pad_value, x.dtype))
    in_sp = x.shape[2:]
    out_sp = [
        (in_sp[i] - (kernel[i] - 1) * dilations[i] - 1) // strides[i] + 1
        for i in range(n_sp)
    ]
    pieces = []
    for kidx in np.ndindex(*kernel):
        slices = [slice(None), slice(None)]
        for i in range(n_sp):
            start = kidx[i] * dilations[i]
            stop = start + (out_sp[i] - 1) * strides[i] + 1
            slices.append(slice(start, stop, strides[i]))
        pieces.append(x[tuple(slices)])
    # [K_positions, N, C, out_sp...] -> [N, out_sp..., C*K]
    stacked = jnp.stack(pieces, axis=0)
    perm = (1,) + tuple(range(3, 3 + n_sp)) + (2, 0)
    stacked = jnp.transpose(stacked, perm)
    N = x.shape[0]
    C = x.shape[1]
    K = int(np.prod(kernel))
    return stacked.reshape((N, *out_sp, C * K)), out_sp


@register("ConvInteger")
def _conv_integer(ctx, inputs, attrs):
    x = get_input(inputs, 0)
    w = get_input(inputs, 1, "weight")
    x_zp = opt_input(inputs, 2)
    w_zp = opt_input(inputs, 3)
    return conv_integer_impl(x, w, x_zp, w_zp, attrs)


def conv_integer_impl(x, w, x_zp, w_zp, attrs):
    strides, dilations, pads, group = _conv_params(x, w, attrs)
    if group != 1:
        # Split into per-group convs (depthwise int8 is rare; keep simple).
        xg = jnp.split(x, group, axis=1)
        wg = jnp.split(w, group, axis=0)
        outs = [
            conv_integer_impl(a, b, x_zp, w_zp, {**attrs, "group": 1})
            for a, b in zip(xg, wg)
        ]
        return jnp.concatenate(outs, axis=1)

    kernel = list(w.shape[2:])
    patches, out_sp = _im2col_int(
        x, kernel, strides, dilations, pads, pad_value=x_zp if x_zp is not None else 0
    )
    N = x.shape[0]
    M = w.shape[0]
    CK = patches.shape[-1]
    a = patches.reshape(N, -1, CK)  # [N, P, CK]
    # Weight [M, C, k...] -> [CK, M]; im2col layout is (C outer, K inner).
    b = w.reshape(M, CK).T

    a32 = a.astype(jnp.int32)
    b32 = b.astype(jnp.int32)
    acc = jnp.matmul(a32, b32, preferred_element_type=jnp.int32)
    # Zero-point corrections (rten packing/int8.rs:19-46 algebra). Padded
    # positions hold x_zp, so (patch - x_zp) is exactly zero there.
    if x_zp is not None:
        xzp = jnp.asarray(x_zp, jnp.int32)
        col_sums = jnp.sum(b32, axis=0)  # [M]
        acc = acc - xzp * col_sums
    if w_zp is not None:
        wzp = jnp.asarray(w_zp, jnp.int32)
        row_sums = jnp.sum(a32, axis=-1, keepdims=True)  # [N, P, 1]
        acc = acc - row_sums * wzp
    if x_zp is not None and w_zp is not None:
        acc = acc + CK * jnp.asarray(x_zp, jnp.int32) * jnp.asarray(w_zp, jnp.int32)
    out = acc.reshape((N, *out_sp, M))
    # NHWC-ish -> NCHW
    perm = (0, out.ndim - 1) + tuple(range(1, out.ndim - 1))
    return jnp.transpose(out, perm)


@register("ConvIntegerToFloat")
def _conv_integer_to_float(ctx, inputs, attrs):
    # Fused ConvInteger + dequant (+bias), produced by the optimizer
    # (rten src/ops/conv.rs:552 / fusions ConvIntegerToFloat).
    x = get_input(inputs, 0)
    w = get_input(inputs, 1, "weight")
    x_scale = get_input(inputs, 2, "x_scale")
    w_scale = get_input(inputs, 3, "w_scale")
    x_zp = opt_input(inputs, 4)
    w_zp = opt_input(inputs, 5)
    bias = opt_input(inputs, 6)
    acc = conv_integer_impl(x, w, x_zp, w_zp, attrs)
    scale = jnp.asarray(x_scale, jnp.float32) * jnp.asarray(w_scale, jnp.float32)
    if jnp.ndim(scale) == 1:  # per-output-channel
        scale = jnp.reshape(scale, (1, -1) + (1,) * (acc.ndim - 2))
    out = acc.astype(jnp.float32) * scale
    if bias is not None:
        out = out + jnp.reshape(bias, (1, -1) + (1,) * (acc.ndim - 2))
    return out


@register("ConvTranspose")
def _conv_transpose(ctx, inputs, attrs):
    x = get_input(inputs, 0)
    w = get_input(inputs, 1, "weight")  # [C_in, C_out/group, k...]
    bias = opt_input(inputs, 2)
    n_sp = x.ndim - 2
    strides = list(attrs.get("strides", [1] * n_sp))
    dilations = list(attrs.get("dilations", [1] * n_sp))
    group = attrs.get("group", 1)
    kernel = list(w.shape[2:])
    output_padding = list(attrs.get("output_padding", [0] * n_sp))
    pads = attrs.get("pads")
    auto_pad = attrs.get("auto_pad", "NOTSET")
    output_shape = attrs.get("output_shape")

    if output_shape is not None:
        # Derive pads from requested output shape.
        pads_resolved = []
        for i in range(n_sp):
            eff_k = (kernel[i] - 1) * dilations[i] + 1
            total = (
                strides[i] * (x.shape[2 + i] - 1)
                + output_padding[i]
                + eff_k
                - output_shape[i]
            )
            total = max(total, 0)
            if auto_pad == "SAME_UPPER":
                pads_resolved.append((total // 2, total - total // 2))
            else:
                pads_resolved.append((total - total // 2, total // 2))
    else:
        if pads is None:
            pads_resolved = [(0, 0)] * n_sp
        else:
            pads_resolved = [(int(pads[i]), int(pads[i + n_sp])) for i in range(n_sp)]

    # ConvTranspose = lhs-dilated conv with flipped kernel.
    # ONNX weight is [C_in, C_out/group, k...]; conv rhs wants [O, I, k...].
    if group != 1:
        xg = jnp.split(x, group, axis=1)
        wg = jnp.split(w, group, axis=0)
        outs = []
        for a, b in zip(xg, wg):
            outs.append(
                _conv_transpose_single(
                    a, b, strides, dilations, pads_resolved, output_padding, n_sp
                )
            )
        out = jnp.concatenate(outs, axis=1)
    else:
        out = _conv_transpose_single(
            x, w, strides, dilations, pads_resolved, output_padding, n_sp
        )
    if bias is not None:
        out = out + jnp.reshape(bias, (1, -1) + (1,) * n_sp)
    return out


def _conv_transpose_single(x, w, strides, dilations, pads, output_padding, n_sp):
    kernel = list(w.shape[2:])
    w_flip = jnp.flip(w, axis=tuple(range(2, 2 + n_sp)))
    w_oihw = jnp.swapaxes(w_flip, 0, 1)  # [C_out, C_in, k...]
    conv_pads = []
    for i in range(n_sp):
        eff_k = (kernel[i] - 1) * dilations[i] + 1
        lo = eff_k - 1 - pads[i][0]
        hi = eff_k - 1 - pads[i][1] + output_padding[i]
        conv_pads.append((lo, hi))
    return jax.lax.conv_general_dilated(
        x,
        w_oihw.astype(x.dtype),
        window_strides=[1] * n_sp,
        padding=conv_pads,
        lhs_dilation=strides,
        rhs_dilation=dilations,
        dimension_numbers=_dim_numbers(n_sp),
    )
