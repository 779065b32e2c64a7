"""MatMul/Gemm/quantized-matmul and Conv/Pool correctness vs torch."""

import numpy as np
import pytest
import torch

from util import assert_close, run_op

RNG = np.random.default_rng(1)


def test_matmul_2d():
    a = RNG.standard_normal((5, 8)).astype(np.float32)
    b = RNG.standard_normal((8, 3)).astype(np.float32)
    assert_close(run_op("MatMul", [a, b]), a @ b, rtol=1e-5)


def test_matmul_batched_broadcast():
    a = RNG.standard_normal((2, 4, 5, 8)).astype(np.float32)
    b = RNG.standard_normal((4, 8, 3)).astype(np.float32)
    assert_close(run_op("MatMul", [a, b]), np.matmul(a, b), rtol=1e-4)


def test_matmul_vec():
    a = RNG.standard_normal((8,)).astype(np.float32)
    b = RNG.standard_normal((8, 3)).astype(np.float32)
    assert_close(run_op("MatMul", [a, b]), a @ b, rtol=1e-5)


@pytest.mark.parametrize("transA", [0, 1])
@pytest.mark.parametrize("transB", [0, 1])
def test_gemm(transA, transB):
    a = RNG.standard_normal((5, 8)).astype(np.float32)
    b = RNG.standard_normal((8, 3)).astype(np.float32)
    c = RNG.standard_normal((3,)).astype(np.float32)
    ax = a.T if transA else a
    bx = b.T if transB else b
    got = run_op("Gemm", [ax, bx, c], {"alpha": 0.5, "beta": 2.0, "transA": transA, "transB": transB})
    assert_close(got, 0.5 * a @ b + 2.0 * c, rtol=1e-4)


def test_matmul_integer():
    a = RNG.integers(0, 255, (6, 16)).astype(np.uint8)
    b = RNG.integers(-127, 127, (16, 5)).astype(np.int8)
    a_zp = np.uint8(113)
    b_zp = np.int8(-10)
    expected = (a.astype(np.int32) - 113) @ (b.astype(np.int32) + 10)
    assert_close(run_op("MatMulInteger", [a, b, a_zp, b_zp]), expected)
    # Without zero points
    expected2 = a.astype(np.int32) @ b.astype(np.int32)
    assert_close(run_op("MatMulInteger", [a, b]), expected2)


def test_matmul_integer_per_channel_zp():
    a = RNG.integers(0, 255, (4, 8)).astype(np.uint8)
    b = RNG.integers(-127, 127, (8, 6)).astype(np.int8)
    a_zp = RNG.integers(0, 255, (4,)).astype(np.uint8)  # per-row
    b_zp = RNG.integers(-20, 20, (6,)).astype(np.int8)  # per-col
    expected = (a.astype(np.int32) - a_zp[:, None].astype(np.int32)) @ (
        b.astype(np.int32) - b_zp[None, :].astype(np.int32)
    )
    assert_close(run_op("MatMulInteger", [a, b, a_zp, b_zp]), expected)


def test_matmul_integer_to_float():
    a = RNG.integers(0, 255, (6, 16)).astype(np.uint8)
    b = RNG.integers(-127, 127, (16, 5)).astype(np.int8)
    a_scale = np.float32(0.02)
    b_scale = np.float32(0.01)
    a_zp = np.uint8(128)
    b_zp = np.int8(0)
    bias = RNG.standard_normal((5,)).astype(np.float32)
    acc = (a.astype(np.int32) - 128) @ b.astype(np.int32)
    expected = acc.astype(np.float32) * 0.0002 + bias
    got = run_op(
        "MatMulIntegerToFloat", [a, b, a_scale, b_scale, a_zp, b_zp, bias]
    )
    assert_close(got, expected, rtol=1e-4)


def test_matmul_nbits():
    # Pack int4 weights: N=4 outputs, K=64, block_size=32.
    N, K, bs = 4, 64, 32
    n_blocks = K // bs
    w_q = RNG.integers(0, 16, (N, K)).astype(np.uint8)
    scales = RNG.uniform(0.01, 0.1, (N, n_blocks)).astype(np.float32)
    packed = (w_q[:, 0::2] | (w_q[:, 1::2] << 4)).reshape(N, n_blocks, bs // 2)
    w_deq = (w_q.astype(np.float32).reshape(N, n_blocks, bs) - 8.0) * scales[..., None]
    w_deq = w_deq.reshape(N, K)
    a = RNG.standard_normal((3, K)).astype(np.float32)
    expected = a @ w_deq.T
    got = run_op(
        "MatMulNBits",
        [a, packed, scales],
        {"K": K, "N": N, "bits": 4, "block_size": bs},
        const_mask=[False, True, True],
    )
    assert_close(got, expected, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize(
    "cfg",
    [
        dict(in_ch=3, out_ch=8, k=3, stride=1, pad=0, dil=1, groups=1),
        dict(in_ch=4, out_ch=8, k=3, stride=2, pad=1, dil=1, groups=1),
        dict(in_ch=6, out_ch=6, k=3, stride=1, pad=1, dil=1, groups=6),  # depthwise
        dict(in_ch=4, out_ch=8, k=1, stride=1, pad=0, dil=1, groups=1),  # pointwise
        dict(in_ch=3, out_ch=5, k=3, stride=1, pad=2, dil=2, groups=1),  # dilated
        dict(in_ch=4, out_ch=4, k=2, stride=1, pad=(1, 0, 0, 1), dil=1, groups=2),
    ],
    ids=["basic", "strided", "depthwise", "1x1", "dilated", "uneven-pad-grouped"],
)
def test_conv2d(cfg):
    x = RNG.standard_normal((2, cfg["in_ch"], 9, 9)).astype(np.float32)
    w = RNG.standard_normal(
        (cfg["out_ch"], cfg["in_ch"] // cfg["groups"], cfg["k"], cfg["k"])
    ).astype(np.float32)
    b = RNG.standard_normal((cfg["out_ch"],)).astype(np.float32)
    pad = cfg["pad"]
    pads = [pad] * 4 if isinstance(pad, int) else list(pad)  # [t,l,b,r]
    expected = torch.nn.functional.conv2d(
        torch.from_numpy(np.pad(x, ((0, 0), (0, 0), (pads[0], pads[2]), (pads[1], pads[3])))),
        torch.from_numpy(w),
        torch.from_numpy(b),
        stride=cfg["stride"],
        dilation=cfg["dil"],
        groups=cfg["groups"],
    ).numpy()
    got = run_op(
        "Conv",
        [x, w, b],
        {
            "strides": [cfg["stride"]] * 2,
            "pads": pads,
            "dilations": [cfg["dil"]] * 2,
            "group": cfg["groups"],
        },
    )
    assert_close(got, expected, rtol=1e-3, atol=1e-4)


def test_conv1d():
    x = RNG.standard_normal((2, 4, 12)).astype(np.float32)
    w = RNG.standard_normal((6, 4, 3)).astype(np.float32)
    expected = torch.nn.functional.conv1d(
        torch.from_numpy(x), torch.from_numpy(w), padding=1
    ).numpy()
    got = run_op("Conv", [x, w], {"pads": [1, 1]})
    assert_close(got, expected, rtol=1e-3, atol=1e-4)


def test_conv_same_upper():
    x = RNG.standard_normal((1, 3, 7, 7)).astype(np.float32)
    w = RNG.standard_normal((4, 3, 3, 3)).astype(np.float32)
    got = run_op("Conv", [x, w], {"auto_pad": "SAME_UPPER", "strides": [2, 2]})
    assert got.shape == (1, 4, 4, 4)


def test_conv_integer():
    x = RNG.integers(0, 255, (1, 3, 6, 6)).astype(np.uint8)
    w = RNG.integers(-127, 127, (4, 3, 3, 3)).astype(np.int8)
    x_zp = np.uint8(120)
    w_zp = np.int8(3)
    expected = torch.nn.functional.conv2d(
        torch.from_numpy(x.astype(np.float32) - 120.0),
        torch.from_numpy(w.astype(np.float32) - 3.0),
        padding=1,
    ).numpy().astype(np.int32)
    got = run_op("ConvInteger", [x, w, x_zp, w_zp], {"pads": [1, 1, 1, 1]})
    assert_close(got, expected)


def test_conv_transpose():
    x = RNG.standard_normal((1, 4, 5, 5)).astype(np.float32)
    w = RNG.standard_normal((4, 6, 3, 3)).astype(np.float32)  # [C_in, C_out, k, k]
    expected = torch.nn.functional.conv_transpose2d(
        torch.from_numpy(x), torch.from_numpy(w), stride=2, padding=1, output_padding=1
    ).numpy()
    got = run_op(
        "ConvTranspose",
        [x, w],
        {"strides": [2, 2], "pads": [1, 1, 1, 1], "output_padding": [1, 1]},
    )
    assert_close(got, expected, rtol=1e-3, atol=1e-4)


def test_maxpool_avgpool():
    x = RNG.standard_normal((2, 3, 8, 8)).astype(np.float32)
    t = torch.from_numpy(x)
    assert_close(
        run_op("MaxPool", [x], {"kernel_shape": [2, 2], "strides": [2, 2]}),
        torch.nn.functional.max_pool2d(t, 2).numpy(),
    )
    assert_close(
        run_op(
            "MaxPool",
            [x],
            {"kernel_shape": [3, 3], "strides": [2, 2], "pads": [1, 1, 1, 1]},
        ),
        torch.nn.functional.max_pool2d(t, 3, 2, padding=1).numpy(),
    )
    assert_close(
        run_op("AveragePool", [x], {"kernel_shape": [2, 2], "strides": [2, 2]}),
        torch.nn.functional.avg_pool2d(t, 2).numpy(),
        rtol=1e-5,
    )
    # count_include_pad=0 (ONNX default) with padding
    assert_close(
        run_op(
            "AveragePool",
            [x],
            {"kernel_shape": [3, 3], "strides": [1, 1], "pads": [1, 1, 1, 1]},
        ),
        torch.nn.functional.avg_pool2d(t, 3, 1, padding=1, count_include_pad=False).numpy(),
        rtol=1e-5,
    )


def test_maxpool_ceil_mode():
    x = RNG.standard_normal((1, 1, 7, 7)).astype(np.float32)
    got = run_op(
        "MaxPool",
        [x],
        {"kernel_shape": [2, 2], "strides": [2, 2], "ceil_mode": 1},
    )
    expected = torch.nn.functional.max_pool2d(
        torch.from_numpy(x), 2, 2, ceil_mode=True
    ).numpy()
    assert_close(got, expected)


def test_global_pools():
    x = RNG.standard_normal((2, 3, 5, 5)).astype(np.float32)
    assert_close(
        run_op("GlobalAveragePool", [x]), x.mean(axis=(2, 3), keepdims=True), rtol=1e-5
    )
    assert_close(run_op("GlobalMaxPool", [x]), x.max(axis=(2, 3), keepdims=True))
