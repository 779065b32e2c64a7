"""Table-driven coverage for op families without dedicated suites:
layout/pad/scatter/gather/reduce/quantize/etc. vs numpy/torch goldens
(the rten-testing TestCases style, SURVEY.md section 4)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from util import assert_close, run_op

RNG = np.random.default_rng(33)


# --- layout ---------------------------------------------------------------

def test_pad_modes():
    x = RNG.standard_normal((2, 3, 4)).astype(np.float32)
    pads = np.int64([0, 1, 1, 0, 1, 2])  # [starts..., ends...]
    np_pads = [(0, 0), (1, 1), (1, 2)]
    for mode, np_mode in (("constant", "constant"), ("reflect", "reflect"),
                          ("edge", "edge")):
        want = np.pad(x, np_pads, mode=np_mode)
        got = run_op("Pad", [x, pads], {"mode": mode}, const_mask=[False, True])
        assert_close(got, want, msg=mode)


def test_pad_constant_value():
    x = np.ones((2, 2), np.float32)
    got = run_op(
        "Pad", [x, np.int64([1, 0, 0, 1]), np.float32(5.0)],
        const_mask=[False, True, True],
    )
    assert got.shape == (3, 3)
    assert got[0, 0] == 5.0 and got[2, 2] == 5.0


def test_depth_space_roundtrip():
    x = RNG.standard_normal((1, 12, 4, 6)).astype(np.float32)
    d = run_op("DepthToSpace", [x], {"blocksize": 2, "mode": "DCR"})
    assert d.shape == (1, 3, 8, 12)
    want = F.pixel_shuffle(torch.from_numpy(x), 2).numpy()
    # CRD mode matches pixel_shuffle
    d_crd = run_op("DepthToSpace", [x], {"blocksize": 2, "mode": "CRD"})
    assert_close(d_crd, want)
    back = run_op("SpaceToDepth", [d], {"blocksize": 2})
    assert_close(back, x)


def test_tile_expand_slice():
    x = RNG.standard_normal((2, 3)).astype(np.float32)
    got = run_op("Tile", [x, np.int64([2, 3])], const_mask=[False, True])
    assert_close(got, np.tile(x, (2, 3)))
    got = run_op("Expand", [x[:, None], np.int64([2, 4, 3])], const_mask=[False, True])
    assert got.shape == (2, 4, 3)
    got = run_op(
        "Slice",
        [x, np.int64([0, 1]), np.int64([2, 3]), np.int64([0, 1]), np.int64([1, 1])],
        const_mask=[False, True, True, True, True],
    )
    assert_close(got, x[0:2, 1:3])
    # negative step
    got = run_op(
        "Slice", [x, np.int64([2]), np.int64([-100]), np.int64([1]), np.int64([-1])],
        const_mask=[False, True, True, True, True],
    )
    assert_close(got, x[:, 2::-1])


def test_trilu_onehot_reverse():
    x = RNG.standard_normal((4, 4)).astype(np.float32)
    assert_close(run_op("Trilu", [x], {"upper": 1}), np.triu(x))
    assert_close(
        run_op("Trilu", [x, np.int64(1)], {"upper": 0}, const_mask=[False, True]),
        np.tril(x, 1),
    )
    idx = np.int32([0, 2, 1])
    got = run_op(
        "OneHot", [idx, np.int64(3), np.float32([0, 1])],
        {"axis": -1}, const_mask=[False, True, True],
    )
    assert_close(got, np.eye(3, dtype=np.float32)[idx])
    x2 = np.arange(12, dtype=np.float32).reshape(3, 4)
    want = x2.copy()
    want[0, :3] = x2[0, 2::-1]
    want[1, :2] = x2[1, 1::-1]
    got = run_op(
        "ReverseSequence", [x2, np.int32([3, 2, 1])],
        {"batch_axis": 0, "time_axis": 1}, const_mask=[False, True],
    )
    assert_close(got[0, :3], x2[0, 2::-1])
    assert_close(got[2], x2[2])


# --- gather/scatter -------------------------------------------------------

def test_gather_elements_nd():
    x = RNG.standard_normal((3, 4)).astype(np.float32)
    idx = RNG.integers(0, 3, (2, 4)).astype(np.int64)
    want = torch.gather(torch.from_numpy(x), 0, torch.from_numpy(idx)).numpy()
    got = run_op("GatherElements", [x, idx], {"axis": 0})
    assert_close(got, want)

    data = RNG.standard_normal((2, 3, 4)).astype(np.float32)
    indices = np.int64([[0, 1], [1, 2]])  # -> gathers data[0,1], data[1,2]
    got = run_op("GatherND", [data, indices])
    assert_close(got, np.stack([data[0, 1], data[1, 2]]))


def test_scatter_elements_nd():
    x = np.zeros((3, 4), np.float32)
    idx = np.int64([[0, 2]])
    upd = np.float32([[5, 7]])
    got = run_op("ScatterElements", [x, idx, upd], {"axis": 1})
    want = x.copy()
    want[0, 0], want[0, 2] = 5, 7
    assert_close(got, want)
    # reduction=add
    got = run_op(
        "ScatterElements", [np.ones((3, 4), np.float32), idx, upd],
        {"axis": 1, "reduction": "add"},
    )
    assert got[0, 0] == 6 and got[0, 2] == 8

    data = np.zeros((2, 3), np.float32)
    indices = np.int64([[0, 1], [1, 2]])
    updates = np.float32([9, 8])
    got = run_op("ScatterND", [data, indices, updates])
    assert got[0, 1] == 9 and got[1, 2] == 8


# --- reduce / misc math ---------------------------------------------------

@pytest.mark.parametrize(
    "op,np_fn",
    [
        ("ReduceSum", np.sum), ("ReduceMean", np.mean), ("ReduceMax", np.max),
        ("ReduceMin", np.min), ("ReduceProd", np.prod),
        ("ReduceL1", lambda a, axis, keepdims: np.sum(np.abs(a), axis=axis, keepdims=keepdims)),
        ("ReduceL2", lambda a, axis, keepdims: np.sqrt(np.sum(a * a, axis=axis, keepdims=keepdims))),
        ("ReduceSumSquare", lambda a, axis, keepdims: np.sum(a * a, axis=axis, keepdims=keepdims)),
        ("ReduceLogSum", lambda a, axis, keepdims: np.log(np.sum(a, axis=axis, keepdims=keepdims))),
    ],
)
def test_reduces(op, np_fn):
    x = (RNG.random((2, 3, 4)) + 0.5).astype(np.float32)
    for axes, keepdims in (([1], 1), ([0, 2], 0), (None, 1)):
        want = np_fn(x, axis=tuple(axes) if axes else None, keepdims=bool(keepdims))
        if axes is None:
            got = run_op(op, [x], {"keepdims": keepdims})
        else:
            got = run_op(
                op, [x, np.int64(axes)], {"keepdims": keepdims},
                const_mask=[False, True],
            )
        assert_close(got, np.asarray(want, np.float32), rtol=1e-4, atol=1e-5,
                     msg=f"{op} axes={axes}")


def test_cumsum_topk_argminmax():
    x = RNG.standard_normal((3, 5)).astype(np.float32)
    got = run_op("CumSum", [x, np.int32(1)], const_mask=[False, True])
    assert_close(got, np.cumsum(x, 1), rtol=1e-5, atol=1e-5)
    got = run_op("CumSum", [x, np.int32(0)], {"exclusive": 1}, const_mask=[False, True])
    want = np.cumsum(x, 0) - x
    assert_close(got, want, rtol=1e-5, atol=1e-5)

    vals, idxs = run_op(
        "TopK", [x, np.int64([3])], {"axis": -1}, n_outputs=2, const_mask=[False, True]
    )
    tv, ti = torch.topk(torch.from_numpy(x), 3, dim=-1)
    assert_close(vals, tv.numpy())
    np.testing.assert_array_equal(idxs, ti.numpy().astype(idxs.dtype))

    assert_close(run_op("ArgMax", [x], {"axis": 1, "keepdims": 0}),
                 np.argmax(x, 1).astype(np.int32))
    assert_close(run_op("ArgMin", [x], {"axis": 0, "keepdims": 1}),
                 np.argmin(x, 0)[None].astype(np.int32))


def test_nonzero_and_compress_style():
    x = np.asarray([[1, 0], [0, 3]], np.float32)
    got = run_op("NonZero", [x], const_mask=[True])
    want = np.stack(np.nonzero(x))
    np.testing.assert_array_equal(got, want.astype(got.dtype))


# --- norm family ----------------------------------------------------------

def test_norms_vs_torch():
    x = RNG.standard_normal((2, 6, 5)).astype(np.float32)
    w = RNG.standard_normal((6,)).astype(np.float32) + 1
    b = RNG.standard_normal((6,)).astype(np.float32)
    mean = RNG.standard_normal((6,)).astype(np.float32)
    var = (RNG.random(6) + 0.5).astype(np.float32)
    want = F.batch_norm(
        torch.from_numpy(x), torch.from_numpy(mean), torch.from_numpy(var),
        torch.from_numpy(w), torch.from_numpy(b), eps=1e-5,
    ).numpy()
    got = run_op("BatchNormalization", [x, w, b, mean, var], {"epsilon": 1e-5})
    assert_close(got, want, rtol=1e-4, atol=1e-5)

    want = F.instance_norm(
        torch.from_numpy(x), weight=torch.from_numpy(w), bias=torch.from_numpy(b)
    ).numpy()
    got = run_op("InstanceNormalization", [x, w, b], {"epsilon": 1e-5})
    assert_close(got, want, rtol=1e-4, atol=1e-4)

    g = RNG.standard_normal((5,)).astype(np.float32)
    want = (torch.from_numpy(x) * torch.rsqrt(
        torch.from_numpy(x).pow(2).mean(-1, keepdim=True) + 1e-6
    ) * torch.from_numpy(g)).numpy()
    got = run_op("RMSNormalization", [x, g], {"epsilon": 1e-6, "axis": -1})
    assert_close(got, want, rtol=1e-4, atol=1e-5)


# --- quantize family ------------------------------------------------------

def test_quantize_dequantize_linear():
    x = RNG.standard_normal((4, 6)).astype(np.float32) * 3
    scale = np.float32(0.05)
    zp = np.uint8(128)
    q = run_op("QuantizeLinear", [x, scale, zp])
    assert q.dtype == np.uint8
    want_q = np.clip(np.round(x / 0.05) + 128, 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(q, want_q)
    deq = run_op("DequantizeLinear", [q, scale, zp])
    assert_close(deq, (want_q.astype(np.int32) - 128) * 0.05, rtol=1e-6, atol=1e-6)

    # per-channel (axis=1) with zero points placing the ranges around 0
    scales = np.float32([0.1, 0.2, 0.1, 0.05, 0.3, 0.2])
    zps = np.full(6, 128, np.uint8)
    q = run_op("QuantizeLinear", [x, scales, zps], {"axis": 1})
    deq = run_op("DequantizeLinear", [q, scales, zps], {"axis": 1})
    # Exact within half a step wherever the range is representable;
    # saturated entries clip exactly like ONNX requires.
    rep = np.abs(x / scales[None, :]) <= 127
    assert np.abs((deq - x) * rep).max() <= scales.max() * 0.51 + 1e-6


def test_dynamic_quantize_linear():
    x = RNG.standard_normal((3, 8)).astype(np.float32)
    q, scale, zp = run_op("DynamicQuantizeLinear", [x], n_outputs=3)
    assert q.dtype == np.uint8
    recon = (q.astype(np.float32) - float(zp)) * float(scale)
    assert np.abs(recon - x).max() < float(scale) * 1.01
