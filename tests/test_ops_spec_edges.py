"""ONNX spec edge cases for elementwise/misc ops."""

import numpy as np
import pytest
import torch

from util import assert_close, run_op

RNG = np.random.default_rng(41)


def test_mod_int_and_fmod():
    a = np.int32([-7, 7, -7, 7])
    b = np.int32([3, -3, -3, 3])
    # default (integer mod): sign follows divisor (python %)
    assert_close(run_op("Mod", [a, b]), np.mod(a, b))
    # fmod=1: sign follows dividend (C fmod)
    got = run_op("Mod", [a, b], {"fmod": 1})
    assert_close(got, np.fmod(a, b))
    af = np.float32([-5.5, 5.5])
    bf = np.float32([2.0, -2.0])
    assert_close(run_op("Mod", [af, bf], {"fmod": 1}), np.fmod(af, bf))


def test_clip_partial_bounds():
    x = np.float32([-5, -1, 0, 1, 5])
    assert_close(run_op("Clip", [x, np.float32(-2)]), np.clip(x, -2, None))
    assert_close(run_op("Clip", [x, None, np.float32(2)]), np.clip(x, None, 2))
    assert_close(run_op("Clip", [x]), x)


def test_pow_broadcast_and_integer_exponent():
    a = RNG.random((3, 4)).astype(np.float32) + 0.5
    b = np.int32(2)
    got = run_op("Pow", [a, b])
    assert_close(got, a ** 2, rtol=1e-5)
    got = run_op("Pow", [a, np.float32([2.0, 0.5, 1.0, 3.0])])
    assert_close(got, a ** np.float32([2.0, 0.5, 1.0, 3.0]), rtol=1e-5)


def test_cast_like():
    x = np.float32([1.7, -2.3])
    target = np.int32([0])
    got = run_op("CastLike", [x, target])
    assert got.dtype == np.int32
    np.testing.assert_array_equal(got, np.int32([1, -2]))


def test_einsum_forms():
    a = RNG.standard_normal((4, 4)).astype(np.float32)
    b = RNG.standard_normal((4, 5)).astype(np.float32)
    assert_close(run_op("Einsum", [a], {"equation": "ii->i"}), np.diag(a), rtol=1e-5)
    assert_close(run_op("Einsum", [a], {"equation": "ij->ji"}), a.T)
    assert_close(run_op("Einsum", [a], {"equation": "ij->"}), a.sum(), rtol=1e-5, atol=1e-5)
    assert_close(
        run_op("Einsum", [a, b], {"equation": "ij, jk -> ik"}), a @ b, rtol=1e-4, atol=1e-5
    )


def test_where_and_expand_broadcast():
    c = np.asarray([[True], [False]])
    a = np.float32([[1, 2]])
    b = np.float32(9)
    got = run_op("Where", [c, a, b])
    assert_close(got, np.where(c, a, b))


def test_concat_negative_axis_and_empty():
    a = RNG.standard_normal((2, 3)).astype(np.float32)
    b = RNG.standard_normal((2, 0)).astype(np.float32)
    got = run_op("Concat", [a, b], {"axis": -1})
    assert_close(got, a)


def test_gemm_c_broadcast_shapes():
    a = RNG.standard_normal((4, 6)).astype(np.float32)
    b = RNG.standard_normal((6, 3)).astype(np.float32)
    for c in (np.float32(0.5), RNG.standard_normal((1, 3)).astype(np.float32),
              RNG.standard_normal((4, 1)).astype(np.float32)):
        got = run_op("Gemm", [a, b, c], {"alpha": 1.0, "beta": 1.0})
        assert_close(got, a @ b + c, rtol=1e-4, atol=1e-5)


def test_argmax_select_last_index():
    x = np.float32([[1, 3, 3, 2]])
    assert int(run_op("ArgMax", [x], {"axis": 1, "keepdims": 0})[0]) == 1
    got = run_op("ArgMax", [x], {"axis": 1, "keepdims": 0, "select_last_index": 1})
    assert int(got[0]) == 2
