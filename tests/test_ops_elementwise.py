"""Elementwise op correctness vs numpy/scipy references."""

import numpy as np
import pytest

from util import assert_close, run_op

RNG = np.random.default_rng(0)
X = RNG.standard_normal((3, 5)).astype(np.float32)
XP = np.abs(X) + 0.1  # positive
X01 = RNG.uniform(0.2, 0.8, (3, 5)).astype(np.float32)  # in (0,1)

UNARY_CASES = [
    ("Abs", X, np.abs),
    ("Acos", X01, np.arccos),
    ("Acosh", XP + 1.0, np.arccosh),
    ("Asin", X01, np.arcsin),
    ("Asinh", X, np.arcsinh),  # XLA asinh differs from numpy by ~2e-4 rel
    ("Atan", X, np.arctan),
    ("Atanh", X01, np.arctanh),
    ("Ceil", X * 3, np.ceil),
    ("Cos", X, np.cos),
    ("Cosh", X, np.cosh),
    ("Exp", X, np.exp),
    ("Floor", X * 3, np.floor),
    ("Log", XP, np.log),
    ("Neg", X, np.negative),
    ("Reciprocal", XP, lambda v: 1.0 / v),
    ("Relu", X, lambda v: np.maximum(v, 0)),
    ("Round", X * 3, np.round),
    ("Sign", X, np.sign),
    ("Sin", X, np.sin),
    ("Sinh", X, np.sinh),
    ("Sqrt", XP, np.sqrt),
    ("Tan", X01, np.tan),
    ("Tanh", X, np.tanh),
    ("Sigmoid", X, lambda v: 1 / (1 + np.exp(-v))),
    ("Softplus", X, lambda v: np.log1p(np.exp(v))),
    ("Erf", X, None),  # vs torch below
]


@pytest.mark.parametrize("name,x,ref", UNARY_CASES, ids=[c[0] for c in UNARY_CASES])
def test_unary(name, x, ref):
    if ref is None:
        import torch

        ref_val = getattr(torch, name.lower())(torch.from_numpy(x)).numpy()
    else:
        ref_val = ref(x)
    assert_close(run_op(name, [x]), ref_val, rtol=5e-4, atol=1e-5, msg=name)


BINARY_CASES = [
    ("Add", np.add),
    ("Sub", np.subtract),
    ("Mul", np.multiply),
    ("Div", np.divide),
    ("Pow", lambda a, b: np.power(np.abs(a) + 0.1, b)),
]


@pytest.mark.parametrize("name,ref", BINARY_CASES, ids=[c[0] for c in BINARY_CASES])
def test_binary_broadcast(name, ref):
    a = RNG.standard_normal((3, 1, 5)).astype(np.float32)
    b = RNG.standard_normal((4, 5)).astype(np.float32)
    if name == "Pow":
        a = np.abs(a) + 0.1
        ref = np.power
    assert_close(run_op(name, [a, b]), ref(a, b), rtol=1e-4, msg=name)


def test_int_div_truncates_toward_zero():
    a = np.array([7, -7, 7, -7], dtype=np.int32)
    b = np.array([2, 2, -2, -2], dtype=np.int32)
    assert_close(run_op("Div", [a, b]), np.array([3, -3, -3, 3], dtype=np.int32))


def test_mod():
    a = np.array([5.1, -5.1, 5.1, -5.1], dtype=np.float32)
    b = np.array([3.0, 3.0, -3.0, -3.0], dtype=np.float32)
    assert_close(run_op("Mod", [a, b], {"fmod": 1}), np.fmod(a, b), rtol=1e-5)
    ai = np.array([5, -5, 5, -5], dtype=np.int32)
    bi = np.array([3, 3, -3, -3], dtype=np.int32)
    assert_close(run_op("Mod", [ai, bi]), np.mod(ai, bi))


def test_comparison_and_logic():
    a = RNG.standard_normal((4, 4)).astype(np.float32)
    b = RNG.standard_normal((4, 4)).astype(np.float32)
    assert_close(run_op("Greater", [a, b]), a > b)
    assert_close(run_op("Less", [a, b]), a < b)
    assert_close(run_op("GreaterOrEqual", [a, b]), a >= b)
    assert_close(run_op("LessOrEqual", [a, b]), a <= b)
    assert_close(run_op("Equal", [a, a]), np.ones_like(a, dtype=bool))
    t = a > 0
    u = b > 0
    assert_close(run_op("And", [t, u]), t & u)
    assert_close(run_op("Or", [t, u]), t | u)
    assert_close(run_op("Xor", [t, u]), t ^ u)
    assert_close(run_op("Not", [t]), ~t)


def test_clip():
    x = RNG.standard_normal((4, 4)).astype(np.float32) * 3
    lo = np.float32(-1.0)
    hi = np.float32(2.0)
    assert_close(run_op("Clip", [x, lo, hi]), np.clip(x, -1, 2))
    assert_close(run_op("Clip", [x, None, hi]), np.clip(x, None, 2))
    assert_close(run_op("Clip", [x], {"min": -1.0, "max": 2.0}), np.clip(x, -1, 2))


def test_activations_vs_torch():
    import torch

    x = np.random.default_rng(7).standard_normal((4, 8)).astype(np.float32)
    t = torch.from_numpy(x)
    assert_close(run_op("Gelu", [x]), torch.nn.functional.gelu(t).numpy(), rtol=1e-4)
    assert_close(
        run_op("Gelu", [x], {"approximate": "tanh"}),
        torch.nn.functional.gelu(t, approximate="tanh").numpy(),
        rtol=1e-4,
    )
    assert_close(run_op("Elu", [x], {"alpha": 1.0}), torch.nn.functional.elu(t).numpy(), rtol=1e-4)
    assert_close(
        run_op("LeakyRelu", [x], {"alpha": 0.1}),
        torch.nn.functional.leaky_relu(t, 0.1).numpy(),
        rtol=1e-5,
    )
    assert_close(
        run_op("HardSigmoid", [x], {"alpha": 1 / 6, "beta": 0.5}),
        torch.nn.functional.hardsigmoid(t).numpy(),
        rtol=1e-4, atol=1e-6,
    )
    assert_close(run_op("HardSwish", [x]), torch.nn.functional.hardswish(t).numpy(), rtol=1e-4, atol=1e-6)
    assert_close(run_op("Silu", [x]), torch.nn.functional.silu(t).numpy(), rtol=1e-5)
    slope = np.array([0.25], dtype=np.float32)
    assert_close(
        run_op("PRelu", [x, slope]),
        torch.nn.functional.prelu(t, torch.tensor([0.25])).numpy(),
        rtol=1e-5,
    )


def test_variadic():
    a, b, c = [RNG.standard_normal((2, 3)).astype(np.float32) for _ in range(3)]
    assert_close(run_op("Sum", [a, b, c]), a + b + c, rtol=1e-5)
    assert_close(run_op("Mean", [a, b, c]), (a + b + c) / 3, rtol=1e-5)
    assert_close(run_op("Max", [a, b, c]), np.maximum(np.maximum(a, b), c))
    assert_close(run_op("Min", [a, b, c]), np.minimum(np.minimum(a, b), c))


def test_where_isnan_isinf():
    x = np.array([1.0, np.nan, np.inf, -np.inf], dtype=np.float32)
    assert_close(run_op("IsNaN", [x]), np.isnan(x))
    assert_close(run_op("IsInf", [x]), np.isinf(x))
    assert_close(run_op("IsInf", [x], {"detect_negative": 0}), x == np.inf)
    cond = np.array([True, False, True, False])
    a = np.ones(4, dtype=np.float32)
    b = np.zeros(4, dtype=np.float32)
    assert_close(run_op("Where", [cond, a, b]), np.where(cond, a, b))
