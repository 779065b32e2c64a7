"""Operator registry: ONNX op name -> JAX lowering.

The reference dispatches each op at runtime through an `Operator` trait
object (rten `src/operator.rs:486`, `src/op_registry.rs:43`). Here, ops are
*lowering rules*: pure functions that consume traced jnp values and emit the
jnp expression for the op. The whole graph is traced once into a single XLA
computation, so there is no per-op dispatch at execution time.

Lowering signature::

    def lower(ctx, inputs, attrs): -> jnp array | tuple of arrays

* ``inputs`` is a list whose entries are jnp/np arrays, ``None`` (omitted
  optional input), or python lists (ONNX sequence values).
* Constant inputs arrive as *concrete* (non-tracer) arrays, so jnp ops on
  them evaluate eagerly during tracing — ops that need static values (e.g.
  Reshape's `shape` tensor) call :func:`static_value`, which succeeds
  whenever the input is constant-derived.
* ``ctx`` is the tracing context (subgraph execution for control flow, PRNG
  for random ops, kernel-selection config).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List

import jax
import numpy as np


class OpError(Exception):
    """Operator lowering failure; mirrors rten OpError (src/operator.rs:116)."""


@dataclasses.dataclass
class OpDef:
    name: str
    lower: Callable
    # Number of outputs is usually inferred from graph arity; lowering must
    # return a tuple when the op node declares >1 outputs.


REGISTRY: Dict[str, OpDef] = {}


def register(name: str):
    def deco(fn):
        REGISTRY[name] = OpDef(name=name, lower=fn)
        return fn

    return deco


def get_op(name: str) -> OpDef:
    op = REGISTRY.get(name)
    if op is None:
        raise OpError(f"operator '{name}' is not registered")
    return op


def is_tracer(x) -> bool:
    return isinstance(x, jax.core.Tracer)


def static_value(x, what: str = "input") -> np.ndarray:
    """Concrete numpy value of ``x``; fails if it is data-dependent.

    Shape-carrying inputs (Reshape shape, Slice starts, ...) must be known at
    trace time. After constant propagation this holds for real models; a
    failure here means a genuinely data-dependent shape, which XLA cannot
    compile statically.
    """
    if x is None:
        raise OpError(f"{what} is missing")
    if is_tracer(x):
        raise OpError(
            f"{what} must be statically known at trace time (data-dependent "
            f"shapes are not supported on TPU); run the optimizer's "
            f"constant-propagation pass or mark the driving input constant"
        )
    return np.asarray(x)


def opt_static(x, default=None):
    return default if x is None else static_value(x)


def get_input(inputs: List, i: int, name: str = "input"):
    if i >= len(inputs) or inputs[i] is None:
        raise OpError(f"missing required {name} (input {i})")
    return inputs[i]


def opt_input(inputs: List, i: int, default=None):
    if i >= len(inputs) or inputs[i] is None:
        return default
    return inputs[i]
