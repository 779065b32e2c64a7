"""Einsum (rten src/ops/einsum.rs:22).

The reference parses the equation and plans a sequence of matmul/reduce
calls; on TPU `jnp.einsum` does exactly that planning and XLA maps the
contractions onto the MXU, so the lowering is direct.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .registry import OpError, register


@register("Einsum")
def _einsum(ctx, inputs, attrs):
    equation = attrs.get("equation")
    if equation is None:
        raise OpError("Einsum requires an equation")
    if isinstance(equation, bytes):
        equation = equation.decode()
    args = [x for x in inputs if x is not None]
    precision = None
    if all(jnp.result_type(a) == jnp.float32 for a in args) and not (
        ctx is not None and ctx.config.prefer_bf16
    ):
        precision = jax.lax.Precision.HIGHEST
    return jnp.einsum(equation.replace(" ", ""), *args, precision=precision)
