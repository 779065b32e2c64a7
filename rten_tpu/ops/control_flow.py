"""Control flow: If, Loop.

Reference: rten `src/ops/control_flow.rs` (If/Loop as SubgraphOperators with
name-based captures, src/graph.rs:212-219). On TPU, data-dependent control
flow must become `lax.cond` / unrolled traces:

* If with a *concrete* condition (constant-folded) traces only the taken
  branch. A traced condition lowers to `lax.cond` (both branches must
  produce matching shapes/dtypes, an XLA constraint the reference doesn't
  have).
* Loop with a concrete trip count and no early-exit condition unrolls at
  trace time (each iteration may change shapes, like the reference's
  interpreter). Data-dependent trip counts/conditions lower to
  `lax.while_loop` when there are no scan outputs (shapes must be static).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .registry import OpError, get_input, is_tracer, opt_input, register


@register("If")
def _if(ctx, inputs, attrs):
    cond = get_input(inputs, 0, "cond")
    then_g = attrs.get("then_branch")
    else_g = attrs.get("else_branch")
    if then_g is None or else_g is None:
        raise OpError("If requires then_branch and else_branch subgraphs")
    if ctx is None:
        raise OpError("If requires a trace context")
    if not is_tracer(cond):
        taken = then_g if bool(np.asarray(cond).reshape(())) else else_g
        outs = ctx.run_subgraph(taken, [])
        return tuple(outs) if len(outs) > 1 else outs[0]

    def run_branch(g):
        def fn(_):
            outs = ctx.run_subgraph(g, [])
            return tuple(outs)

        return fn

    result = jax.lax.cond(
        jnp.asarray(cond).reshape(()).astype(bool),
        run_branch(then_g),
        run_branch(else_g),
        operand=0,
    )
    return result if len(result) > 1 else result[0]


@register("Loop")
def _loop(ctx, inputs, attrs):
    body = attrs.get("body")
    if body is None:
        raise OpError("Loop requires a body subgraph")
    if ctx is None:
        raise OpError("Loop requires a trace context")
    max_trip = opt_input(inputs, 0)
    cond_init = opt_input(inputs, 1)
    deps = [x for x in inputs[2:]]
    n_deps = len(deps)
    n_body_outputs = len(body.output_ids)
    n_scan = n_body_outputs - 1 - n_deps  # body outputs: cond, deps..., scans...

    trip_concrete = max_trip is not None and not is_tracer(max_trip)
    cond_concrete = cond_init is None or not is_tracer(cond_init)

    if trip_concrete and cond_concrete:
        trip = int(np.asarray(max_trip).reshape(())) if max_trip is not None else None
        cond = (
            bool(np.asarray(cond_init).reshape(())) if cond_init is not None else True
        )
        scans = [[] for _ in range(n_scan)]
        i = 0
        while cond and (trip is None or i < trip):
            # numpy (not jnp) bookkeeping values: jnp constants become
            # tracers inside jit, which would poison the concrete unroll.
            body_inputs = [np.int32(i), np.bool_(cond)] + deps
            outs = ctx.run_subgraph(body, body_inputs)
            cond_out = outs[0]
            if is_tracer(cond_out):
                raise OpError(
                    "Loop exit condition became data-dependent mid-unroll; "
                    "XLA needs a static trip count (mark the condition "
                    "constant or restructure the model)"
                )
            cond = bool(np.asarray(cond_out).reshape(()))
            deps = list(outs[1 : 1 + n_deps])
            for s in range(n_scan):
                scans[s].append(outs[1 + n_deps + s])
            i += 1
            if trip is None and i > 10_000_000:
                raise OpError("Loop ran >1e7 iterations at trace time")
        scan_outs = [jnp.stack(s, axis=0) if s else jnp.zeros((0,)) for s in scans]
        outs = deps + scan_outs
        return tuple(outs) if len(outs) > 1 else outs[0]

    if n_scan > 0:
        raise OpError(
            "Loop with data-dependent trip count and per-iteration outputs "
            "cannot compile to static shapes on TPU"
        )

    trip = max_trip if max_trip is not None else np.iinfo(np.int32).max

    def cond_fn(state):
        i, cond, *_ = state
        return jnp.logical_and(cond, i < jnp.asarray(trip, jnp.int32).reshape(()))

    def body_fn(state):
        i, cond, *dep_state = state
        outs = ctx.run_subgraph(body, [i, cond] + list(dep_state))
        new_cond = jnp.asarray(outs[0]).reshape(()).astype(bool)
        return (i + 1, new_cond, *outs[1 : 1 + n_deps])

    cond0 = (
        jnp.asarray(cond_init).reshape(()).astype(bool)
        if cond_init is not None
        else jnp.asarray(True)
    )
    state = jax.lax.while_loop(
        cond_fn, body_fn, (jnp.asarray(0, jnp.int32), cond0, *deps)
    )
    outs = list(state[2:])
    return tuple(outs) if len(outs) > 1 else outs[0]
