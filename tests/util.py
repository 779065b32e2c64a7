"""Test helpers: single-op graph runner + tolerance assertions.

Mirrors the reference's table-driven TestCases style
(rten-testing/src/lib.rs): each suite enumerates Case tuples and runs them
through a tiny one-op graph.
"""

from __future__ import annotations

import numpy as np

from rten_tpu import Executor, GraphBuilder, RunConfig
from rten_tpu.dtypes import DataType


def run_op(op_type, inputs, attrs=None, n_outputs=1, config=None, const_mask=None):
    """Build a graph with a single `op_type` node and run it.

    ``const_mask[i]`` marks input i as a graph constant rather than a
    runtime input (needed by ops that require static values).
    """
    b = GraphBuilder()
    in_exprs = []
    feed = {}
    for i, arr in enumerate(inputs):
        if arr is None:
            in_exprs.append(None)
            continue
        arr = np.asarray(arr)
        if const_mask and const_mask[i]:
            in_exprs.append(b.constant(f"c{i}", arr))
        else:
            e = b.input(f"x{i}", DataType.from_np(arr.dtype), arr.shape)
            feed[e.node_id] = arr
            in_exprs.append(e)
    out = b.op(op_type, in_exprs, attrs or {}, n_outputs=n_outputs)
    outs = out if isinstance(out, tuple) else (out,)
    b.output(*outs)
    g = b.finish()
    ex = Executor(g, config or RunConfig())
    results = ex.run(feed, g.output_ids)
    results = [np.asarray(r) for r in results]
    return results[0] if n_outputs == 1 else results


def assert_close(actual, expected, rtol=1e-5, atol=1e-5, msg=""):
    actual = np.asarray(actual)
    expected = np.asarray(expected)
    assert actual.shape == tuple(expected.shape), (
        f"{msg} shape {actual.shape} != {expected.shape}"
    )
    np.testing.assert_allclose(actual, expected, rtol=rtol, atol=atol, err_msg=msg)
