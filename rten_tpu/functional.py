"""Eager op helpers: the `Operators`/`FloatOperators` extension-trait sugar
(rten src/ops/operators.rs:26,94 — `x.softmax(-1)` style) as plain
functions over numpy/jax arrays, backed by the SAME op lowerings the graph
executor uses. Handy for pre/post-processing around model calls.

    from rten_tpu import functional as F
    probs = F.softmax(logits, axis=-1)
    keep = F.non_max_suppression(boxes, scores, iou_threshold=0.5)
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from .ops.registry import get_op


def _run(op_type: str, inputs, attrs=None, n_outputs: int = 1):
    a = dict(attrs or {})
    a["__n_outputs__"] = n_outputs
    import jax.numpy as jnp

    ins = [jnp.asarray(x) if x is not None else None for x in inputs]
    out = get_op(op_type).lower(None, ins, a)
    if isinstance(out, tuple):
        return tuple(np.asarray(o) for o in out)
    return np.asarray(out)


def softmax(x, axis: int = -1):
    return _run("Softmax", [x], {"axis": axis})


def log_softmax(x, axis: int = -1):
    return _run("LogSoftmax", [x], {"axis": axis})


def gelu(x, approximate: str = "none"):
    return _run("Gelu", [x], {"approximate": approximate})


def silu(x):
    return _run("Silu", [x])


def erf(x):
    return _run("Erf", [x])


def sigmoid(x):
    return _run("Sigmoid", [x])


def layer_norm(x, weight, bias=None, axis: int = -1, epsilon: float = 1e-5):
    return _run("LayerNormalization", [x, weight, bias], {"axis": axis, "epsilon": epsilon})


def rms_norm(x, weight, axis: int = -1, epsilon: float = 1e-5):
    return _run("RMSNormalization", [x, weight], {"axis": axis, "epsilon": epsilon})


def matmul(a, b):
    return _run("MatMul", [a, b])


def conv2d(x, w, bias=None, strides=(1, 1), pads=(0, 0, 0, 0),
           dilations=(1, 1), group: int = 1):
    return _run(
        "Conv", [x, w, bias],
        {"strides": list(strides), "pads": list(pads),
         "dilations": list(dilations), "group": group},
    )


def resize(x, sizes: Sequence[int], mode: str = "nearest"):
    import jax.numpy as jnp

    roi = None
    return _run(
        "Resize", [x, roi, None, np.asarray(sizes, np.int32)], {"mode": mode}
    )


def top_k(x, k: int, axis: int = -1, largest: bool = True):
    return _run(
        "TopK", [x, np.asarray([k], np.int32)],
        {"axis": axis, "largest": int(largest)}, n_outputs=2,
    )


def arg_max(x, axis: int = -1, keepdims: bool = False):
    return _run("ArgMax", [x], {"axis": axis, "keepdims": int(keepdims)})


def non_max_suppression(boxes, scores, max_output_boxes: int = 300,
                        iou_threshold: float = 0.5, score_threshold: float = 0.0):
    """boxes [B,N,4] (y1,x1,y2,x2), scores [B,C,N] -> [M,3] (b, c, idx)."""
    return _run(
        "NonMaxSuppression",
        [boxes, scores, np.asarray([max_output_boxes], np.int64),
         np.asarray([iou_threshold], np.float32),
         np.asarray([score_threshold], np.float32)],
    )


def pad(x, pads: Sequence[int], mode: str = "constant", value: float = 0.0):
    return _run(
        "Pad", [x, np.asarray(pads, np.int32),
                np.asarray(value, np.float32)], {"mode": mode}
    )


def quantize_linear(x, scale, zero_point=None, axis: int = 1):
    return _run("QuantizeLinear", [x, scale, zero_point], {"axis": axis})


def dequantize_linear(x, scale, zero_point=None, axis: int = 1):
    return _run("DequantizeLinear", [x, scale, zero_point], {"axis": axis})
