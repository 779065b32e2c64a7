"""Symbolic shape inference vs actual run shapes."""

import numpy as np
import pytest
import torch
import torch.nn as nn

from onnx_export_util import export_onnx

from rten_tpu.dtypes import DataType
from rten_tpu.model import Model, ModelOptions
from rten_tpu.shape_inference import ShapeError, broadcast_shapes, infer_shapes


def test_broadcast():
    assert broadcast_shapes((1, 3), ("b", 1)) == ("b", 3)
    assert broadcast_shapes((4, 1, 2), (3, 2)) == (4, 3, 2)
    with pytest.raises(ShapeError):
        broadcast_shapes((3,), (4,))


def test_infer_through_mlp(tmp_path):
    m = nn.Sequential(nn.Linear(16, 32), nn.ReLU(), nn.Linear(32, 4)).eval()
    x = torch.randn(2, 16)
    p = str(tmp_path / "m.onnx")
    export_onnx(m, x, p, ["x"], ["y"], dynamic_axes={"x": {0: "batch"}})
    model = Model.load_file(p, ModelOptions(optimize=False))
    info = infer_shapes(model.graph)
    out_id = model.graph.output_ids[0]
    dt, sh = info[out_id]
    assert sh == ("batch", 4)
    assert dt in (None, DataType.Float)


def test_infer_symbolic_gpt2():
    from rten_tpu.models import gpt2

    cfg = gpt2.GPT2Config(vocab_size=64, n_embd=16, n_layer=1, n_head=2)
    model = gpt2.load(cfg, gpt2.random_weights(cfg), options=ModelOptions(optimize=False))
    info = infer_shapes(model.graph)
    logits_id = model.graph.find_node("logits")
    dt, sh = info[logits_id]
    assert sh == ("batch", "seq", 64)
    pk = model.graph.find_node("present.0.key")
    _, pk_sh = info[pk]
    # Concat(past, new) along a symbolic axis -> unknown length, rest known.
    assert pk_sh is not None and pk_sh[1] == 2 and pk_sh[3] == 8


def test_infer_conv_pool():
    from rten_tpu.models import mnist

    model = mnist.load("cnn", options=ModelOptions(optimize=False))
    info = infer_shapes(model.graph, overrides={"image": (5, 1, 28, 28)})
    out = model.graph.find_node("logits")
    assert info[out][1] == (5, 10)


def test_extended_rules_pad_tile_topk_convtranspose():
    from rten_tpu.dtypes import DataType
    from rten_tpu.ir.graph import Graph
    from rten_tpu.shape_inference import infer_shapes

    g = Graph()
    x = g.add_value("x", DataType.Float, ("batch", 3, 8, 8))
    pads = g.add_constant("pads", np.int32([0, 0, 1, 1, 0, 0, 1, 1]))
    p = g.add_value("p", None, None)
    g.add_op("Pad", [x, pads], [p])
    reps = g.add_constant("reps", np.int32([1, 2, 1, 1]))
    t = g.add_value("t", None, None)
    g.add_op("Tile", [p, reps], [t])
    w = g.add_constant("w", np.zeros((3, 4, 3, 3), np.float32))
    ct = g.add_value("ct", None, None)
    g.add_op("ConvTranspose", [x, w], [ct], {"strides": [2, 2]})
    kk = g.add_constant("kk", np.int32([5]))
    tv = g.add_value("tv", None, None)
    ti = g.add_value("ti", None, None)
    flat = g.add_value("flat", DataType.Float, ("batch", 64))
    g.add_op("TopK", [flat, kk], [tv, ti], {"axis": -1})
    g.input_ids = [x, flat]
    g.output_ids = [t, ct, tv, ti]
    info = infer_shapes(g)
    assert info[p][1] == ("batch", 3, 10, 10)
    assert info[t][1] == ("batch", 6, 10, 10)
    assert info[ct][1] == ("batch", 4, 17, 17)
    assert info[tv][1] == ("batch", 5)
    assert info[ti][1] == ("batch", 5)


def test_extended_rules_einsum_lstm_d2s():
    from rten_tpu.dtypes import DataType
    from rten_tpu.ir.graph import Graph
    from rten_tpu.shape_inference import infer_shapes

    g = Graph()
    a = g.add_value("a", DataType.Float, ("b", 4, 8))
    bb = g.add_value("bb", DataType.Float, ("b", 8, 16))
    e = g.add_value("e", None, None)
    g.add_op("Einsum", [a, bb], [e], {"equation": "bij,bjk->bik"})
    x = g.add_value("x", DataType.Float, (10, "batch", 6))
    wl = g.add_value("wl", DataType.Float, (1, 32, 6))
    rl = g.add_value("rl", DataType.Float, (1, 32, 8))
    y = g.add_value("y", None, None)
    h = g.add_value("h", None, None)
    c = g.add_value("c", None, None)
    g.add_op("LSTM", [x, wl, rl], [y, h, c],
             {"hidden_size": 8, "direction": "forward"})
    img = g.add_value("img", DataType.Float, (1, 12, 4, 4))
    d = g.add_value("d", None, None)
    g.add_op("DepthToSpace", [img, ], [d], {"blocksize": 2})
    g.input_ids = [a, bb, x, wl, rl, img]
    g.output_ids = [e, y, h, c, d]
    info = infer_shapes(g)
    assert info[e][1] == ("b", 4, 16)
    assert info[y][1] == (10, 1, "batch", 8)
    assert info[h][1] == (1, "batch", 8)
    assert info[d][1] == (1, 3, 8, 8)
