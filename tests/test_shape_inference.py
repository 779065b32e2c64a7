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
