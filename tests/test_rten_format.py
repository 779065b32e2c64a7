""".rten container read/write (reference rten-model-file format parity).

Round-trips exercise the V2 (header + tensor-data section) and V1 (inline
flatbuffers) formats, attr codecs across op families, symbolic dims,
control-flow subgraphs, quantized graphs and metadata.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn

from onnx_export_util import export_onnx
from util import assert_close

from rten_tpu.dtypes import DataType
from rten_tpu.formats.rten import RtenFormatError, load_rten, save_rten
from rten_tpu.ir.graph import Graph
from rten_tpu.model import Model, ModelOptions


def _roundtrip(model: Model, tmp_path, x: dict, v1=False, name="m.rten"):
    want = [np.asarray(o) for o in model.run(x)]
    p = str(tmp_path / name)
    save_rten(model.graph, p, v1=v1)
    m2 = Model.load_file(p, ModelOptions(optimize=False))
    got = [np.asarray(o) for o in m2.run(x)]
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert_close(g, w, rtol=1e-5, atol=1e-6)
    return m2


def test_mlp_roundtrip_v2(tmp_path):
    torch.manual_seed(0)
    net = nn.Sequential(nn.Linear(32, 48), nn.GELU(), nn.Linear(48, 8)).eval()
    x = torch.randn(4, 32)
    path = export_onnx(net, x, str(tmp_path / "m.onnx"), ["x"], ["y"])
    m = Model.load_file(path, ModelOptions(optimize=False))
    _roundtrip(m, tmp_path, {"x": x.numpy()})


def test_mlp_roundtrip_v1_inline(tmp_path):
    torch.manual_seed(1)
    net = nn.Sequential(nn.Linear(16, 16), nn.ReLU(), nn.Linear(16, 4)).eval()
    x = torch.randn(2, 16)
    path = export_onnx(net, x, str(tmp_path / "m.onnx"), ["x"], ["y"])
    m = Model.load_file(path, ModelOptions(optimize=False))
    m2 = _roundtrip(m, tmp_path, {"x": x.numpy()}, v1=True)
    # V1 files have no header: first bytes are the fb root offset.
    raw = open(str(tmp_path / "m.rten"), "rb").read()
    assert raw[:4] != b"RTEN" and raw[4:8] == b"RTEN"


def test_cnn_roundtrip_attrs(tmp_path):
    """Conv/pool/batchnorm attrs survive the attr codecs."""

    class CNN(nn.Module):
        def __init__(self):
            super().__init__()
            self.c1 = nn.Conv2d(1, 8, 3, stride=2, padding=1)
            self.bn = nn.BatchNorm2d(8)
            self.c2 = nn.Conv2d(8, 16, 3, padding=1, groups=2)
            self.fc = nn.Linear(16 * 7 * 7, 10)

        def forward(self, x):
            x = torch.relu(self.bn(self.c1(x)))
            x = torch.max_pool2d(torch.relu(self.c2(x)), 2)
            return self.fc(x.flatten(1))

    torch.manual_seed(0)
    net = CNN().eval()
    x = torch.randn(2, 1, 28, 28)
    path = export_onnx(net, x, str(tmp_path / "cnn.onnx"), ["x"], ["y"])
    m = Model.load_file(path, ModelOptions(optimize=False))
    _roundtrip(m, tmp_path, {"x": x.numpy()})


def test_quantized_graph_roundtrip(tmp_path):
    """ORT-style dynamic-quant graph (the unfused form rten stores):
    DynamicQuantizeLinear -> MatMulInteger -> Cast -> Mul, with int8
    weight constants riding the tensor-data section."""
    rng = np.random.default_rng(0)
    w = rng.integers(-127, 127, size=(64, 16), dtype=np.int8)
    w_scale = np.float32(0.05)

    g = Graph()
    x = g.add_value("x", DataType.Float, (4, 64))
    wq = g.add_constant("wq", w)
    aq = g.add_value("aq", DataType.UInt8, (4, 64))
    asc = g.add_value("asc", DataType.Float, ())
    azp = g.add_value("azp", DataType.UInt8, ())
    acc = g.add_value("acc", DataType.Int32, (4, 16))
    accf = g.add_value("accf", DataType.Float, (4, 16))
    y = g.add_value("y", DataType.Float, (4, 16))
    sc2 = g.add_constant("sc2", np.float32(w_scale))
    scale_mul = g.add_value("scale_mul", DataType.Float, ())
    g.add_op("DynamicQuantizeLinear", [x], [aq, asc, azp])
    g.add_op("MatMulInteger", [aq, wq, azp], [acc])
    g.add_op("Cast", [acc], [accf], {"to": DataType.Float})
    g.add_op("Mul", [asc, sc2], [scale_mul])
    g.add_op("Mul", [accf, scale_mul], [y])
    g.input_ids, g.output_ids = [x], [y]

    m = Model(g, ModelOptions(optimize=False))
    x_np = rng.standard_normal((4, 64)).astype(np.float32)
    m2 = _roundtrip(m, tmp_path, {"x": x_np})
    # int8 weights kept their dtype through the container.
    from rten_tpu.ir.graph import Constant as C

    wq2 = [n for n in m2.graph.nodes.values() if isinstance(n, C) and n.name == "wq"]
    assert wq2 and wq2[0].array.dtype == np.int8


def test_symbolic_dims_and_metadata(tmp_path):
    g = Graph()
    x = g.add_value("x", DataType.Float, ("batch", 8))
    c = g.add_constant("c", np.ones((8,), np.float32))
    y = g.add_value("y", DataType.Float, ("batch", 8))
    g.add_op("Add", [x, c], [y])
    g.input_ids, g.output_ids = [x], [y]

    p = str(tmp_path / "m.rten")
    save_rten(g, p, metadata={"description": "test model", "license": "MIT"})
    g2, meta = load_rten(open(p, "rb").read())
    assert meta["description"] == "test model"
    assert meta["license"] == "MIT"
    node = g2.nodes[g2.input_ids[0]]
    assert node.shape == ("batch", 8)
    assert node.dtype == DataType.Float


def test_if_subgraph_roundtrip(tmp_path):
    """Control-flow subgraphs + captures survive the round trip."""
    g = Graph()
    cond = g.add_value("cond", DataType.Bool, ())
    xv = g.add_value("x", DataType.Float, (2,))
    out = g.add_value("out", DataType.Float, (2,))

    def branch(mult):
        sg = Graph()
        cap = sg.add_value("x")  # captured by name from parent
        sg.captures.append("x")
        k = sg.add_constant("k", np.float32(mult))
        o = sg.add_value(f"o{mult}", DataType.Float, (2,))
        sg.add_op("Mul", [cap, k], [o])
        sg.output_ids = [o]
        return sg

    g.add_op("If", [cond], [out], {"then_branch": branch(2.0), "else_branch": branch(3.0)})
    g.input_ids, g.output_ids = [cond, xv], [out]

    m = Model(g, ModelOptions(optimize=False))
    x = np.array([1.0, 2.0], np.float32)
    want_t = np.asarray(m.run({"cond": np.array(True), "x": x})[0])
    np.testing.assert_allclose(want_t, x * 2.0)

    p = str(tmp_path / "if.rten")
    save_rten(m.graph, p)
    m2 = Model.load_file(p, ModelOptions(optimize=False))
    got_t = np.asarray(m2.run({"cond": np.array(True), "x": x})[0])
    got_f = np.asarray(m2.run({"cond": np.array(False), "x": x})[0])
    np.testing.assert_allclose(got_t, x * 2.0)
    np.testing.assert_allclose(got_f, x * 3.0)


def test_reduce_and_misc_attr_ops(tmp_path):
    """Ops whose attrs use the shared/aliased tables (ReduceMeanAttrs etc.)."""
    g = Graph()
    x = g.add_value("x", DataType.Float, (2, 3, 4))
    r = g.add_value("r", DataType.Float, (2, 4))
    t = g.add_value("t", DataType.Float, (4, 2))
    sm = g.add_value("sm", DataType.Float, (4, 2))
    g.add_op("ReduceMean", [x], [r], {"axes": [1], "keepdims": 0})
    g.add_op("Transpose", [r], [t], {"perm": [1, 0]})
    g.add_op("Softmax", [t], [sm], {"axis": -1})
    g.input_ids, g.output_ids = [x], [sm]
    m = Model(g, ModelOptions(optimize=False))
    x_np = np.random.default_rng(0).standard_normal((2, 3, 4)).astype(np.float32)
    _roundtrip(m, tmp_path, {"x": x_np})


def test_gemm_argmax_cast_attrs(tmp_path):
    g = Graph()
    x = g.add_value("x", DataType.Float, (3, 4))
    w = g.add_constant("w", np.random.default_rng(1).standard_normal((5, 4)).astype(np.float32))
    bias = g.add_constant("b", np.zeros(5, np.float32))
    y = g.add_value("y", DataType.Float, (3, 5))
    am = g.add_value("am", DataType.Int32, (3,))
    amf = g.add_value("amf", DataType.Float, (3,))
    g.add_op("Gemm", [x, w, bias], [y], {"alpha": 0.5, "transB": 1})
    g.add_op("ArgMax", [y], [am], {"axis": 1, "keepdims": 0})
    g.add_op("Cast", [am], [amf], {"to": DataType.Float})
    g.input_ids, g.output_ids = [x], [y, amf]
    m = Model(g, ModelOptions(optimize=False))
    x_np = np.random.default_rng(2).standard_normal((3, 4)).astype(np.float32)
    _roundtrip(m, tmp_path, {"x": x_np})


def test_contrib_op_has_no_rten_encoding(tmp_path):
    g = Graph()
    x = g.add_value("x", DataType.Float, (1, 4, 8))
    y = g.add_value("y", DataType.Float, (1, 4, 8))
    g.add_op("SkipLayerNormalization", [x, x], [y], {})
    g.input_ids, g.output_ids = [x], [y]
    with pytest.raises(RtenFormatError):
        save_rten(g, str(tmp_path / "bad.rten"))


def test_garbage_rejected():
    with pytest.raises(RtenFormatError):
        load_rten(b"RTEN\x09\x00\x00\x00" + b"\xff" * 64)  # bad version
    with pytest.raises(RtenFormatError):
        load_rten(b"\x00\x01")
