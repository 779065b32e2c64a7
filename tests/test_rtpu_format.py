""".rtpu container round-trips (the .rten file-format analog)."""

import numpy as np
import pytest
import torch
import torch.nn as nn

from onnx_export_util import export_onnx
from util import assert_close

from rten_tpu.model import Model, ModelOptions
from rten_tpu.quantize_pass import quantize_dynamic


def test_onnx_quantize_save_load_roundtrip(tmp_path):
    m = nn.Sequential(nn.Linear(64, 64), nn.GELU(), nn.Linear(64, 32)).eval()
    x = torch.randn(3, 64)
    onnx_path = str(tmp_path / "m.onnx")
    export_onnx(m, x, onnx_path, ["x"], ["y"])

    model = Model.load_file(onnx_path)
    quantize_dynamic(model.graph)
    model.executor._weights = None
    want = np.asarray(model.run({"x": x.numpy()})[0])

    rtpu_path = str(tmp_path / "m.rtpu")
    model.save(rtpu_path, metadata={"source": "test"})

    loaded = Model.load_file(rtpu_path)
    assert loaded.metadata.get("source") == "test"
    got = np.asarray(loaded.run({"x": x.numpy()})[0])
    assert_close(got, want, rtol=1e-6, atol=1e-7)
    assert loaded.input_names() == model.input_names()
    assert loaded.output_names() == model.output_names()


def test_rtpu_preserves_subgraphs_and_attrs(tmp_path):
    from rten_tpu.ir.builder import GraphBuilder

    inner = GraphBuilder()
    c = inner.constant("c", np.float32(3.0))
    inner.output(inner.op("Identity", [c]))

    inner2 = GraphBuilder()
    c2 = inner2.constant("c", np.float32(5.0))
    inner2.output(inner2.op("Identity", [c2]))

    b = GraphBuilder()
    cond = b.input("cond")
    out = b.op(
        "If", [cond],
        {"then_branch": inner.finish(), "else_branch": inner2.finish()},
    )
    b.output(out)
    model = Model(b.finish(), ModelOptions(optimize=False))
    p = str(tmp_path / "cf.rtpu")
    model.save(p)
    loaded = Model.load_file(p)
    assert float(loaded.run({"cond": np.asarray(True)})[0]) == 3.0
    assert float(loaded.run({"cond": np.asarray(False)})[0]) == 5.0


def test_cli_quantize_save(tmp_path):
    m = nn.Sequential(nn.Linear(48, 48), nn.ReLU(), nn.Linear(48, 8)).eval()
    x = torch.randn(2, 48)
    onnx_path = str(tmp_path / "m.onnx")
    export_onnx(m, x, onnx_path, ["x"], ["y"])
    from rten_tpu.cli import main

    rtpu = str(tmp_path / "m.rtpu")
    assert main([onnx_path, "--quantize", "int8", "--save-model", rtpu, "-q"]) == 0
    loaded = Model.load_file(rtpu)
    ops = {op.op_type for _, op in loaded.graph.operators()}
    assert "MatMulIntegerToFloat" in ops
    out = loaded.run({"x": x.numpy()})[0]
    assert np.asarray(out).shape == (2, 8)
