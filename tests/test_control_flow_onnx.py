"""Real exporter-produced control flow: torch scripted loops -> ONNX Loop
with body subgraph + captures, through the full load/run path."""

import numpy as np
import torch

from onnx_export_util import export_onnx

from rten_tpu.model import Model, ModelOptions


class LoopNet(torch.nn.Module):
    def forward(self, x, n: int):
        out = x
        for i in range(n):
            out = out * 2.0 + 1.0
        return out


class CondNet(torch.nn.Module):
    def forward(self, x):
        if bool(x.sum() > 0):
            return x * 2.0
        else:
            return x - 1.0


def test_torch_scripted_loop(tmp_path):
    m = torch.jit.script(LoopNet())
    path = str(tmp_path / "loop.onnx")
    export_onnx(m, (torch.randn(3), 4), path, ["x", "n"], ["y"])
    model = Model.load_file(path, ModelOptions(optimize=False))
    assert "Loop" in {op.op_type for _, op in model.graph.operators()}
    x = np.float32([1, 2, 3])
    for n in (0, 1, 4):
        got = np.asarray(model.run({"x": x, "n": np.int64(n)}, jit=False)[0])
        want = x.copy()
        for _ in range(n):
            want = want * 2 + 1
        np.testing.assert_allclose(got, want, rtol=1e-6)


def test_torch_scripted_if(tmp_path):
    m = torch.jit.script(CondNet())
    path = str(tmp_path / "if.onnx")
    export_onnx(m, (torch.randn(3),), path, ["x"], ["y"])
    model = Model.load_file(path, ModelOptions(optimize=False))
    assert "If" in {op.op_type for _, op in model.graph.operators()}
    pos = np.float32([1, 2, 3])
    neg = np.float32([-1, -2, -3])
    np.testing.assert_allclose(
        np.asarray(model.run({"x": pos}, jit=False)[0]), pos * 2
    )
    np.testing.assert_allclose(
        np.asarray(model.run({"x": neg}, jit=False)[0]), neg - 1
    )
