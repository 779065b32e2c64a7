"""Decomposed-attention fusion: fires on real torch exports, output intact."""

import numpy as np
import torch

from onnx_export_util import export_onnx
from test_model_onnx import TinyAttention
from util import assert_close

from rten_tpu.model import Model, ModelOptions


def test_attention_fusion_fires_and_matches(tmp_path):
    torch.manual_seed(0)
    m = TinyAttention().eval()
    x = torch.randn(2, 10, 32)
    path = export_onnx(m, x, str(tmp_path / "attn.onnx"), ["x"], ["y"])

    plain = Model.load_file(path, ModelOptions(optimize=False))
    fused = Model.load_file(path, ModelOptions(optimize=True))
    ops_plain = [op.op_type for _, op in plain.graph.operators()]
    ops_fused = [op.op_type for _, op in fused.graph.operators()]
    assert "Softmax" in ops_plain and "Attention" not in ops_plain
    assert "Attention" in ops_fused, ops_fused
    assert "Softmax" not in ops_fused

    with torch.no_grad():
        want = m(x).numpy()
    got = np.asarray(fused.run({"x": x.numpy()})[0])
    assert_close(got, want, rtol=1e-3, atol=1e-5)
    got_plain = np.asarray(plain.run({"x": x.numpy()})[0])
    assert_close(got_plain, want, rtol=1e-3, atol=1e-5)
