"""Opset compatibility: the same model exported at several opsets must load
and match (Squeeze/Unsqueeze/Split/Pad flip between attr and input forms
across opsets)."""

import numpy as np
import pytest
import torch
import torch.nn as nn

from onnx_export_util import export_onnx
from util import assert_close

from rten_tpu.model import Model


class Net(nn.Module):
    def forward(self, x):
        h = x.unsqueeze(1)                    # Unsqueeze
        h = torch.nn.functional.pad(h, (1, 1))  # Pad
        h = h.squeeze(1)                      # Squeeze
        a, b = torch.split(h, h.shape[-1] // 2, dim=-1)  # Split
        return torch.cat([b, a], dim=-1).relu()


@pytest.mark.parametrize("opset", [11, 13, 17])
def test_export_opsets(tmp_path, opset):
    m = Net().eval()
    x = torch.randn(2, 8)
    path = str(tmp_path / f"m{opset}.onnx")
    export_onnx(m, x, path, ["x"], ["y"], opset_version=opset)
    model = Model.load_file(path)
    with torch.no_grad():
        want = m(x).numpy()
    got = np.asarray(model.run({"x": x.numpy()})[0])
    assert_close(got, want, rtol=1e-6, atol=1e-6, msg=f"opset {opset}")
