"""End-to-end: torch-exported ONNX -> parser -> optimizer -> executor.

The TPU-native analog of the reference's model-level testing
(rten-examples *_reference.py comparisons; SURVEY.md section 4).
"""

import numpy as np
import pytest
import torch
import torch.nn as nn

from onnx_export_util import export_onnx
from util import assert_close

from rten_tpu.model import Model, ModelOptions

RNG = np.random.default_rng(3)


class MnistCnn(nn.Module):
    def __init__(self):
        super().__init__()
        self.c1 = nn.Conv2d(1, 8, 3, padding=1)
        self.c2 = nn.Conv2d(8, 16, 3, stride=2, padding=1)
        self.fc = nn.Linear(16 * 14 * 14, 10)

    def forward(self, x):
        x = torch.relu(self.c1(x))
        x = torch.relu(self.c2(x))
        return self.fc(x.flatten(1)).softmax(-1)


class Mlp(nn.Module):
    def __init__(self):
        super().__init__()
        self.l1 = nn.Linear(784, 128)
        self.l2 = nn.Linear(128, 10)
        self.norm = nn.LayerNorm(128)

    def forward(self, x):
        return self.l2(self.norm(torch.nn.functional.gelu(self.l1(x))))


class TinyAttention(nn.Module):
    """Transformer block shaped like GPT-2's: causal MHA + MLP, decomposed
    into primitive ops as real exporters emit them."""

    def __init__(self, d=32, heads=4):
        super().__init__()
        self.d, self.h = d, heads
        self.ln1 = nn.LayerNorm(d)
        self.qkv = nn.Linear(d, 3 * d)
        self.proj = nn.Linear(d, d)
        self.ln2 = nn.LayerNorm(d)
        self.mlp = nn.Sequential(nn.Linear(d, 4 * d), nn.GELU(), nn.Linear(4 * d, d))

    def forward(self, x):
        B, T, d = x.shape
        hd = d // self.h
        q, k, v = self.qkv(self.ln1(x)).split(d, dim=-1)
        q = q.view(B, T, self.h, hd).transpose(1, 2)
        k = k.view(B, T, self.h, hd).transpose(1, 2)
        v = v.view(B, T, self.h, hd).transpose(1, 2)
        scores = q @ k.transpose(-1, -2) / (hd ** 0.5)
        mask = torch.triu(torch.ones(T, T, dtype=torch.bool), 1)
        scores = scores.masked_fill(mask, float("-inf"))
        a = torch.softmax(scores, -1) @ v
        a = a.transpose(1, 2).reshape(B, T, d)
        x = x + self.proj(a)
        return x + self.mlp(self.ln2(x))


@pytest.mark.parametrize("optimize", [False, True])
def test_mnist_cnn_onnx(tmp_path, optimize):
    m = MnistCnn()
    x = torch.randn(2, 1, 28, 28)
    path = export_onnx(m, x, str(tmp_path / "cnn.onnx"), ["x"], ["probs"])
    model = Model.load_file(path, ModelOptions(optimize=optimize))
    with torch.no_grad():
        want = m(x).numpy()
    got = np.asarray(model.run({"x": x.numpy()})[0])
    assert_close(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("optimize", [False, True])
def test_mlp_onnx(tmp_path, optimize):
    m = Mlp()
    x = torch.randn(4, 784)
    path = export_onnx(m, x, str(tmp_path / "mlp.onnx"), ["x"], ["logits"])
    model = Model.load_file(path, ModelOptions(optimize=optimize))
    with torch.no_grad():
        want = m(x).numpy()
    got = np.asarray(model.run({"x": x.numpy()})[0])
    assert_close(got, want, rtol=1e-4, atol=1e-5)
    assert model.input_names() == ["x"]
    assert model.output_names() == ["logits"]


def test_attention_block_onnx(tmp_path):
    m = TinyAttention()
    x = torch.randn(2, 10, 32)
    path = export_onnx(m, x, str(tmp_path / "attn.onnx"), ["x"], ["y"])
    model = Model.load_file(path)
    with torch.no_grad():
        want = m(x).numpy()
    got = np.asarray(model.run({"x": x.numpy()})[0])
    assert_close(got, want, rtol=1e-3, atol=1e-5)


def test_dynamic_batch(tmp_path):
    m = Mlp()
    x = torch.randn(4, 784)
    path = export_onnx(
        m, x, str(tmp_path / "mlp_dyn.onnx"), ["x"], ["logits"],
        dynamic_axes={"x": {0: "batch"}},
    )
    model = Model.load_file(path)
    # Shape-specialized compiles, keyed like rten's CachedPlan.
    for bs in (1, 3, 8):
        xb = torch.randn(bs, 784)
        with torch.no_grad():
            want = m(xb).numpy()
        got = np.asarray(model.run({"x": xb.numpy()})[0])
        assert_close(got, want, rtol=1e-4, atol=1e-5)
