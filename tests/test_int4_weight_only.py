"""Weight-only int4 quantization pass (MatMulNBits route)."""

import numpy as np
import torch
import torch.nn as nn

from onnx_export_util import export_onnx
from util import assert_close

from rten_tpu.model import Model, ModelOptions
from rten_tpu.quantize_pass import pack_int4_weight, quantize_weight_only_int4


def test_pack_int4_roundtrip():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((64, 48)).astype(np.float32)
    packed, scales = pack_int4_weight(w, block_size=32)
    # Reconstruct and compare: error bounded by half a quantization step.
    lo = (packed & 0xF).astype(np.int32)
    hi = ((packed >> 4) & 0xF).astype(np.int32)
    vals = np.stack([lo, hi], -1).reshape(48, 2, 32)
    recon = ((vals - 8) * scales[:, :, None]).reshape(48, 64).T
    step = np.repeat(scales.T, 32, axis=0)
    assert (np.abs(recon - w) <= step * 0.51 + 1e-6).all()


def test_int4_weight_only_mlp(tmp_path):
    torch.manual_seed(0)
    m = nn.Sequential(nn.Linear(128, 128), nn.GELU(), nn.Linear(128, 32)).eval()
    x = torch.randn(4, 128)
    p = str(tmp_path / "m.onnx")
    export_onnx(m, x, p, ["x"], ["y"])
    model = Model.load_file(p)
    want = np.asarray(model.run({"x": x.numpy()})[0])

    quantize_weight_only_int4(model.graph, min_elements=1024)
    model.executor._weights = None
    ops = {op.op_type for _, op in model.graph.operators()}
    assert "MatMulNBits" in ops
    got = np.asarray(model.run({"x": x.numpy()})[0])
    corr = np.corrcoef(got.ravel(), want.ravel())[0, 1]
    assert corr > 0.99, corr
    agree = np.mean(np.argmax(got, -1) == np.argmax(want, -1))
    assert agree >= 0.75, agree  # int4 noise may flip near-ties


def test_int4_gpt2_generates():
    from rten_tpu.generate import Generator, GeneratorConfig
    from rten_tpu.models import gpt2

    cfg = gpt2.GPT2Config(vocab_size=128, n_positions=64, n_embd=64,
                          n_layer=2, n_head=4)
    weights = gpt2.random_weights(cfg, seed=1)
    f32 = gpt2.load(cfg, weights)
    g4_graph = gpt2.build_graph(cfg, weights)
    quantize_weight_only_int4(g4_graph, min_elements=1024)
    from rten_tpu.model import Model as M

    q4 = M(g4_graph, ModelOptions(optimize=True))
    prompt = [5, 9, 23, 40]
    a = Generator(f32, [prompt], GeneratorConfig(bucket_size=8)).generate(8)[0]
    b = Generator(q4, [prompt], GeneratorConfig(bucket_size=8)).generate(8)[0]
    agree = np.mean(a == b)
    assert agree >= 0.5, (a, b)
