"""BASELINE-config model families end-to-end: ResNet (bottleneck CNN),
DistilBERT, MNIST-style nets — f32 vs torch, plus int8 quantized runs."""

import numpy as np
import pytest
import torch

from onnx_export_util import export_onnx
from torch_models import resnet_tiny
from util import assert_close

from rten_tpu.model import Model, ModelOptions
from rten_tpu.quantize_pass import quantize_dynamic

RNG = np.random.default_rng(9)


@pytest.fixture(scope="module")
def resnet_onnx(tmp_path_factory):
    torch.manual_seed(0)
    m = resnet_tiny().eval()
    x = torch.randn(1, 3, 64, 64)
    path = str(tmp_path_factory.mktemp("m") / "resnet.onnx")
    export_onnx(m, x, path, ["image"], ["logits"])
    return m, x, path


def test_resnet_f32_matches_torch(resnet_onnx):
    m, x, path = resnet_onnx
    model = Model.load_file(path)
    with torch.no_grad():
        want = m(x).numpy()
    got = np.asarray(model.run({"image": x.numpy()})[0])
    assert_close(got, want, rtol=1e-3, atol=1e-4)


def test_resnet_int8_top1_agrees(resnet_onnx):
    m, x, path = resnet_onnx
    model = Model.load_file(path, ModelOptions(optimize=True))
    quantize_dynamic(model.graph)
    model.executor._weights = None  # new q8 constants must be lifted
    with torch.no_grad():
        want = m(x).numpy()
    got = np.asarray(model.run({"image": x.numpy()})[0])
    # int8 conv quantization: top-1 must agree, values loosely.
    assert np.argmax(got) == np.argmax(want)
    corr = np.corrcoef(got.ravel(), want.ravel())[0, 1]
    assert corr > 0.99, corr


def test_distilbert_matches_transformers(tmp_path):
    from transformers import DistilBertConfig, DistilBertForSequenceClassification

    torch.manual_seed(0)
    cfg = DistilBertConfig(
        vocab_size=200, dim=48, n_layers=2, n_heads=4, hidden_dim=96,
        max_position_embeddings=64,
    )
    m = DistilBertForSequenceClassification(cfg).eval()
    ids = torch.randint(0, 200, (2, 12))
    mask = torch.ones_like(ids)
    path = str(tmp_path / "distilbert.onnx")
    export_onnx(
        m, (ids, mask), path, ["input_ids", "attention_mask"], ["logits"]
    )
    model = Model.load_file(path)
    with torch.no_grad():
        want = m(input_ids=ids, attention_mask=mask).logits.numpy()
    got = np.asarray(
        model.run({"input_ids": ids.numpy(), "attention_mask": mask.numpy()})[0]
    )
    assert_close(got, want, rtol=1e-3, atol=1e-4)

    # int8 path
    quantize_dynamic(model.graph)
    model.executor._weights = None
    got_q = np.asarray(
        model.run({"input_ids": ids.numpy(), "attention_mask": mask.numpy()})[0]
    )
    assert np.argmax(got_q, -1).tolist() == np.argmax(want, -1).tolist()
