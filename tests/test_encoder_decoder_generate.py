"""Generic encoder-decoder generation through the ONNX path.

An Optimum-merged-style decoder (real ONNX If on use_cache_branch, growing
past_key_values.N.decoder.* caches, frozen past_key_values.N.encoder.*
cross caches with EMPTY dummy presents after the first run) is exported
from torch and driven end-to-end by the generic Generator — the behavior
rten implements in rten-generate/src/generator.rs:267-322,891-915.
"""

import numpy as np
import pytest
import torch

from merged_decoder_model import MergedDecoder, export_merged_decoder

from rten_tpu.generate import Generator, GeneratorConfig
from rten_tpu.model import Model, ModelOptions


@pytest.fixture(scope="module")
def merged(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("enc_dec") / "merged.onnx")
    module = export_merged_decoder(path)
    return path, module


def _torch_greedy(module: MergedDecoder, enc: torch.Tensor, prompt, n_steps):
    """Reference greedy decode driving the torch module with real caches."""
    H, D = 4, 8
    zdec = torch.zeros(1, H, 0, D)
    zenc = torch.zeros(1, H, 0, D)
    flag = torch.tensor(False)
    ids = torch.tensor([prompt], dtype=torch.int64)
    caches = [zdec, zdec, zenc, zenc, zdec, zdec, zenc, zenc]
    toks = []
    with torch.no_grad():
        for step in range(n_steps):
            out = module(ids, enc, flag, *caches)
            logits = out[0]
            dk0, dv0, ek0, ev0, dk1, dv1, ek1, ev1 = out[1:]
            if step == 0:
                cross = [ek0, ev0, ek1, ev1]
            caches = [dk0, dv0, cross[0], cross[1], dk1, dv1, cross[2], cross[3]]
            flag = torch.tensor(True)
            tok = int(torch.argmax(logits[0, -1]))
            toks.append(tok)
            ids = torch.tensor([[tok]], dtype=torch.int64)
    return toks


def test_merged_decoder_generates_token_exact(merged):
    path, module = merged
    m = Model.load_file(path, ModelOptions(optimize=False))

    torch.manual_seed(3)
    enc = torch.randn(1, 5, 32)
    prompt = [1, 7, 2]
    n_new = 8
    want = _torch_greedy(module, enc, prompt, n_new)

    gen = Generator(
        m, prompt,
        GeneratorConfig(
            max_seq_len=64,
            constant_inputs={"encoder_hidden_states": enc.numpy()},
        ),
    )
    # Model has no attention_mask: generator must fall back to exact shapes.
    assert gen.config.bucket_size == 1
    assert len(gen.kv) == 4 and len(gen.cross_kv) == 4
    got = [int(t) for t in gen.generate(n_new)[0]]
    assert got == want, (got, want)
    # Cross caches were computed once and frozen with the encoder length.
    for e in gen.cross_kv:
        assert np.asarray(gen._cross[e.input_name]).shape[2] == 5


def test_merged_decoder_optimized_matches(merged):
    """Same run with the graph optimizer on (If folding must survive)."""
    path, module = merged
    m = Model.load_file(path, ModelOptions(optimize=True))
    torch.manual_seed(4)
    enc = torch.randn(1, 5, 32)
    prompt = [4, 9]
    want = _torch_greedy(module, enc, prompt, 6)
    gen = Generator(
        m, prompt,
        GeneratorConfig(
            max_seq_len=64,
            constant_inputs={"encoder_hidden_states": enc.numpy()},
        ),
    )
    got = [int(t) for t in gen.generate(6)[0]]
    assert got == want


def test_session_roundtrip_with_cross_kv(merged, tmp_path):
    path, module = merged
    m = Model.load_file(path, ModelOptions(optimize=False))
    enc = torch.randn(1, 5, 32)
    cfg = GeneratorConfig(
        max_seq_len=64, constant_inputs={"encoder_hidden_states": enc.numpy()}
    )
    gen = Generator(m, [1, 2], cfg)
    first3 = [int(t) for t in gen.generate(3)[0]]
    sess = str(tmp_path / "sess.safetensors")
    gen.save_session(sess)

    gen2 = Generator(m, [1, 2], cfg)
    gen2.restore_session(sess)
    cont = [int(t) for t in gen2.generate(3)[0]]

    want = _torch_greedy(module, enc, [1, 2], 6)
    assert first3 + cont == want
