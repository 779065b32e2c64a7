"""GQA+rotary Llama-architecture LLM end-to-end through the generic ONNX
path (VERDICT round-1 'Missing #1'): export from torch, load via
Model.load_file, generate via the generic Generator, match torch greedy
decode token-for-token. Reference counterpart: qwen2/llama examples driven
by rten-generate (rten-examples/src/qwen2_chat.rs)."""

import numpy as np
import pytest
import torch

from llama_like_model import LlamaLike, export_llama_like, torch_greedy

from rten_tpu.generate import Generator, GeneratorConfig
from rten_tpu.model import Model, ModelOptions


@pytest.fixture(scope="module")
def llama(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("llama") / "llama_like.onnx")
    module = export_llama_like(path)
    return path, module


def test_llama_like_token_exact(llama):
    path, module = llama
    m = Model.load_file(path)  # optimizer ON: fusions must not break GQA
    prompt = [3, 17, 9, 101, 42]
    want = torch_greedy(module, prompt, 10)
    gen = Generator(
        m, prompt, GeneratorConfig(max_seq_len=128, bucket_size=8)
    )
    assert len(gen.kv) == 2 * len(module.layers)
    got = [int(t) for t in gen.generate(10)[0]]
    assert got == want, (got, want)


def test_llama_like_prefill_logits_match(llama):
    """Prefill logits (full prompt, no cache) vs torch, optimizer on."""
    path, module = llama
    m = Model.load_file(path)
    ids = torch.tensor([[5, 250, 33, 7]])
    T = ids.shape[1]
    mask = torch.ones(1, T, dtype=torch.int64)
    pos = torch.arange(T).unsqueeze(0)
    past = [torch.zeros(1, 2, 0, 16) for _ in range(4)]
    with torch.no_grad():
        want = module(ids, mask, pos, *past)[0].numpy()
    feed = {
        "input_ids": ids.numpy(), "attention_mask": mask.numpy(),
        "position_ids": pos.numpy(),
    }
    for i in range(2):
        feed[f"past_key_values.{i}.key"] = np.zeros((1, 2, 0, 16), np.float32)
        feed[f"past_key_values.{i}.value"] = np.zeros((1, 2, 0, 16), np.float32)
    got = np.asarray(m.run(feed, ["logits"])[0])
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_rms_norm_fusion_fires_on_export(llama):
    """Decomposed RMSNorm chains become RMSNormalization ops, and the TP
    derivation then classifies the ONNX-loaded graph correctly (norm ops
    are the Megatron pairing boundaries)."""
    path, module = llama
    m = Model.load_file(path, ModelOptions(optimize=True))
    ops = [op.op_type for _, op in m.graph.operators()]
    # 2 layers x 2 norms + final norm = 5
    assert ops.count("RMSNormalization") == 5, ops.count("RMSNormalization")

    from rten_tpu.parallel.sharding import derive_tp_plan

    plan = derive_tp_plan(m.graph)
    kinds = sorted(plan.values())
    # per layer: q,k,v,gate,up = col x2 layers = 10; o,down = row x2 = 4
    assert kinds.count("col") == 10, kinds
    assert kinds.count("row") == 4, kinds
    assert kinds.count("lm_head") == 1, kinds
