"""Llama-architecture (GQA+rotary) through the continuous-batching engine:
static-cache graph tokens must match the torch reference exactly, f32 and
int8-quantized (correlation for int8)."""

import numpy as np
import pytest
import torch

from llama_like_model import LlamaLike, torch_greedy

from rten_tpu.model import Model, ModelOptions
from rten_tpu.models import llama
from rten_tpu.serving import ContinuousBatchingEngine


@pytest.fixture(scope="module")
def tiny():
    torch.manual_seed(0)
    module = LlamaLike(vocab=256, E=64, Hq=4, Hkv=2, ffn=128, layers=2).eval()
    cfg = llama.LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512,
    )
    weights = llama.weights_from_torch(module)
    return module, cfg, weights


def _engine(cfg, weights, quantize=None, slots=2, capacity=64,
            deferred_kv=False):
    g = llama.build_graph_static_cache(
        cfg, weights, capacity=capacity, deferred_kv=deferred_kv
    )
    if quantize == "int8":
        from rten_tpu.quantize_pass import quantize_dynamic

        quantize_dynamic(g)
    model = Model(g, ModelOptions(optimize=True))
    return ContinuousBatchingEngine(
        model, n_layer=cfg.num_hidden_layers, n_head=cfg.num_key_value_heads,
        head_dim=cfg.head_dim, slots=slots, capacity=capacity,
        prefill_bucket=8, greedy_on_device=True, steps_per_dispatch=4,
    )


def test_llama_engine_matches_torch(tiny):
    module, cfg, weights = tiny
    eng = _engine(cfg, weights)
    prompts = [[3, 17, 9, 101, 42], [7, 7, 200]]
    n_new = 8
    reqs = [eng.submit(p, max_new_tokens=n_new) for p in prompts]
    eng.run()
    for p, r in zip(prompts, reqs):
        want = torch_greedy(module, p, n_new)
        assert r.generated == want, (r.generated, want)


def test_llama_engine_deferred_kv_matches_torch(tiny):
    """GQA+rotary through the deferred-KV (recent window) serving path."""
    module, cfg, weights = tiny
    eng = _engine(cfg, weights, deferred_kv=True)
    prompts = [[3, 17, 9, 101, 42], [7, 7, 200]]
    n_new = 8
    reqs = [eng.submit(p, max_new_tokens=n_new) for p in prompts]
    eng.run()
    for p, r in zip(prompts, reqs):
        want = torch_greedy(module, p, n_new)
        assert r.generated == want, (r.generated, want)


def test_llama_engine_int8_generates(tiny):
    module, cfg, weights = tiny
    eng = _engine(cfg, weights, quantize="int8")
    prompt = [3, 17, 9, 101, 42]
    req = eng.submit(prompt, max_new_tokens=8)
    eng.run()
    want = torch_greedy(module, prompt, 8)
    agree = np.mean(np.array(req.generated) == np.array(want))
    assert agree >= 0.5, (req.generated, want)


@pytest.mark.parametrize("kv_bits,deferred", [(8, False), (8, True),
                                              (4, False), (4, True)])
def test_llama_quantized_kv_tracks_torch(tiny, kv_bits, deferred):
    """GQA + in-op rotary over a QUANTIZED KV cache (int8 s8 / int4
    nibble-packed): greedy tokens should mostly agree with the torch
    reference on a tiny model (quantization noise allowed)."""
    module, cfg, weights = tiny
    g = llama.build_graph_static_cache(
        cfg, weights, capacity=64, kv_quant=True, kv_bits=kv_bits,
        deferred_kv=deferred,
    )
    model = Model(g, ModelOptions(optimize=True))
    eng = ContinuousBatchingEngine(
        model, n_layer=cfg.num_hidden_layers, n_head=cfg.num_key_value_heads,
        head_dim=cfg.head_dim, slots=2, capacity=64,
        prefill_bucket=8, greedy_on_device=True, steps_per_dispatch=4,
    )
    assert len(eng.caches) == 4 * cfg.num_hidden_layers
    want_dtype = np.uint8 if kv_bits == 4 else np.int8
    assert eng.caches[0].dtype == want_dtype
    prompts = [[3, 17, 9, 101, 42], [7, 7, 200]]
    n_new = 8
    reqs = [eng.submit(p, max_new_tokens=n_new) for p in prompts]
    eng.run()
    floor = 0.5 if kv_bits == 8 else 0.4
    for p, r in zip(prompts, reqs):
        want = torch_greedy(module, p, n_new)
        agree = np.mean(np.asarray(r.generated) == np.asarray(want))
        assert agree >= floor, (kv_bits, deferred, r.generated, want)


def test_qwen2_style_attention_bias_matches_torch():
    """Qwen2 = Llama + q/k/v projection biases (LlamaConfig
    attention_bias=True; reference counterpart rten-examples qwen2_chat):
    serving tokens must match the torch reference exactly."""
    torch.manual_seed(1)
    module = LlamaLike(
        vocab=256, E=64, Hq=4, Hkv=2, ffn=128, layers=2, qkv_bias=True
    ).eval()
    cfg = llama.LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, attention_bias=True,
    )
    weights = llama.weights_from_torch(module)
    assert "model.layers.0.self_attn.q_proj.bias" in weights
    eng = _engine(cfg, weights)
    prompts = [[3, 17, 9, 101, 42], [7, 7, 200]]
    reqs = [eng.submit(p, max_new_tokens=8) for p in prompts]
    eng.run()
    for p, r in zip(prompts, reqs):
        want = torch_greedy(module, p, 8)
        assert r.generated == want, (r.generated, want)


def test_llama_engine_kernel_append_matches_torch(tiny):
    """GQA+rotary through the round-4 cat-layout kernel-append path
    (caches [slots, cap, Hkv*D]); tokens must still match torch exactly."""
    module, cfg, weights = tiny
    g = llama.build_graph_static_cache(
        cfg, weights, capacity=64, kernel_append=True
    )
    model = Model(g, ModelOptions(optimize=True))
    eng = ContinuousBatchingEngine(
        model, n_layer=cfg.num_hidden_layers, n_head=cfg.num_key_value_heads,
        head_dim=cfg.head_dim, slots=2, capacity=64,
        prefill_bucket=8, greedy_on_device=True, steps_per_dispatch=4,
    )
    prompts = [[3, 17, 9, 101, 42], [7, 7, 200]]
    n_new = 8
    reqs = [eng.submit(p, max_new_tokens=n_new) for p in prompts]
    eng.run()
    for p, r in zip(prompts, reqs):
        want = torch_greedy(module, p, n_new)
        assert r.generated == want, (r.generated, want)


def test_llama_engine_kernel_append_int8_kv(tiny):
    """Quantized-KV (int8) cat kernel-append on the GQA family: tokens
    match the dus-chain int8-KV engine exactly (identical quantization)."""
    module, cfg, weights = tiny
    toks = {}
    for ka in (False, True):
        g = llama.build_graph_static_cache(
            cfg, weights, capacity=64, kv_quant=True, kernel_append=ka
        )
        model = Model(g, ModelOptions(optimize=True))
        eng = ContinuousBatchingEngine(
            model, n_layer=cfg.num_hidden_layers,
            n_head=cfg.num_key_value_heads, head_dim=cfg.head_dim,
            slots=2, capacity=64, prefill_bucket=8,
            greedy_on_device=True, steps_per_dispatch=4,
        )
        reqs = [eng.submit(p, max_new_tokens=8)
                for p in ([3, 17, 9, 101, 42], [7, 7, 200])]
        eng.run()
        toks[ka] = [r.generated for r in reqs]
        assert all(len(t) == 8 for t in toks[ka])
    assert toks[True] == toks[False]
