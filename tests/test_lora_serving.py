"""Multi-LoRA serving: per-request adapter selection over stacked adapter
weights. A request under adapter j must generate exactly what a model with
A_j @ B_j merged into the base weights generates — including a batch that
mixes adapters across slots."""

import numpy as np
import pytest

from rten_tpu.model import Model, ModelOptions
from rten_tpu.models import gpt2
from rten_tpu.serving import ContinuousBatchingEngine

CFG = dict(vocab_size=96, n_positions=64, n_embd=32, n_layer=2, n_head=4)
RANK, N_ADAPTERS = 4, 3
TARGETS = [("attn.c_attn", 32, 96), ("attn.c_proj", 32, 32)]


def _adapters(cfg, seed=5):
    rng = np.random.default_rng(seed)
    by_name = {}
    for i in range(cfg.n_layer):
        for tgt, kin, kout in TARGETS:
            a = (rng.standard_normal((N_ADAPTERS, kin, RANK)) * 0.1)
            bb = (rng.standard_normal((N_ADAPTERS, RANK, kout)) * 0.1)
            # Adapter 0 is the null adapter (base behavior).
            a[0] = 0.0
            bb[0] = 0.0
            by_name[f"lora.{i}.{tgt}.A"] = a.astype(np.float32)
            by_name[f"lora.{i}.{tgt}.B"] = bb.astype(np.float32)
    return by_name


def _merged_weights(cfg, weights, adapters, j):
    merged = {k: v.copy() for k, v in weights.items()}
    for i in range(cfg.n_layer):
        for tgt, _, _ in TARGETS:
            a = adapters[f"lora.{i}.{tgt}.A"][j]
            bb = adapters[f"lora.{i}.{tgt}.B"][j]
            merged[f"transformer.h.{i}.{tgt}.weight"] += a @ bb
    return merged


def _engine(graph, **kw):
    model = Model(graph, ModelOptions(optimize=True))
    return ContinuousBatchingEngine(
        model, n_layer=CFG["n_layer"], n_head=CFG["n_head"],
        head_dim=CFG["n_embd"] // CFG["n_head"], slots=3, capacity=64,
        prefill_bucket=8, greedy_on_device=True, **kw,
    )


PROMPTS = [[5, 9, 23, 40], [7, 3, 60], [12, 44]]


@pytest.mark.parametrize("steps_per_dispatch", [1, 4])
def test_mixed_adapters_match_merged_models(steps_per_dispatch):
    cfg = gpt2.GPT2Config(**CFG)
    weights = gpt2.random_weights(cfg, seed=2)
    adapters = _adapters(cfg)
    n_new = 8

    # References: one merged model per adapter.
    want = []
    for j, p in enumerate(PROMPTS):
        g = gpt2.build_graph_static_cache(
            cfg, _merged_weights(cfg, weights, adapters, j), capacity=64
        )
        e = _engine(g, steps_per_dispatch=steps_per_dispatch)
        r = e.submit(p, max_new_tokens=n_new)
        e.run()
        want.append(r.generated)

    # One LoRA engine, three adapters mixed in one batch.
    g = gpt2.build_graph_static_cache(
        cfg, weights, capacity=64, lora_rank=RANK, n_adapters=N_ADAPTERS
    )
    eng = _engine(g, steps_per_dispatch=steps_per_dispatch)
    eng.set_lora_adapters(adapters)
    reqs = [
        eng.submit(p, max_new_tokens=n_new, adapter_id=j)
        for j, p in enumerate(PROMPTS)
    ]
    eng.run()
    for j, (r, w) in enumerate(zip(reqs, want)):
        assert r.generated == w, (j, r.generated, w)


def test_null_adapter_matches_base_model():
    cfg = gpt2.GPT2Config(**CFG)
    weights = gpt2.random_weights(cfg, seed=2)
    base = _engine(gpt2.build_graph_static_cache(cfg, weights, capacity=64))
    r0 = base.submit(PROMPTS[0], max_new_tokens=8)
    base.run()

    g = gpt2.build_graph_static_cache(
        cfg, weights, capacity=64, lora_rank=RANK, n_adapters=N_ADAPTERS
    )
    eng = _engine(g)
    eng.set_lora_adapters(_adapters(cfg))
    r = eng.submit(PROMPTS[0], max_new_tokens=8, adapter_id=0)
    eng.run()
    assert r.generated == r0.generated


def test_lora_guards():
    cfg = gpt2.GPT2Config(**CFG)
    weights = gpt2.random_weights(cfg, seed=2)
    base = _engine(gpt2.build_graph_static_cache(cfg, weights, capacity=64))
    with pytest.raises(ValueError, match="lora_rank"):
        base.submit([1, 2], max_new_tokens=8, adapter_id=1)
    with pytest.raises(ValueError, match="lora_rank"):
        base.set_lora_adapters({})

    g = gpt2.build_graph_static_cache(
        cfg, weights, capacity=64, lora_rank=RANK, n_adapters=N_ADAPTERS
    )
    eng = _engine(g)
    with pytest.raises(ValueError, match="missing adapter"):
        eng.set_lora_adapters({})


def test_out_of_range_adapter_rejected():
    """OOB adapter ids would clamp in the device gather (silently serving
    adapter N-1) — submit must reject them."""
    cfg = gpt2.GPT2Config(**CFG)
    weights = gpt2.random_weights(cfg, seed=2)
    g = gpt2.build_graph_static_cache(
        cfg, weights, capacity=64, lora_rank=RANK, n_adapters=N_ADAPTERS
    )
    eng = _engine(g)
    eng.set_lora_adapters(_adapters(cfg))
    with pytest.raises(ValueError, match="out of range"):
        eng.submit([1, 2], max_new_tokens=8, adapter_id=N_ADAPTERS)
