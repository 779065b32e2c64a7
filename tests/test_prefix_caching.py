"""Shared-prefix (system-prompt) caching: prompts extending a cached
prefix must generate EXACTLY the same tokens as full prefill, for f32 and
quantized KV caches, across slot reuse."""

import numpy as np
import pytest

from rten_tpu.model import Model, ModelOptions
from rten_tpu.models import gpt2
from rten_tpu.serving import ContinuousBatchingEngine

PREFIX = [11, 3, 42, 9, 27, 60]
SUFFIXES = [[5, 9, 23], [7], [80, 2, 2, 14], [33, 90]]


def _model(kv_quant=False, kv_bits=8):
    cfg = gpt2.GPT2Config(
        vocab_size=96, n_positions=128, n_embd=64, n_layer=2, n_head=4
    )
    weights = gpt2.random_weights(cfg, seed=4)
    g = gpt2.build_graph_static_cache(
        cfg, weights, capacity=128, kv_quant=kv_quant, kv_bits=kv_bits
    )
    return cfg, Model(g, ModelOptions(optimize=True))


def _engine(cfg, model, **kw):
    return ContinuousBatchingEngine(
        model, n_layer=cfg.n_layer, n_head=cfg.n_head, head_dim=cfg.head_dim,
        slots=2, capacity=128, prefill_bucket=4, greedy_on_device=True, **kw,
    )


@pytest.mark.parametrize("kv", ["f32", "int8"])
def test_prefix_caching_token_exact(kv):
    cfg, model = _model(kv_quant=(kv == "int8"))
    n_new = 8
    prompts = [PREFIX + s for s in SUFFIXES]

    plain = _engine(cfg, model)
    want = [plain.submit(p, max_new_tokens=n_new) for p in prompts]
    plain.run()

    cached = _engine(cfg, model)
    cached.set_shared_prefix(PREFIX)
    got = [cached.submit(p, max_new_tokens=n_new) for p in prompts]
    cached.run()  # 4 requests over 2 slots: admission reuse covered

    for w, g in zip(want, got):
        assert g.generated == w.generated, (g.generated, w.generated)


def test_prefix_caching_multi_step_dispatch():
    cfg, model = _model()
    prompts = [PREFIX + s for s in SUFFIXES[:2]]
    plain = _engine(cfg, model, steps_per_dispatch=4)
    want = [plain.submit(p, max_new_tokens=8) for p in prompts]
    plain.run()
    cached = _engine(cfg, model, steps_per_dispatch=4)
    cached.set_shared_prefix(PREFIX)
    got = [cached.submit(p, max_new_tokens=8) for p in prompts]
    cached.run()
    for w, g in zip(want, got):
        assert g.generated == w.generated


def test_prefix_caching_rejects_non_extending_prompt():
    """Bad prompts fail at SUBMIT time (a mid-admission raise would drop
    co-admitted requests)."""
    cfg, model = _model()
    eng = _engine(cfg, model)
    eng.set_shared_prefix(PREFIX)
    with pytest.raises(ValueError, match="extend it"):
        eng.submit(PREFIX, max_new_tokens=4)  # equal to prefix: no suffix
    with pytest.raises(ValueError, match="extend it"):
        eng.submit([9] + PREFIX[1:] + [5], max_new_tokens=4)  # wrong prefix


def test_prefix_requires_idle_engine():
    cfg, model = _model()
    eng = _engine(cfg, model)
    eng.submit(PREFIX + [5], max_new_tokens=4)
    with pytest.raises(ValueError, match="idle"):
        eng.set_shared_prefix(PREFIX)


def test_prefix_clear():
    cfg, model = _model()
    eng = _engine(cfg, model)
    eng.set_shared_prefix(PREFIX)
    eng.set_shared_prefix([])  # clears
    r = eng.submit([1, 2, 3], max_new_tokens=4)  # no prefix constraint now
    eng.run()
    assert len(r.generated) == 4


@pytest.mark.parametrize("kv", ["f32", "int8"])
def test_prefix_caching_kernel_append_cat(kv):
    """Shared prefix on round-4 cat-layout kernel-append graphs: the
    prefix rows live at cache axis 1 (not 2) — rank-generic slicing and
    stamping must produce the same tokens as full prefill."""
    cfg = gpt2.GPT2Config(
        vocab_size=96, n_positions=128, n_embd=64, n_layer=2, n_head=4
    )
    weights = gpt2.random_weights(cfg, seed=4)
    g = gpt2.build_graph_static_cache(
        cfg, weights, capacity=128, kv_quant=(kv == "int8"),
        kernel_append=True, gather_last=True,
    )
    model = Model(g, ModelOptions(optimize=True))
    n_new = 8
    prompts = [PREFIX + s for s in SUFFIXES]

    plain = _engine(cfg, model, steps_per_dispatch=4)
    want = [plain.submit(p, max_new_tokens=n_new) for p in prompts]
    plain.run()

    cached = _engine(cfg, model, steps_per_dispatch=4)
    cached.set_shared_prefix(PREFIX)
    got = [cached.submit(p, max_new_tokens=n_new) for p in prompts]
    cached.run()

    for w, g in zip(want, got):
        assert g.generated == w.generated, (g.generated, w.generated)
