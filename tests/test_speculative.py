"""Speculative decoding: draft-proposed tokens verified by the target in
one S=gamma+1 dispatch.

The defining property: OUTPUT TOKENS ARE EXACTLY THE TARGET'S GREEDY
SEQUENCE regardless of the draft (speculation changes latency, never
content). Tested with a same-model draft (every round fully accepted) and
a completely unrelated random draft (rounds mostly rejected).
"""

import numpy as np
import pytest

from rten_tpu.model import Model, ModelOptions
from rten_tpu.models import gpt2
from rten_tpu.serving import ContinuousBatchingEngine, SpeculativeEngine


def _cfg(n_layer=2, seed=0):
    cfg = gpt2.GPT2Config(
        vocab_size=96, n_positions=128, n_embd=64, n_layer=n_layer, n_head=4
    )
    return cfg, gpt2.random_weights(cfg, seed=seed)


def _model(cfg, weights):
    g = gpt2.build_graph_static_cache(cfg, weights, capacity=128)
    return Model(g, ModelOptions(optimize=True))


def _base_engine(cfg, model, **kw):
    return ContinuousBatchingEngine(
        model, n_layer=cfg.n_layer, n_head=cfg.n_head, head_dim=cfg.head_dim,
        slots=2, capacity=128, prefill_bucket=8, greedy_on_device=True, **kw,
    )


PROMPTS = [[5, 9, 23, 40], [7, 3, 60, 11, 2]]


def _reference_tokens(cfg, model, n_new=12):
    eng = _base_engine(cfg, model)
    reqs = [eng.submit(p, max_new_tokens=n_new) for p in PROMPTS]
    eng.run()
    return [r.generated for r in reqs]


@pytest.mark.parametrize("draft_seed,gamma", [(0, 4), (99, 4), (99, 2)])
def test_speculative_matches_plain_greedy(draft_seed, gamma):
    cfg, weights = _cfg()
    target = _model(cfg, weights)
    want = _reference_tokens(cfg, target)

    dcfg, dweights = _cfg(n_layer=1, seed=draft_seed)
    draft = _model(dcfg, dweights)
    eng = SpeculativeEngine(
        target, draft, gamma=gamma,
        n_layer=cfg.n_layer, n_head=cfg.n_head, head_dim=cfg.head_dim,
        slots=2, capacity=128, prefill_bucket=8,
    )
    reqs = [eng.submit(p, max_new_tokens=12) for p in PROMPTS]
    eng.run()
    got = [r.generated for r in reqs]
    assert got == want, (got, want)
    assert eng.stats()["spec_tokens_per_round"] >= 1.0


def test_speculative_perfect_draft_accepts_everything():
    """Draft == target: every round accepts all gamma+1 tokens."""
    cfg, weights = _cfg()
    target = _model(cfg, weights)
    draft = _model(cfg, weights)  # identical model
    gamma = 4
    eng = SpeculativeEngine(
        target, draft, gamma=gamma,
        n_layer=cfg.n_layer, n_head=cfg.n_head, head_dim=cfg.head_dim,
        slots=2, capacity=128, prefill_bucket=8,
    )
    n_new = 15
    reqs = [eng.submit(p, max_new_tokens=n_new) for p in PROMPTS]
    eng.run()
    want = _reference_tokens(cfg, target, n_new=n_new)
    assert [r.generated for r in reqs] == want
    assert eng.stats()["spec_tokens_per_round"] == pytest.approx(gamma + 1)


def test_speculative_eos_and_reuse():
    """eos mid-round trims the accepted block; freed slots re-admit from
    the queue with correct draft-cache resync."""
    cfg, weights = _cfg()
    target = _model(cfg, weights)
    want_full = _reference_tokens(cfg, target, n_new=10)
    eos = want_full[0][4]  # force an eos hit on request 0's 5th token

    dcfg, dweights = _cfg(n_layer=1, seed=7)
    draft = _model(dcfg, dweights)
    eng = SpeculativeEngine(
        target, draft, gamma=3,
        n_layer=cfg.n_layer, n_head=cfg.n_head, head_dim=cfg.head_dim,
        slots=1, capacity=128, prefill_bucket=8,
    )
    r1 = eng.submit(PROMPTS[0], max_new_tokens=10, eos_id=eos)
    r2 = eng.submit(PROMPTS[1], max_new_tokens=6)
    eng.run()
    exp_cut = want_full[0].index(eos) + 1  # FIRST eos occurrence wins
    assert r1.generated == want_full[0][:exp_cut]
    assert r1.generated[-1] == eos
    assert r2.generated == want_full[1][:6]


def test_speculative_capacity_guard():
    cfg, weights = _cfg()
    target = _model(cfg, weights)
    draft = _model(cfg, weights)
    eng = SpeculativeEngine(
        target, draft, gamma=4,
        n_layer=cfg.n_layer, n_head=cfg.n_head, head_dim=cfg.head_dim,
        slots=1, capacity=128, prefill_bucket=8,
    )
    with pytest.raises(ValueError, match="headroom"):
        eng.submit(list(range(1, 60)), max_new_tokens=65)


def test_speculative_with_shared_prefix():
    """Speculation composes with prefix caching: same tokens as the plain
    engine with the same prefix (target admission routes through the
    prefix path; the draft prefills the full prompt)."""
    cfg, weights = _cfg()
    target = _model(cfg, weights)
    prefix = [11, 3, 42, 9]
    prompts = [prefix + s for s in ([5, 9], [7, 3, 60])]

    plain = _base_engine(cfg, target)
    plain.set_shared_prefix(prefix)
    want = [plain.submit(p, max_new_tokens=10) for p in prompts]
    plain.run()

    dcfg, dweights = _cfg(n_layer=1, seed=3)
    draft = _model(dcfg, dweights)
    eng = SpeculativeEngine(
        target, draft, gamma=3,
        n_layer=cfg.n_layer, n_head=cfg.n_head, head_dim=cfg.head_dim,
        slots=2, capacity=128, prefill_bucket=8,
    )
    eng.set_shared_prefix(prefix)
    got = [eng.submit(p, max_new_tokens=10) for p in prompts]
    eng.run()
    assert [r.generated for r in got] == [r.generated for r in want]


def test_speculative_rejects_sampler():
    """speculative x sampled is a documented, TYPED error (round-4 verdict
    #4): acceptance is defined against the target's argmax."""
    from rten_tpu.generate.sampler import DeviceSampler
    from rten_tpu.serving.speculative import SpeculativeEngine

    cfg, weights = _cfg()
    target = _model(cfg, weights)
    draft = _model(*_cfg(seed=1))
    with pytest.raises(ValueError, match="greedy-only"):
        SpeculativeEngine(
            target, draft, n_layer=cfg.n_layer, n_head=cfg.n_head,
            head_dim=cfg.head_dim, slots=2, capacity=128, prefill_bucket=8,
            device_sampler=DeviceSampler(temperature=0.8, top_k=4, seed=0),
        )
