"""Continuous-batching engine vs the sequential Generator (greedy goldens)."""

import numpy as np
import pytest

from rten_tpu.generate import Generator, GeneratorConfig
from rten_tpu.model import Model, ModelOptions
from rten_tpu.models import gpt2
from rten_tpu.serving import ContinuousBatchingEngine


@pytest.fixture(scope="module")
def models():
    cfg = gpt2.GPT2Config(
        vocab_size=128, n_positions=128, n_embd=32, n_layer=2, n_head=4
    )
    weights = gpt2.random_weights(cfg, seed=7)
    seq_model = gpt2.load(cfg, weights)
    static_graph = gpt2.build_graph_static_cache(cfg, weights, capacity=64)
    static_model = Model(static_graph, ModelOptions(optimize=True))
    return cfg, weights, seq_model, static_model


def make_engine(cfg, static_model, slots=3, **kw):
    return ContinuousBatchingEngine(
        static_model,
        n_layer=cfg.n_layer,
        n_head=cfg.n_head,
        head_dim=cfg.head_dim,
        slots=slots,
        capacity=64,
        prefill_bucket=8,
        **kw,
    )


def test_engine_matches_generator(models):
    cfg, weights, seq_model, static_model = models
    prompts = [
        [5, 9, 23, 40, 7],
        [3, 8, 11],
        [77, 2, 19, 50, 4, 33, 6],
        [120, 14],
        [9, 9, 9, 9],
    ]
    n_new = 10
    want = {}
    for i, p in enumerate(prompts):
        want[i] = Generator(
            seq_model, [p], GeneratorConfig(bucket_size=8, max_seq_len=64)
        ).generate(n_new)[0].tolist()

    engine = make_engine(cfg, static_model, slots=3)
    reqs = [engine.submit(p, max_new_tokens=n_new) for p in prompts]
    finished = engine.run()
    assert len(finished) == len(prompts)
    for i, req in enumerate(reqs):
        assert req.done
        assert req.generated == want[i], f"request {i}"
        assert req.ttft_s is not None and req.finished_at is not None


@pytest.mark.parametrize("steps_per_dispatch", [1, 4])
def test_engine_greedy_on_device(models, steps_per_dispatch):
    """On-device argmax + fused multi-step decode match the Generator."""
    cfg, weights, seq_model, static_model = models
    prompts = [[5, 9, 23, 40, 7], [3, 8, 11], [77, 2, 19, 50, 4, 33, 6]]
    n_new = 9  # not a multiple of steps_per_dispatch
    want = [
        Generator(seq_model, [p], GeneratorConfig(bucket_size=8)).generate(n_new)[0].tolist()
        for p in prompts
    ]
    engine = make_engine(
        cfg, static_model, slots=2,
        greedy_on_device=True, steps_per_dispatch=steps_per_dispatch,
    )
    reqs = [engine.submit(p, max_new_tokens=n_new) for p in prompts]
    engine.run()
    for req, exp in zip(reqs, want):
        assert req.generated == exp
        assert len(req.generated) == n_new


def test_engine_more_requests_than_slots(models):
    cfg, weights, seq_model, static_model = models
    engine = make_engine(cfg, static_model, slots=2)
    reqs = [engine.submit([i + 1, i + 2], max_new_tokens=4) for i in range(7)]
    finished = engine.run()
    assert len(finished) == 7
    assert all(len(r.generated) == 4 for r in reqs)
    assert engine.decode_tokens > 0


def test_engine_eos_stops(models):
    cfg, weights, seq_model, static_model = models
    # Find what greedy generates, then set eos to the 3rd token.
    p = [5, 9, 23, 40, 7]
    ref = Generator(
        seq_model, [p], GeneratorConfig(bucket_size=8)
    ).generate(8)[0].tolist()
    eos = ref[2]
    engine = make_engine(cfg, static_model)
    req = engine.submit(p, max_new_tokens=8, eos_id=eos)
    engine.run()
    # Stops at the FIRST occurrence of eos (which may precede index 2 when
    # the random model repeats itself).
    assert req.generated == ref[: ref.index(eos) + 1]
