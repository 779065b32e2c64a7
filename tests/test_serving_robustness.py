"""Serving robustness: backpressure, cancellation, timeouts, health check,
deterministic restart (SURVEY.md section 5 failure-detection design;
round-1 VERDICT Missing #7)."""

import numpy as np
import pytest

from rten_tpu.model import Model, ModelOptions
from rten_tpu.models import gpt2
from rten_tpu.serving import ContinuousBatchingEngine
from rten_tpu.serving.engine import QueueFull


@pytest.fixture(scope="module")
def engine_factory():
    cfg = gpt2.GPT2Config(vocab_size=96, n_positions=64, n_embd=32,
                          n_layer=2, n_head=2)
    weights = gpt2.random_weights(cfg, seed=0)
    graph = gpt2.build_graph_static_cache(cfg, weights, capacity=64)
    model = Model(graph, ModelOptions(optimize=True))

    def make(**kw):
        return ContinuousBatchingEngine(
            model, n_layer=cfg.n_layer, n_head=cfg.n_head,
            head_dim=cfg.head_dim, slots=2, capacity=64, prefill_bucket=8,
            greedy_on_device=True, steps_per_dispatch=4, **kw,
        )

    return make


def test_backpressure_queue_full(engine_factory):
    eng = engine_factory(max_queue=2)
    eng.submit([1, 2, 3], max_new_tokens=8)
    eng.submit([4, 5], max_new_tokens=8)
    with pytest.raises(QueueFull):
        eng.submit([6], max_new_tokens=8)
    eng.run()


def test_cancel_queued_and_running(engine_factory):
    eng = engine_factory()
    r1 = eng.submit([1, 2, 3], max_new_tokens=16)
    r2 = eng.submit([4, 5], max_new_tokens=16)
    r3 = eng.submit([6, 7], max_new_tokens=16)  # waits in queue (2 slots)
    assert eng.cancel(r3)
    assert r3.done and r3.cancelled and not r3.generated
    eng.step()  # admits + first tokens
    assert eng.cancel(r1)
    eng.run()
    assert r1.cancelled and r1.done
    assert r2.done and not r2.cancelled
    assert len(r2.generated) == 16


def test_timeout_expires_requests(engine_factory):
    eng = engine_factory()
    r = eng.submit([1, 2], max_new_tokens=50, timeout_s=0.0)
    r.submitted_at -= 1.0
    eng.step()
    assert r.done and r.timed_out


def test_health_ok(engine_factory):
    eng = engine_factory()
    h = eng.health()
    assert h["status"] == "ok"
    assert h["active_slots"] == 0


def test_restart_is_deterministic(engine_factory):
    eng = engine_factory()
    prompt = [3, 9, 27]
    done = eng.submit(prompt, max_new_tokens=8)
    eng.run()
    want = list(done.generated)

    eng2 = engine_factory()
    r = eng2.submit(prompt, max_new_tokens=8)
    eng2.step()  # partially decoded
    assert r.generated
    requeued = eng2.restart()
    assert r in requeued and not r.generated
    eng2.run()
    assert r.generated == want


def test_chunked_prefill_matches_batch_prefill(engine_factory):
    """Chunked admission (fixed [slots, bucket] executable at per-slot
    offsets) produces the same tokens as whole-prompt prefill, including
    while another slot is mid-decode."""
    rng = np.random.default_rng(7)
    long_prompt = rng.integers(1, 90, 30).tolist()  # ~4 chunks of 8
    short_prompt = [5, 9, 12]

    ref = engine_factory()
    r_long = ref.submit(long_prompt, max_new_tokens=10)
    r_short = ref.submit(short_prompt, max_new_tokens=10)
    ref.run()

    eng = engine_factory(chunked_prefill=True)
    # Start the short request decoding first, then admit the long one so
    # chunked prefill runs against live decode state.
    c_short = eng.submit(short_prompt, max_new_tokens=10)
    eng.step()
    c_long = eng.submit(long_prompt, max_new_tokens=10)
    eng.run()

    assert c_long.generated == r_long.generated
    assert c_short.generated == r_short.generated
    # One executable regardless of prompt length.
    assert eng._chunk_prefill_fn is not None
