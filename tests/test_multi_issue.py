"""dispatches_per_drain: several device-chained fused dispatches per host
read (eos-lagged reads). Tokens must match the one-dispatch-per-drain
engine exactly; overshoot tokens are discarded by the drain."""

import numpy as np
import pytest

from rten_tpu.model import Model, ModelOptions
from rten_tpu.models import gpt2
from rten_tpu.serving import ContinuousBatchingEngine


@pytest.fixture(scope="module")
def model():
    cfg = gpt2.GPT2Config(vocab_size=96, n_positions=64, n_embd=32,
                          n_layer=2, n_head=2)
    graph = gpt2.build_graph_static_cache(
        cfg, gpt2.random_weights(cfg, seed=0), capacity=64
    )
    return cfg, Model(graph, ModelOptions(optimize=True))


def _run(model, d, prompts, max_new=17, eos_id=None):
    cfg, m = model
    eng = ContinuousBatchingEngine(
        m, n_layer=cfg.n_layer, n_head=cfg.n_head, head_dim=cfg.head_dim,
        slots=2, capacity=64, prefill_bucket=8, greedy_on_device=True,
        steps_per_dispatch=4, dispatches_per_drain=d,
    )
    reqs = [eng.submit(p, max_new_tokens=max_new, eos_id=eos_id)
            for p in prompts]
    eng.run()
    return [r.generated for r in reqs]


def test_multi_issue_tokens_match(model):
    prompts = [[5, 9, 23], [40, 7, 12, 3]]
    want = _run(model, 1, prompts)
    got = _run(model, 4, prompts)
    assert got == want
    assert all(len(t) == 17 for t in got)


def test_multi_issue_respects_eos(model):
    # With an eos id that fires mid-stream, overshoot tokens are discarded
    # and outputs still match the d=1 engine.
    prompts = [[5, 9, 23], [40, 7, 12, 3]]
    base = _run(model, 1, prompts, max_new=16)
    eos = base[0][5]  # force an early stop for request 0
    want = _run(model, 1, prompts, max_new=16, eos_id=eos)
    got = _run(model, 4, prompts, max_new=16, eos_id=eos)
    assert got == want


def test_multi_issue_queue_wave(model):
    # More requests than slots: admissions interleave with multi-issue.
    prompts = [[i + 1, i + 2, i + 3] for i in range(6)]
    want = _run(model, 1, prompts)
    got = _run(model, 3, prompts)
    assert got == want


def test_pipeline_with_multi_issue_tail(model):
    """Regression (round-3 review): pipeline_dispatch=True combined with
    dispatches_per_drain>1 crashed at the tail of every workload — the
    serial branch's drain finished requests and then dereferenced
    slot_req over the stale active list."""
    cfg, m = model
    eng = ContinuousBatchingEngine(
        m, n_layer=cfg.n_layer, n_head=cfg.n_head, head_dim=cfg.head_dim,
        slots=2, capacity=64, prefill_bucket=8, greedy_on_device=True,
        steps_per_dispatch=2, dispatches_per_drain=2,
        pipeline_dispatch=True,
    )
    reqs = [eng.submit(p, max_new_tokens=8) for p in ([5, 9, 23], [40, 7])]
    eng.run()
    assert all(len(r.generated) == 8 and r.error is None for r in reqs)
