"""Deferred-KV serving graphs (recent window + once-per-dispatch commit).

The deferred-KV scheme replaces the per-slot dus chain that ran every
decode step (558us/step at slots=32 in the round-3 device trace) with one
uniform-index write into a small per-dispatch "recent" window, committed
into the big caches once per fused dispatch. Reference analog: the KV
cache append in rten-generate (/root/reference/rten-generate/src/lib.rs)
— here restructured for TPU so the in-scan write has a static index.

These tests assert token-exactness of the deferred engine against the
sequential Generator, across f32/int8 KV, fused multi-step, multi-issue
dispatch, and mid-dispatch finishes.
"""

import numpy as np
import pytest

from rten_tpu.generate import Generator, GeneratorConfig
from rten_tpu.model import Model, ModelOptions
from rten_tpu.models import gpt2
from rten_tpu.serving import ContinuousBatchingEngine


@pytest.fixture(scope="module")
def setup():
    cfg = gpt2.GPT2Config(
        vocab_size=128, n_positions=128, n_embd=32, n_layer=2, n_head=4
    )
    weights = gpt2.random_weights(cfg, seed=7)
    seq_model = gpt2.load(cfg, weights)
    return cfg, weights, seq_model


def build_static(cfg, weights, kv_quant=False, deferred_kv=True):
    g = gpt2.build_graph_static_cache(
        cfg, weights, capacity=64, kv_quant=kv_quant, deferred_kv=deferred_kv
    )
    return Model(g, ModelOptions(optimize=True))


def make_engine(cfg, model, slots=3, **kw):
    return ContinuousBatchingEngine(
        model,
        n_layer=cfg.n_layer,
        n_head=cfg.n_head,
        head_dim=cfg.head_dim,
        slots=slots,
        capacity=64,
        prefill_bucket=8,
        **kw,
    )


PROMPTS = [
    [5, 9, 23, 40, 7],
    [3, 8, 11],
    [77, 2, 19, 50, 4, 33, 6],
    [120, 14],
    [9, 9, 9, 9],
]


def golden(seq_model, prompts, n_new):
    return [
        Generator(seq_model, [p], GeneratorConfig(bucket_size=8, max_seq_len=64))
        .generate(n_new)[0].tolist()
        for p in prompts
    ]


@pytest.mark.parametrize("steps_per_dispatch", [1, 4])
def test_deferred_f32_matches_generator(setup, steps_per_dispatch):
    cfg, weights, seq_model = setup
    model = build_static(cfg, weights, deferred_kv=True)
    n_new = 10  # not a multiple of steps_per_dispatch
    want = golden(seq_model, PROMPTS, n_new)
    engine = make_engine(
        cfg, model, slots=3,
        greedy_on_device=True, steps_per_dispatch=steps_per_dispatch,
    )
    reqs = [engine.submit(p, max_new_tokens=n_new) for p in PROMPTS]
    engine.run()
    for i, (req, exp) in enumerate(zip(reqs, want)):
        assert req.generated == exp, f"request {i}"


def test_deferred_multi_issue(setup):
    """dispatches_per_drain>1 chains commits across dispatches on device."""
    cfg, weights, seq_model = setup
    model = build_static(cfg, weights, deferred_kv=True)
    n_new = 12
    want = golden(seq_model, PROMPTS, n_new)
    engine = make_engine(
        cfg, model, slots=3,
        greedy_on_device=True, steps_per_dispatch=3, dispatches_per_drain=2,
    )
    reqs = [engine.submit(p, max_new_tokens=n_new) for p in PROMPTS]
    engine.run()
    for i, (req, exp) in enumerate(zip(reqs, want)):
        assert req.generated == exp, f"request {i}"


def test_deferred_int8_kv_matches_nondeferred(setup):
    """int8-KV: windows stay f32 in-dispatch, quantized at commit. The
    committed rows quantize the same values the non-deferred path does, so
    tokens must match the non-deferred int8-KV engine exactly."""
    cfg, weights, seq_model = setup
    n_new = 10
    tokens = {}
    for deferred in (False, True):
        model = build_static(cfg, weights, kv_quant=True, deferred_kv=deferred)
        engine = make_engine(
            cfg, model, slots=3,
            greedy_on_device=True, steps_per_dispatch=5,
        )
        reqs = [engine.submit(p, max_new_tokens=n_new) for p in PROMPTS]
        engine.run()
        tokens[deferred] = [r.generated for r in reqs]
        assert all(len(t) == n_new for t in tokens[deferred])
    # In-dispatch rows are attended at f32 in the deferred path but int8 in
    # the non-deferred one, so allow the tail to diverge slightly; prefix
    # agreement catches gross indexing/commit bugs.
    for a, b in zip(tokens[False], tokens[True]):
        assert a[:4] == b[:4]


def test_deferred_tp_sharded_matches(setup):
    """TP-sharded deferred engine (virtual 8-device mesh) matches unsharded:
    the recent windows are scan-local arrays, so XLA must propagate the
    head-axis sharding through the window append + commit."""
    from rten_tpu.parallel import MeshConfig, make_mesh, shard_constants

    cfg = gpt2.GPT2Config(
        vocab_size=96, n_positions=64, n_embd=64, n_layer=2, n_head=8
    )
    weights = gpt2.random_weights(cfg, seed=5)
    g = gpt2.build_graph_static_cache(
        cfg, weights, capacity=64, deferred_kv=True
    )
    model = Model(g, ModelOptions(optimize=True))

    def run(params=None):
        eng = ContinuousBatchingEngine(
            model, n_layer=cfg.n_layer, n_head=cfg.n_head,
            head_dim=cfg.head_dim, slots=2, capacity=64, prefill_bucket=8,
            greedy_on_device=True, steps_per_dispatch=2, params=params,
        )
        reqs = [eng.submit(p, max_new_tokens=6) for p in [[5, 9, 23], [40, 7, 12, 3]]]
        eng.run()
        return [r.generated for r in reqs]

    want = run()
    mesh = make_mesh(MeshConfig(1, 8))
    got = run(shard_constants(g, mesh))
    assert got == want


def test_deferred_eos_mid_dispatch(setup):
    """Requests finishing mid-dispatch (eos) must not corrupt later ones."""
    cfg, weights, seq_model = setup
    model = build_static(cfg, weights, deferred_kv=True)
    n_new = 10
    want = golden(seq_model, PROMPTS, n_new)
    eos = want[0][3]  # forces request 0 to stop early
    engine = make_engine(
        cfg, model, slots=2, greedy_on_device=True, steps_per_dispatch=4,
    )
    reqs = [
        engine.submit(p, max_new_tokens=n_new, eos_id=eos) for p in PROMPTS
    ]
    engine.run()
    for i, (req, exp) in enumerate(zip(reqs, want)):
        stop = exp.index(eos) + 1 if eos in exp else n_new
        assert req.generated == exp[:stop], f"request {i}"


def test_deferred_rejects_one_token_prefill_bucket(setup):
    """prefill_bucket=1 would make prefill trace as a decode step and
    silently drop the prompt KV into discarded window outputs — the
    engine must refuse it up front (round-3 review finding)."""
    cfg, weights, _ = setup
    m = build_static(cfg, weights)
    with pytest.raises(ValueError, match="prefill_bucket"):
        ContinuousBatchingEngine(
            m, n_layer=cfg.n_layer, n_head=cfg.n_head,
            head_dim=cfg.head_dim, slots=2, capacity=64, prefill_bucket=1,
            greedy_on_device=True, steps_per_dispatch=4,
        )
