"""On-device sampling inside the fused k-step dispatch (round-2 verdict
Weak #5 / next-round #3): temperature/top-k/top-p serving no longer
collapses steps_per_dispatch to 1. Reference samplers:
rten-generate/src/sampler.rs:12."""

import numpy as np
import pytest

from rten_tpu.generate.sampler import DeviceSampler
from rten_tpu.model import Model, ModelOptions
from rten_tpu.models import gpt2
from rten_tpu.serving import ContinuousBatchingEngine

RNG = np.random.default_rng(0)


def test_device_transform_matches_host_transform():
    """The jittable filter chain and its numpy mirror keep the same token
    set (identical -inf masks and finite values)."""
    import jax

    logits = RNG.standard_normal((4, 50)).astype(np.float32) * 3
    for ds in (
        DeviceSampler(temperature=0.7),
        DeviceSampler(top_k=5),
        DeviceSampler(top_p=0.8),
        DeviceSampler(temperature=0.9, top_k=10, top_p=0.9),
    ):
        dev = np.asarray(jax.jit(ds.transform)(logits))
        host = ds.transform_host(logits)
        np.testing.assert_array_equal(np.isinf(dev), np.isinf(host))
        m = ~np.isinf(host)
        np.testing.assert_allclose(dev[m], host[m].astype(np.float32), rtol=1e-5)


@pytest.fixture(scope="module")
def model():
    cfg = gpt2.GPT2Config(vocab_size=96, n_positions=64, n_embd=32,
                          n_layer=2, n_head=2)
    graph = gpt2.build_graph_static_cache(
        cfg, gpt2.random_weights(cfg, seed=0), capacity=64
    )
    return cfg, Model(graph, ModelOptions(optimize=True))


def _engine(model, **kw):
    cfg, m = model
    return ContinuousBatchingEngine(
        m, n_layer=cfg.n_layer, n_head=cfg.n_head, head_dim=cfg.head_dim,
        slots=2, capacity=64, prefill_bucket=8, **kw,
    )


def test_sampled_serving_keeps_fused_dispatch(model):
    ds = DeviceSampler(temperature=0.8, top_k=20, seed=7)
    eng = _engine(model, device_sampler=ds, steps_per_dispatch=4)
    # The whole point: sampling must NOT collapse the fused dispatch.
    assert eng.steps_per_dispatch == 4
    assert not eng.greedy_on_device
    reqs = [eng.submit([3, 14, 15], max_new_tokens=9),
            eng.submit([9, 2, 6, 5], max_new_tokens=9)]
    eng.run()
    assert all(len(r.generated) == 9 for r in reqs)
    # Multi-step dispatches actually ran (9 tokens in >=2 fused calls, not
    # 9 single steps): steps counts k per dispatch.
    assert eng.steps >= 8


def test_sampling_deterministic_for_fixed_seed(model):
    def run_once():
        ds = DeviceSampler(temperature=0.8, top_k=20, seed=123)
        eng = _engine(model, device_sampler=ds, steps_per_dispatch=4)
        reqs = [eng.submit([3, 14, 15], max_new_tokens=9),
                eng.submit([9, 2, 6, 5], max_new_tokens=9)]
        eng.run()
        return [r.generated for r in reqs]

    a, b = run_once(), run_once()
    assert a == b

    ds2 = DeviceSampler(temperature=0.8, top_k=20, seed=124)
    eng = _engine(model, device_sampler=ds2, steps_per_dispatch=4)
    reqs = [eng.submit([3, 14, 15], max_new_tokens=9),
            eng.submit([9, 2, 6, 5], max_new_tokens=9)]
    eng.run()
    c = [r.generated for r in reqs]
    assert c != a  # different seed diverges (overwhelmingly likely)


def test_near_zero_temperature_matches_greedy(model):
    greedy = _engine(model, greedy_on_device=True, steps_per_dispatch=4)
    reqs = [greedy.submit([3, 14, 15], max_new_tokens=8),
            greedy.submit([9, 2, 6, 5], max_new_tokens=8)]
    greedy.run()
    want = [r.generated for r in reqs]

    ds = DeviceSampler(temperature=1e-6, seed=1)
    eng = _engine(model, device_sampler=ds, steps_per_dispatch=4)
    reqs2 = [eng.submit([3, 14, 15], max_new_tokens=8),
             eng.submit([9, 2, 6, 5], max_new_tokens=8)]
    eng.run()
    assert [r.generated for r in reqs2] == want


def test_restart_resets_sampling_state(model):
    ds = DeviceSampler(temperature=0.8, top_k=20, seed=5)
    eng = _engine(model, device_sampler=ds, steps_per_dispatch=4)
    r1 = eng.submit([3, 14, 15], max_new_tokens=8)
    eng.run()
    first = list(r1.generated)

    # Fresh engine, same seed, interrupted mid-flight then restarted:
    # deterministic recovery must regenerate the same tokens.
    eng2 = _engine(model, device_sampler=ds, steps_per_dispatch=4)
    r2 = eng2.submit([3, 14, 15], max_new_tokens=8)
    eng2.step()
    assert not r2.done
    requeued = eng2.restart()
    assert r2 in requeued
    eng2.run()
    assert r2.generated == first
