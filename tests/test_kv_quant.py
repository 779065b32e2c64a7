"""INT8 KV cache: serving engine with quantized cache vs f32 cache."""

import numpy as np

from rten_tpu.model import Model, ModelOptions
from rten_tpu.models import gpt2
from rten_tpu.serving import ContinuousBatchingEngine


def _engine(cfg, graph, **kw):
    model = Model(graph, ModelOptions(optimize=True))
    return ContinuousBatchingEngine(
        model, n_layer=cfg.n_layer, n_head=cfg.n_head, head_dim=cfg.head_dim,
        slots=2, capacity=64, prefill_bucket=8, greedy_on_device=True, **kw,
    )


def test_int8_kv_cache_tracks_f32():
    cfg = gpt2.GPT2Config(
        vocab_size=96, n_positions=64, n_embd=64, n_layer=2, n_head=4
    )
    weights = gpt2.random_weights(cfg, seed=11)
    g_f32 = gpt2.build_graph_static_cache(cfg, weights, capacity=64)
    g_q = gpt2.build_graph_static_cache(cfg, weights, capacity=64, kv_quant=True)

    prompts = [[5, 9, 23, 40], [7, 3, 60]]
    n_new = 10

    e1 = _engine(cfg, g_f32)
    r1 = [e1.submit(p, max_new_tokens=n_new) for p in prompts]
    e1.run()
    e2 = _engine(cfg, g_q)
    # Cache buffers discovered from graph IO: 4 per layer when quantized.
    assert len(e2.caches) == 4 * cfg.n_layer
    assert e2.caches[0].dtype == np.int8
    r2 = [e2.submit(p, max_new_tokens=n_new) for p in prompts]
    e2.run()

    for a, b in zip(r1, r2):
        assert len(b.generated) == n_new
        agree = np.mean(np.asarray(a.generated) == np.asarray(b.generated))
        # int8 KV introduces small noise; greedy argmax should still agree
        # on most steps for a random tiny model.
        assert agree >= 0.5, (a.generated, b.generated)


def test_int8_kv_multi_step():
    cfg = gpt2.GPT2Config(
        vocab_size=96, n_positions=64, n_embd=64, n_layer=2, n_head=4
    )
    weights = gpt2.random_weights(cfg, seed=12)
    g_q = gpt2.build_graph_static_cache(cfg, weights, capacity=64, kv_quant=True)
    e_single = _engine(cfg, g_q)
    e_multi = _engine(cfg, g_q, steps_per_dispatch=4)
    p = [5, 9, 23, 40]
    a = e_single.submit(p, max_new_tokens=8)
    e_single.run()
    b = e_multi.submit(p, max_new_tokens=8)
    e_multi.run()
    assert a.generated == b.generated


def test_int4_kv_cache_tracks_f32():
    """kv_bits=4: nibble-packed u8 cache at D/2 lanes; greedy decoding
    should mostly agree with f32 on a tiny random model."""
    cfg = gpt2.GPT2Config(
        vocab_size=96, n_positions=64, n_embd=64, n_layer=2, n_head=4
    )
    weights = gpt2.random_weights(cfg, seed=11)
    g_f32 = gpt2.build_graph_static_cache(cfg, weights, capacity=64)
    g_q = gpt2.build_graph_static_cache(
        cfg, weights, capacity=64, kv_quant=True, kv_bits=4
    )

    prompts = [[5, 9, 23, 40], [7, 3, 60]]
    n_new = 10

    e1 = _engine(cfg, g_f32)
    r1 = [e1.submit(p, max_new_tokens=n_new) for p in prompts]
    e1.run()
    e2 = _engine(cfg, g_q)
    assert len(e2.caches) == 4 * cfg.n_layer
    assert e2.caches[0].dtype == np.uint8
    assert e2.caches[0].shape[-1] == cfg.head_dim // 2
    r2 = [e2.submit(p, max_new_tokens=n_new) for p in prompts]
    e2.run()

    for a, b in zip(r1, r2):
        assert len(b.generated) == n_new
        agree = np.mean(np.asarray(a.generated) == np.asarray(b.generated))
        # int4 is noisier than int8; a random tiny model should still
        # track f32 greedy argmax on a plurality of steps.
        assert agree >= 0.4, (a.generated, b.generated)


def test_int4_kv_multi_step():
    cfg = gpt2.GPT2Config(
        vocab_size=96, n_positions=64, n_embd=64, n_layer=2, n_head=4
    )
    weights = gpt2.random_weights(cfg, seed=12)
    g_q = gpt2.build_graph_static_cache(
        cfg, weights, capacity=64, kv_quant=True, kv_bits=4
    )
    e_single = _engine(cfg, g_q)
    e_multi = _engine(cfg, g_q, steps_per_dispatch=4)
    p = [5, 9, 23, 40]
    a = e_single.submit(p, max_new_tokens=8)
    e_single.run()
    b = e_multi.submit(p, max_new_tokens=8)
    e_multi.run()
    assert a.generated == b.generated


def test_int4_kv_deferred_multi_step():
    """Deferred-KV + int4: decode rows buffer f32 in the recent window and
    pack to nibbles only at the per-dispatch commit; single-step and fused
    multi-step must agree token-exactly."""
    cfg = gpt2.GPT2Config(
        vocab_size=96, n_positions=64, n_embd=64, n_layer=2, n_head=4
    )
    weights = gpt2.random_weights(cfg, seed=13)
    g_q = gpt2.build_graph_static_cache(
        cfg, weights, capacity=64, kv_quant=True, kv_bits=4, deferred_kv=True
    )
    e_single = _engine(cfg, g_q)
    e_multi = _engine(cfg, g_q, steps_per_dispatch=4)
    p = [5, 9, 23, 40]
    a = e_single.submit(p, max_new_tokens=8)
    e_single.run()
    b = e_multi.submit(p, max_new_tokens=8)
    e_multi.run()
    assert a.generated == b.generated
