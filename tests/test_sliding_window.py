"""Sliding-window (local) attention: ORT GQA local_window_size semantics
(reference contrib.rs:770): position p attends keys (p-W, p]."""

import jax.numpy as jnp
import numpy as np
import pytest

from rten_tpu.kernels.flash_attention import decode_mha, decode_mha_xla


def _numpy_windowed(q, k, v, lens, W, scale=None):
    B, H, S, D = q.shape
    cap = k.shape[2]
    scale = scale or 1.0 / np.sqrt(D)
    out = np.zeros_like(q)
    for b in range(B):
        for h in range(H):
            for r in range(S):
                p = int(lens[b]) + r
                lo = max(0, p - W + 1) if W else 0
                s = (q[b, h, r] @ k[b, h, lo : p + 1].T) * scale
                e = np.exp(s - s.max())
                w = e / e.sum()
                out[b, h, r] = w @ v[b, h, lo : p + 1]
    return out


@pytest.mark.parametrize("S,W", [(1, 8), (1, 100), (4, 16)])
def test_decode_mha_window_matches_numpy(S, W):
    rng = np.random.default_rng(2)
    B, H, cap, D = 3, 2, 128, 32
    q = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, cap, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, cap, D)), jnp.float32)
    lens = np.asarray([0, 40, cap - S], np.int32)
    got = decode_mha(q, k, v, jnp.asarray(lens), interpret=True, window=W)
    ref = _numpy_windowed(
        np.asarray(q), np.asarray(k), np.asarray(v), lens, W
    )
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-5)
    xla = decode_mha_xla(q, k, v, jnp.asarray(lens), window=W)
    np.testing.assert_allclose(np.asarray(xla), ref, rtol=2e-4, atol=2e-5)


def test_window_larger_than_context_equals_full():
    rng = np.random.default_rng(3)
    B, H, cap, D = 2, 2, 64, 16
    q = jnp.asarray(rng.standard_normal((B, H, 1, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, cap, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, cap, D)), jnp.float32)
    lens = jnp.asarray([10, 63], jnp.int32)
    full = decode_mha(q, k, v, lens, interpret=True)
    win = decode_mha(q, k, v, lens, interpret=True, window=1000)
    np.testing.assert_allclose(np.asarray(win), np.asarray(full), rtol=1e-6)


def test_llama_sliding_window_serving():
    """Mistral-style config through the serving engine: tokens must match
    an engine on the SAME graph only when the window covers the context,
    and the sliding_window graph must differ from full attention once the
    context outgrows the window (the mask actually bites)."""
    from rten_tpu.model import Model, ModelOptions
    from rten_tpu.models import llama
    from rten_tpu.serving import ContinuousBatchingEngine

    base = dict(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128,
    )
    weights = llama.random_weights(llama.LlamaConfig(**base), seed=9)

    def run(sliding):
        cfg = llama.LlamaConfig(**base, sliding_window=sliding)
        g = llama.build_graph_static_cache(cfg, weights, capacity=64)
        m = Model(g, ModelOptions(optimize=True))
        eng = ContinuousBatchingEngine(
            m, n_layer=cfg.num_hidden_layers, n_head=cfg.num_key_value_heads,
            head_dim=cfg.head_dim, slots=1, capacity=64, prefill_bucket=8,
            greedy_on_device=True,
        )
        r = eng.submit(list(range(3, 19)), max_new_tokens=12)
        eng.run()
        return r.generated

    full = run(0)
    wide = run(60)   # window > context for the whole run: same tokens
    assert wide == full
    narrow = run(6)  # context (16 prompt + 12 new) far exceeds the window
    assert narrow != full
