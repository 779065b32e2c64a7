"""MS contrib attention ops: MultiHeadAttention, GroupQueryAttention
(incl. do_rotary), and tokenizer chunking."""

import numpy as np
import torch
import torch.nn.functional as F

from util import assert_close, run_op

RNG = np.random.default_rng(17)


def test_multi_head_attention_basic():
    B, T, H, D = 2, 6, 4, 8
    q = RNG.standard_normal((B, T, H * D)).astype(np.float32)
    k = RNG.standard_normal((B, T, H * D)).astype(np.float32)
    v = RNG.standard_normal((B, T, H * D)).astype(np.float32)

    def heads(x):
        return torch.from_numpy(x).view(B, T, H, D).transpose(1, 2)

    want = (
        F.scaled_dot_product_attention(heads(q), heads(k), heads(v))
        .transpose(1, 2).reshape(B, T, H * D).numpy()
    )
    got = run_op("MultiHeadAttention", [q, k, v], {"num_heads": H})
    assert_close(got, want, rtol=1e-4, atol=1e-5)


def test_multi_head_attention_bias_and_padding_mask():
    B, T, H, D = 1, 5, 2, 4
    q = RNG.standard_normal((B, T, H * D)).astype(np.float32)
    k = RNG.standard_normal((B, T, H * D)).astype(np.float32)
    v = RNG.standard_normal((B, T, H * D)).astype(np.float32)
    bias = RNG.standard_normal((3 * H * D,)).astype(np.float32)
    kpm = np.asarray([[1, 1, 1, 0, 0]], np.int32)  # keep first 3 keys

    qb = q + bias[: H * D]
    kb = k + bias[H * D : 2 * H * D]
    vb = v + bias[2 * H * D :]

    def heads(x):
        return torch.from_numpy(x).view(B, T, H, D).transpose(1, 2)

    mask = torch.where(torch.from_numpy(kpm).bool(), 0.0, -10000.0)[
        :, None, None, :
    ]
    want = (
        F.scaled_dot_product_attention(heads(qb), heads(kb), heads(vb), attn_mask=mask)
        .transpose(1, 2).reshape(B, T, H * D).numpy()
    )
    got = run_op(
        "MultiHeadAttention", [q, k, v, bias, kpm], {"num_heads": H}
    )
    assert_close(got, want, rtol=1e-4, atol=1e-4)


def test_gqa_with_rotary():
    B, S, Hq, Hkv, D = 1, 4, 4, 2, 8
    q = RNG.standard_normal((B, S, Hq * D)).astype(np.float32)
    k = RNG.standard_normal((B, S, Hkv * D)).astype(np.float32)
    v = RNG.standard_normal((B, S, Hkv * D)).astype(np.float32)
    inv = 1.0 / (10000 ** (np.arange(D // 2) / (D // 2)))
    ang = np.arange(32)[:, None] * inv[None, :]
    cos, sin = np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)

    got = run_op(
        "GroupQueryAttention",
        [q, k, v, None, None, None, None, cos, sin],
        {"num_heads": Hq, "kv_num_heads": Hkv, "do_rotary": 1},
    )

    # Manual reference: rotary (half mode) then causal GQA attention.
    def split(x, h):
        return x.reshape(B, S, h, D).transpose(0, 2, 1, 3)

    def rot(x4):
        c = cos[:S][None, None]
        s = sin[:S][None, None]
        x1, x2 = x4[..., : D // 2], x4[..., D // 2 :]
        return np.concatenate([x1 * c - x2 * s, x1 * s + x2 * c], -1)

    q4 = rot(split(q, Hq))
    k4 = np.repeat(rot(split(k, Hkv)), Hq // Hkv, 1)
    v4 = np.repeat(split(v, Hkv), Hq // Hkv, 1)
    scores = np.einsum("bhqd,bhkd->bhqk", q4, k4) / np.sqrt(D)
    mask = np.triu(np.full((S, S), -np.inf), 1)
    scores = scores + mask
    p = np.exp(scores - scores.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    want = np.einsum("bhqk,bhkd->bhqd", p, v4).transpose(0, 2, 1, 3).reshape(B, S, -1)
    assert_close(got, want, rtol=1e-4, atol=1e-5)


def test_tokenizer_encode_chunks():
    from tokenizers import Tokenizer as HFTok, models, pre_tokenizers, trainers

    from rten_tpu.text import Tokenizer

    t = HFTok(models.BPE())
    t.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    t.train_from_iterator(
        ["hello world again and again"] * 4,
        trainers.BpeTrainer(vocab_size=300, initial_alphabet=pre_tokenizers.ByteLevel.alphabet()),
    )
    ours = Tokenizer.from_json(t.to_str())
    text = "hello world again and again hello world"
    full = ours.encode(text).ids
    chunks = ours.encode_chunks(text, max_tokens=4, overlap=1)
    assert all(len(c.ids) <= 4 for c in chunks)
    # Reconstruct: first chunk full, later chunks minus the overlap token.
    recon = list(chunks[0].ids)
    for c in chunks[1:]:
        recon.extend(c.ids[1:])
    assert recon == full


def test_gqa_attention_bias_input():
    """ORT GQA optional input 10 (attention_bias): additive [1,1,S,Tk]
    bias must shift the scores (reference contrib.rs:472 supports it)."""
    import jax.numpy as jnp

    from rten_tpu.ops.registry import get_op

    rng = np.random.default_rng(4)
    B, Hq, Hkv, S, D = 1, 4, 2, 5, 8
    q = rng.standard_normal((B, S, Hq * D)).astype(np.float32)
    k = rng.standard_normal((B, S, Hkv * D)).astype(np.float32)
    v = rng.standard_normal((B, S, Hkv * D)).astype(np.float32)
    bias = rng.standard_normal((1, 1, S, S)).astype(np.float32)

    def run(b):
        ins = [jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
               None, None, None, None, None, None, None,
               jnp.asarray(b) if b is not None else None, None]
        out = get_op("GroupQueryAttention").lower(
            None, ins, {"num_heads": Hq, "kv_num_heads": Hkv,
                        "__n_outputs__": 1},
        )
        return np.asarray(out)

    base = run(None)
    biased = run(bias)
    assert not np.allclose(base, biased)
    # Golden: manual causal+bias attention.
    qq = q.reshape(B, S, Hq, D).transpose(0, 2, 1, 3)
    kk = np.repeat(k.reshape(B, S, Hkv, D).transpose(0, 2, 1, 3), 2, axis=1)
    vv = np.repeat(v.reshape(B, S, Hkv, D).transpose(0, 2, 1, 3), 2, axis=1)
    s = np.einsum("bhqd,bhkd->bhqk", qq, kk) / np.sqrt(D)
    causal = np.where(
        np.arange(S)[None, :] <= np.arange(S)[:, None], 0.0, -1e30
    )
    s = s + causal + bias
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    want = np.einsum("bhqk,bhkd->bhqd", p, vv).transpose(0, 2, 1, 3).reshape(
        B, S, Hq * D
    )
    np.testing.assert_allclose(biased, want, rtol=1e-4, atol=1e-5)


def test_gqa_head_sink():
    """head_sink (input 11): per-head sink logits join the softmax
    denominator (the reference REFUSES this input, contrib.rs:475; here it
    runs). sink=-inf-ish must reduce to plain attention; a huge sink must
    shrink outputs toward zero."""
    import jax.numpy as jnp

    from rten_tpu.ops.registry import get_op

    rng = np.random.default_rng(5)
    B, Hq, Hkv, S, D = 1, 2, 2, 4, 8
    q = rng.standard_normal((B, S, Hq * D)).astype(np.float32)
    k = rng.standard_normal((B, S, Hkv * D)).astype(np.float32)
    v = rng.standard_normal((B, S, Hkv * D)).astype(np.float32)

    def run(sink):
        ins = [jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
               None, None, None, None, None, None, None, None,
               jnp.asarray(sink) if sink is not None else None]
        return np.asarray(get_op("GroupQueryAttention").lower(
            None, ins, {"num_heads": Hq, "kv_num_heads": Hkv,
                        "__n_outputs__": 1},
        ))

    base = run(None)
    tiny = run(np.full(Hq, -1e30, np.float32))
    np.testing.assert_allclose(tiny, base, rtol=1e-5, atol=1e-6)
    big = run(np.full(Hq, 50.0, np.float32))
    assert np.abs(big).max() < np.abs(base).max() * 1e-3


def test_gqa_position_ids_input():
    """ORT GQA input 9 (position_ids) overrides the rotary positions."""
    import jax.numpy as jnp

    from rten_tpu.ops.registry import get_op

    rng = np.random.default_rng(6)
    B, H, S, D = 1, 2, 4, 8
    q = rng.standard_normal((B, S, H * D)).astype(np.float32)
    k = rng.standard_normal((B, S, H * D)).astype(np.float32)
    v = rng.standard_normal((B, S, H * D)).astype(np.float32)
    cos = np.cos(np.outer(np.arange(32), 1 / 10000 ** (np.arange(D // 2) * 2 / D))).astype(np.float32)
    sin = np.sin(np.outer(np.arange(32), 1 / 10000 ** (np.arange(D // 2) * 2 / D))).astype(np.float32)

    def run(pos):
        ins = [jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
               None, None, None, None, jnp.asarray(cos), jnp.asarray(sin),
               jnp.asarray(pos, jnp.int32) if pos is not None else None,
               None, None]
        return np.asarray(get_op("GroupQueryAttention").lower(
            None, ins, {"num_heads": H, "kv_num_heads": H, "do_rotary": 1,
                        "__n_outputs__": 1},
        ))

    default = run(None)                      # positions 0..S-1
    same = run(np.arange(S)[None])
    np.testing.assert_allclose(same, default, rtol=1e-6)
    # A uniform shift is a no-op (RoPE encodes RELATIVE position), so use
    # non-uniformly spaced ids to prove the override is honored.
    stretched = run(np.arange(S)[None] * 3)
    assert not np.allclose(stretched, default)
