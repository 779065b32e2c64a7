"""In-kernel cache append (decode_mha_append / kernel_append graphs).

The round-4 decode design merges the new KV row into the attention
kernel itself: the row is quantized, scored, and written back through an
aliased 32-row output block — replacing the deferred-KV scheme's recent
windows, window-dus and commit chains (together ~1ms/step at slots=96 in
the round-4 device trace). Reference analog: the KV-cache append in
rten-generate (/root/reference/rten-generate/src/lib.rs), restructured so
the append is a side effect of the attention kernel.

Kernel tests run the Pallas body in interpret mode against the jnp
fallback in decode_attention_append (quantize + row-write + attend) —
outputs must agree and the mutated caches must be BIT-EXACT (identical
quantization math). Serving tests assert token-exactness of
kernel_append graphs against the sequential Generator.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from rten_tpu.kernels.flash_attention import (
    decode_attention_append,
    decode_mha_append,
)

RNG = np.random.default_rng(11)


def _mk(B, H, Hkv, D, cap, quant, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((B, H, 1, D)), jnp.float32)
    kn = jnp.asarray(rng.standard_normal((B, Hkv, 1, D)), jnp.float32)
    vn = jnp.asarray(rng.standard_normal((B, Hkv, 1, D)), jnp.float32)
    if quant:
        k = jnp.asarray(rng.integers(-127, 128, (B, Hkv, cap, D)), jnp.int8)
        v = jnp.asarray(rng.integers(-127, 128, (B, Hkv, cap, D)), jnp.int8)
        ks = jnp.asarray(
            rng.uniform(0.005, 0.02, (B, Hkv, cap, 1)), jnp.float32
        )
        vs = jnp.asarray(
            rng.uniform(0.005, 0.02, (B, Hkv, cap, 1)), jnp.float32
        )
    else:
        k = jnp.asarray(rng.standard_normal((B, Hkv, cap, D)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((B, Hkv, cap, D)), jnp.float32)
        ks = vs = None
    return q, k, v, ks, vs, kn, vn


def _run_both(q, k, v, lens, ks, vs, kn, vn, window=0, block_k=256):
    lens = jnp.asarray(lens, jnp.int32)
    got = decode_mha_append(
        q, k, v, lens, ks, vs, k_new=kn, v_new=vn, window=window,
        block_k=block_k, interpret=True,
    )
    want = decode_attention_append(
        q, k, v, lens, ks, vs, k_new=kn, v_new=vn, window=window,
        use_flash=False,
    )
    return got, want


def _check(got, want, quant):
    np.testing.assert_allclose(
        np.asarray(got[0]), np.asarray(want[0]), rtol=2e-2, atol=5e-3
    )
    # s8 caches bit-exact: identical quantization math on both paths, and
    # rows the kernel does not own must be untouched. f32 scales tolerate
    # 1 ULP (XLA may compile x/127 as x*(1/127) in one program and a true
    # divide in the other).
    for g, w in zip(got[1:], want[1:]):
        g, w = np.asarray(g), np.asarray(w)
        if g.dtype == np.int8 or g.dtype == np.uint8:
            np.testing.assert_array_equal(g, w)
        else:
            np.testing.assert_allclose(
                g.astype(np.float32), w.astype(np.float32),
                rtol=5e-6, atol=0,
            )
    if quant:
        assert len(got) == 5
    else:
        assert len(got) == 3


@pytest.mark.parametrize("quant", [False, True])
@pytest.mark.parametrize(
    "lens", [[0, 100, 255], [31, 32, 64], [255, 1, 128]]
)
def test_append_multiblock_gqa(quant, lens):
    """cap=256 at block_k=128 (2 key blocks): write positions across
    both blocks, including the block boundary (32: first row of a new
    write block) and the final row (255)."""
    q, k, v, ks, vs, kn, vn = _mk(3, 8, 2, 128, 256, quant, seed=1)
    got, want = _run_both(q, k, v, lens, ks, vs, kn, vn, block_k=128)
    _check(got, want, quant)


@pytest.mark.parametrize("quant", [False, True])
def test_append_single_block_mha(quant):
    """H == Hkv, one key block (bk == cap), D=64."""
    q, k, v, ks, vs, kn, vn = _mk(2, 4, 4, 64, 256, quant, seed=2)
    got, want = _run_both(q, k, v, [0, 200], ks, vs, kn, vn)
    _check(got, want, quant)


@pytest.mark.parametrize("lens", [[40, 100]])
def test_append_sliding_window(lens):
    """window=32: the query attends (lens-32, lens] including itself."""
    q, k, v, ks, vs, kn, vn = _mk(2, 4, 4, 64, 256, True, seed=3)
    got, want = _run_both(q, k, v, lens, ks, vs, kn, vn, window=32)
    _check(got, want, True)


def test_append_empty_cache():
    """lens=0 everywhere: only the new row is attended, and no cache row
    other than row 0 may change."""
    q, k, v, ks, vs, kn, vn = _mk(2, 8, 2, 128, 256, True, seed=4)
    got, want = _run_both(q, k, v, [0, 0], ks, vs, kn, vn, block_k=128)
    _check(got, want, True)
    np.testing.assert_array_equal(
        np.asarray(got[1][:, :, 1:]), np.asarray(k[:, :, 1:])
    )


def test_append_bf16_cache():
    """f32 query/new rows into a bf16 cache: the kernel scores the row
    from its cache representation (cast roundtrip), like the fallback."""
    q, k, v, ks, vs, kn, vn = _mk(2, 4, 4, 128, 256, False, seed=5)
    k = k.astype(jnp.bfloat16)
    v = v.astype(jnp.bfloat16)
    got, want = _run_both(q, k, v, [17, 250], ks, vs, kn, vn)
    _check(got, want, False)
    assert got[1].dtype == jnp.bfloat16


# --- cat-layout caches --------------------------------------------------------

from rten_tpu.kernels.flash_attention import (
    cat_to_heads,
    decode_attention_append_cat,
    decode_mha_append_cat,
    heads_to_cat,
)


def _run_cat(q, k, v, lens, ks, vs, kn, vn, window=0, block_k=256):
    """Run the cat kernel (interpret) + its jnp fallback + the 4D kernel
    on the same head-major data; return all three result tuples."""
    lens = jnp.asarray(lens, jnp.int32)
    kc, vc = heads_to_cat(k), heads_to_cat(v)
    got = decode_mha_append_cat(
        q, kc, vc, lens, ks, vs, k_new=kn, v_new=vn, window=window,
        block_k=block_k, interpret=True,
    )
    fb = decode_attention_append_cat(
        q, kc, vc, lens, ks, vs, k_new=kn, v_new=vn, window=window,
        use_flash=False,
    )
    ref = decode_mha_append(
        q, k, v, lens, ks, vs, k_new=kn, v_new=vn, window=window,
        block_k=block_k, interpret=True,
    )
    return got, fb, ref


@pytest.mark.parametrize("quant", [False, True])
@pytest.mark.parametrize("lens", [[0, 100, 255], [31, 255, 128]])
def test_cat_append_matches_headmajor(quant, lens):
    """Cat kernel == 4D kernel (bit-exact caches across the layout map)
    and == its own jnp fallback, across both key blocks."""
    q, k, v, ks, vs, kn, vn = _mk(3, 12, 12, 64, 256, quant, seed=6)
    if quant:
        ks = ks.reshape(3, 12, 256, 1)
        vs = vs.reshape(3, 12, 256, 1)
    got, fb, ref = _run_cat(q, k, v, lens, ks, vs, kn, vn, block_k=128)
    np.testing.assert_allclose(  # cat kernel returns merged-head rows
        np.asarray(got[0]), np.asarray(heads_to_cat(ref[0])),
        rtol=2e-2, atol=5e-3,
    )
    np.testing.assert_array_equal(
        np.asarray(got[1]), np.asarray(heads_to_cat(ref[1]))
    )
    np.testing.assert_array_equal(
        np.asarray(got[2]), np.asarray(heads_to_cat(ref[2]))
    )
    np.testing.assert_allclose(
        np.asarray(got[0]), np.asarray(fb[0]), rtol=2e-2, atol=5e-3
    )
    np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(fb[1]))
    if quant:
        np.testing.assert_allclose(
            np.asarray(got[3]), np.asarray(ref[3].reshape(got[3].shape)),
            rtol=5e-6, atol=0,
        )


def test_cat_append_gqa_window():
    """GQA (group=4) + sliding window on the cat kernel."""
    q, k, v, ks, vs, kn, vn = _mk(2, 8, 2, 64, 256, True, seed=7)
    ks = ks.reshape(2, 2, 256, 1)
    vs = vs.reshape(2, 2, 256, 1)
    got, fb, ref = _run_cat(q, k, v, [40, 200], ks, vs, kn, vn, window=32)
    np.testing.assert_allclose(
        np.asarray(got[0]), np.asarray(heads_to_cat(ref[0])),
        rtol=2e-2, atol=5e-3,
    )
    np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(fb[1]))
    np.testing.assert_array_equal(np.asarray(got[2]), np.asarray(fb[2]))


def test_cat_roundtrip_helpers():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-127, 128, (2, 3, 16, 8)), jnp.int8)
    assert (cat_to_heads(heads_to_cat(x), 3) == x).all()


# --- serving graphs -----------------------------------------------------------

from rten_tpu.generate import Generator, GeneratorConfig
from rten_tpu.model import Model, ModelOptions
from rten_tpu.models import gpt2
from rten_tpu.serving import ContinuousBatchingEngine

PROMPTS = [
    [5, 9, 23, 40, 7],
    [3, 8, 11],
    [77, 2, 19, 50, 4, 33, 6],
    [120, 14],
]


@pytest.fixture(scope="module")
def setup():
    cfg = gpt2.GPT2Config(
        vocab_size=128, n_positions=128, n_embd=32, n_layer=2, n_head=4
    )
    weights = gpt2.random_weights(cfg, seed=7)
    return cfg, weights, gpt2.load(cfg, weights)


def _golden(seq_model, prompts, n_new):
    return [
        Generator(seq_model, [p], GeneratorConfig(bucket_size=8, max_seq_len=64))
        .generate(n_new)[0].tolist()
        for p in prompts
    ]


def _engine(cfg, weights, kv_quant, kernel_append=True, **kw):
    g = gpt2.build_graph_static_cache(
        cfg, weights, capacity=64, kv_quant=kv_quant, deferred_kv=False,
        kernel_append=kernel_append,
    )
    model = Model(g, ModelOptions(optimize=True))
    return ContinuousBatchingEngine(
        model, n_layer=cfg.n_layer, n_head=cfg.n_head,
        head_dim=cfg.head_dim, slots=3, capacity=64, prefill_bucket=8, **kw,
    )


@pytest.mark.parametrize("steps_per_dispatch", [1, 4])
def test_kernel_append_serving_matches_generator(setup, steps_per_dispatch):
    cfg, weights, seq_model = setup
    n_new = 10
    want = _golden(seq_model, PROMPTS, n_new)
    engine = _engine(
        cfg, weights, kv_quant=False,
        greedy_on_device=True, steps_per_dispatch=steps_per_dispatch,
    )
    reqs = [engine.submit(p, max_new_tokens=n_new) for p in PROMPTS]
    engine.run()
    assert [r.generated for r in reqs] == want


@pytest.mark.parametrize("steps_per_dispatch", [1, 4])
def test_kernel_append_int8_matches_duschain(setup, steps_per_dispatch):
    """int8 KV: the kernel-append engine must produce the same tokens as
    the dus-chain int8 engine — both quantize the identical decode rows."""
    cfg, weights, _ = setup
    n_new = 10
    tokens = {}
    for ka in (False, True):
        engine = _engine(
            cfg, weights, kv_quant=True, kernel_append=ka,
            greedy_on_device=True, steps_per_dispatch=steps_per_dispatch,
        )
        reqs = [engine.submit(p, max_new_tokens=n_new) for p in PROMPTS]
        engine.run()
        tokens[ka] = [r.generated for r in reqs]
        assert all(len(t) == n_new for t in tokens[ka])
    assert tokens[True] == tokens[False]


def test_kernel_append_rejects_bad_combos(setup):
    cfg, weights, _ = setup
    with pytest.raises(ValueError):
        gpt2.build_graph_static_cache(
            cfg, weights, capacity=64, deferred_kv=True, kernel_append=True
        )
    with pytest.raises(ValueError):
        gpt2.build_graph_static_cache(
            cfg, weights, capacity=64, kv_quant=True, kv_bits=4,
            kernel_append=True,
        )


@pytest.mark.parametrize("steps_per_dispatch", [1, 4])
def test_gather_last_matches_full_head(setup, steps_per_dispatch):
    """gather_last graphs (prefill lm_head on one row per slot) must
    produce identical tokens to the full-bucket head, across batched
    admission and fused decode."""
    cfg, weights, seq_model = setup
    n_new = 10
    want = _golden(seq_model, PROMPTS, n_new)
    g = gpt2.build_graph_static_cache(
        cfg, weights, capacity=64, kv_quant=True, deferred_kv=False,
        kernel_append=True, gather_last=True,
    )
    model = Model(g, ModelOptions(optimize=True))
    engine = ContinuousBatchingEngine(
        model, n_layer=cfg.n_layer, n_head=cfg.n_head,
        head_dim=cfg.head_dim, slots=3, capacity=64, prefill_bucket=8,
        greedy_on_device=True, steps_per_dispatch=steps_per_dispatch,
    )
    reqs = [engine.submit(p, max_new_tokens=n_new) for p in PROMPTS]
    engine.run()
    got = [r.generated for r in reqs]
    # int8-KV tokens must equal the int8-KV full-head engine
    eng2 = _engine(cfg, weights, kv_quant=True, kernel_append=True,
                   greedy_on_device=True,
                   steps_per_dispatch=steps_per_dispatch)
    reqs2 = [eng2.submit(p, max_new_tokens=n_new) for p in PROMPTS]
    eng2.run()
    assert got == [r.generated for r in reqs2]


def test_gather_last_chunked_prefill(setup):
    """gather_last + chunked prefill: chunk-local last_pos indices."""
    cfg, weights, seq_model = setup
    n_new = 8
    want = _golden(seq_model, PROMPTS, n_new)
    g = gpt2.build_graph_static_cache(
        cfg, weights, capacity=64, deferred_kv=False, gather_last=True,
    )
    model = Model(g, ModelOptions(optimize=True))
    engine = ContinuousBatchingEngine(
        model, n_layer=cfg.n_layer, n_head=cfg.n_head,
        head_dim=cfg.head_dim, slots=3, capacity=64, prefill_bucket=8,
        greedy_on_device=True, chunked_prefill=True,
    )
    reqs = [engine.submit(p, max_new_tokens=n_new) for p in PROMPTS]
    engine.run()
    assert [r.generated for r in reqs] == want


def test_gqa_fold_kernel_matches_fallback():
    """Round-5 GQA fold: the G-slot folded kernel must agree with the jnp
    fallback for group > 1 (head-major q, masked extract)."""
    import jax.numpy as jnp

    from rten_tpu.kernels.flash_attention import (
        decode_attention_append_cat,
        decode_mha_append_cat,
        heads_to_cat,
    )

    rng = np.random.default_rng(5)
    B, Hq, Hkv, D, cap = 8, 16, 4, 64, 256
    q = jnp.asarray(rng.standard_normal((B, Hq, 1, D)), jnp.float32)
    kn = jnp.asarray(rng.standard_normal((B, Hkv, 1, D)), jnp.float32)
    vn = jnp.asarray(rng.standard_normal((B, Hkv, 1, D)), jnp.float32)
    k = heads_to_cat(
        jnp.asarray(rng.integers(-127, 128, (B, Hkv, cap, D)), jnp.int8))
    v = heads_to_cat(
        jnp.asarray(rng.integers(-127, 128, (B, Hkv, cap, D)), jnp.int8))
    ks = jnp.asarray(rng.uniform(0.005, 0.02, (B, Hkv, cap, 1)), jnp.float32)
    vs = jnp.asarray(rng.uniform(0.005, 0.02, (B, Hkv, cap, 1)), jnp.float32)
    lens = jnp.asarray([0, 17, 31, 32, 128, 160, 254, 255], jnp.int32)
    want = decode_attention_append_cat(
        q, k, v, lens, ks, vs, k_new=kn, v_new=vn, use_flash=False)
    got = decode_mha_append_cat(
        q, k, v, lens, ks, vs, k_new=kn, v_new=vn, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got[0]), np.asarray(want[0]), rtol=2e-2, atol=1e-2)
    for g, w in zip(got[1:3], want[1:3]):
        g = np.asarray(g).astype(np.int16)
        w = np.asarray(w).astype(np.int16)
        assert np.abs(g - w).max() <= 1
    for g, w in zip(got[3:], want[3:]):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=1e-6, atol=1e-8)
