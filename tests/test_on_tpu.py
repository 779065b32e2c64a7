"""Real-TPU validation: kernels in compiled (non-interpret) mode and the
TPU-selected code paths vs their XLA/CPU-fallback goldens.

Skipped unless RTEN_TPU_TESTS=1 (the default suite forces the CPU backend;
these tests need the real chip and its remote-compile latency budget).
Run: RTEN_TPU_TESTS=1 python -m pytest tests/test_on_tpu.py -q -p no:cacheprovider
(WITHOUT the conftest CPU forcing — i.e. from a shell where JAX_PLATFORMS
is unset; conftest only forces CPU when the env doesn't opt in).
"""

import os

import numpy as np
import pytest

if not os.environ.get("RTEN_TPU_TESTS"):
    pytest.skip("RTEN_TPU_TESTS not set", allow_module_level=True)

import jax

if jax.default_backend() != "tpu":
    pytest.skip("no TPU backend", allow_module_level=True)

RNG = np.random.default_rng(5)


def test_int8_matmul_on_tpu():
    from rten_tpu.kernels.int8_matmul import (
        int8_matmul_dequant,
        int8_matmul_dequant_xla,
    )

    a = RNG.integers(0, 255, (130, 300)).astype(np.uint8)
    b = RNG.integers(-127, 127, (300, 257)).astype(np.int8)
    got = np.asarray(int8_matmul_dequant(a, b, np.float32(0.01), np.float32(0.02),
                                         np.uint8(120), np.int8(-5)))
    want = np.asarray(int8_matmul_dequant_xla(a, b, np.float32(0.01),
                                              np.float32(0.02), np.uint8(120),
                                              np.int8(-5)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_flash_attention_on_tpu():
    from rten_tpu.kernels.flash_attention import mha_pallas, mha_xla

    B, H, Tq, Tk, D = 1, 4, 128, 256, 64
    q = RNG.standard_normal((B, H, Tq, D)).astype(np.float32)
    k = RNG.standard_normal((B, H, Tk, D)).astype(np.float32)
    v = RNG.standard_normal((B, H, Tk, D)).astype(np.float32)
    mask = np.where(np.arange(Tk) < 40, -1e30, 0.0).astype(np.float32)[None, :]
    got = np.asarray(mha_pallas(q, k, v, mask, causal=True))
    want = np.asarray(mha_xla(q, k, v, mask, causal=True))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=1e-2)


def test_generator_tpu_matches_cpu_tokens():
    """Greedy decode on TPU must produce the same tokens as the traced
    graph evaluated without the Pallas/flash fast paths."""
    from rten_tpu.generate import Generator, GeneratorConfig
    from rten_tpu.model import Model, ModelOptions
    from rten_tpu.models import gpt2
    from rten_tpu.runtime.executor import RunConfig

    cfg = gpt2.GPT2Config(vocab_size=128, n_positions=64, n_embd=64,
                          n_layer=2, n_head=4)
    weights = gpt2.random_weights(cfg, seed=3)
    fast = gpt2.load(cfg, weights)
    slow = gpt2.load(
        cfg, weights,
        options=ModelOptions(run_config=RunConfig(
            use_pallas_int8=False, use_flash_attention=False)),
    )
    prompt = [5, 9, 23, 40, 7]
    a = Generator(fast, [prompt], GeneratorConfig(bucket_size=8)).generate(10)[0]
    b = Generator(slow, [prompt], GeneratorConfig(bucket_size=8)).generate(10)[0]
    np.testing.assert_array_equal(a, b)


def test_int4_matmul_on_tpu():
    from rten_tpu.kernels.int4_matmul import (
        _unpack_zero_points,
        int4_matmul_pallas,
        int4_matmul_xla,
    )

    k, n, bs = 512, 256, 32
    a = RNG.standard_normal((16, k)).astype(np.float32)
    bp = RNG.integers(0, 255, (n, k // 2)).astype(np.uint8)
    sc = RNG.uniform(0.01, 0.1, (n, k // bs)).astype(np.float32)
    zps = np.asarray(_unpack_zero_points(None, n, k // bs))
    got = np.asarray(int4_matmul_pallas(a, bp, sc, zps, K=k, N=n, block_size=bs))
    want = np.asarray(int4_matmul_xla(a, bp, sc, zps, K=k, N=n, block_size=bs))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_decode_mha_on_tpu():
    """Per-slot decode attention (serving hot path) compiled on TPU."""
    import jax.numpy as jnp

    from rten_tpu.kernels.flash_attention import decode_mha, decode_mha_xla

    B, H, cap, D, S = 4, 4, 256, 64, 1
    q = jnp.asarray(RNG.standard_normal((B, H, S, D)), jnp.float32)
    k = jnp.asarray(RNG.standard_normal((B, H, cap, D)), jnp.float32)
    v = jnp.asarray(RNG.standard_normal((B, H, cap, D)), jnp.float32)
    lens = jnp.asarray([0, 17, 128, cap - S], jnp.int32)
    got = np.asarray(decode_mha(q, k, v, lens))
    want = np.asarray(decode_mha_xla(q, k, v, lens))
    # MXU dots run at default precision (bf16 multiply passes) on TPU.
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_decode_mha_int8_kv_on_tpu():
    import jax.numpy as jnp

    from rten_tpu.kernels.flash_attention import decode_mha, decode_mha_xla

    B, H, cap, D, S = 4, 4, 256, 64, 2
    q = jnp.asarray(RNG.standard_normal((B, H, S, D)), jnp.float32)
    k8 = jnp.asarray(RNG.integers(-127, 127, (B, H, cap, D)), jnp.int8)
    v8 = jnp.asarray(RNG.integers(-127, 127, (B, H, cap, D)), jnp.int8)
    ks = jnp.asarray(RNG.uniform(0.005, 0.02, (B, H, cap)), jnp.float32)
    vs = jnp.asarray(RNG.uniform(0.005, 0.02, (B, H, cap)), jnp.float32)
    lens = jnp.asarray([3, 50, 128, 200], jnp.int32)
    got = np.asarray(decode_mha(q, k8, v8, lens, ks, vs))
    want = np.asarray(decode_mha_xla(q, k8, v8, lens, ks, vs))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=1e-2)


def test_decode_mha_gqa_on_tpu():
    import jax.numpy as jnp

    from rten_tpu.kernels.flash_attention import decode_mha, decode_mha_xla

    B, Hq, Hkv, cap, D, S = 2, 8, 2, 128, 64, 1
    q = jnp.asarray(RNG.standard_normal((B, Hq, S, D)), jnp.float32)
    k = jnp.asarray(RNG.standard_normal((B, Hkv, cap, D)), jnp.float32)
    v = jnp.asarray(RNG.standard_normal((B, Hkv, cap, D)), jnp.float32)
    lens = jnp.asarray([5, 100], jnp.int32)
    got = np.asarray(decode_mha(q, k, v, lens))
    want = np.asarray(decode_mha_xla(q, k, v, lens))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_decode_mha_nt_folded_recent_window_on_tpu():
    """Round-3 serving hot path compiled on the chip: NT-folded kernel
    (S=1), bf16 recent window, valid-prefix clamp, f32 cache."""
    import jax.numpy as jnp

    from rten_tpu.kernels.flash_attention import decode_mha, decode_mha_xla

    B, H, S, D, cap, rk = 4, 4, 1, 64, 512, 8
    q = jnp.asarray(RNG.standard_normal((B, H, S, D)), jnp.float32)
    k = jnp.asarray(RNG.standard_normal((B, H, cap, D)), jnp.float32)
    v = jnp.asarray(RNG.standard_normal((B, H, cap, D)), jnp.float32)
    rkw = jnp.asarray(RNG.standard_normal((B, H, rk, D)), jnp.bfloat16)
    rvw = jnp.asarray(RNG.standard_normal((B, H, rk, D)), jnp.bfloat16)
    lens = jnp.asarray([0, 100, 256, 300], jnp.int32)
    t = jnp.int32(2)
    got = decode_mha(q, k, v, lens, recent_k=rkw, recent_v=rvw, t=t,
                     block_k=256)
    want = decode_mha_xla(q, k, v, lens, recent_k=rkw, recent_v=rvw, t=t)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-2, atol=1e-2
    )


def test_decode_mha_nt_int8_kv_on_tpu():
    """NT-folded kernel with int8 KV (per-position scales on the merged
    lane axis) — the headline-default configuration."""
    import jax.numpy as jnp

    from rten_tpu.kernels.flash_attention import decode_mha, decode_mha_xla

    B, H, S, D, cap, rk = 4, 4, 1, 64, 256, 8
    q = jnp.asarray(RNG.standard_normal((B, H, S, D)), jnp.float32)
    k = jnp.asarray(RNG.integers(-127, 127, (B, H, cap, D)), jnp.int8)
    v = jnp.asarray(RNG.integers(-127, 127, (B, H, cap, D)), jnp.int8)
    ks = jnp.asarray(RNG.uniform(0.005, 0.02, (B, H, cap)), jnp.float32)
    vs = jnp.asarray(RNG.uniform(0.005, 0.02, (B, H, cap)), jnp.float32)
    rkw = jnp.asarray(RNG.standard_normal((B, H, rk, D)), jnp.bfloat16)
    rvw = jnp.asarray(RNG.standard_normal((B, H, rk, D)), jnp.bfloat16)
    lens = jnp.asarray([3, 50, 128, 200], jnp.int32)
    t = jnp.int32(1)
    got = decode_mha(q, k, v, lens, ks, vs, recent_k=rkw, recent_v=rvw,
                     t=t, block_k=128)
    want = decode_mha_xla(q, k, v, lens, ks, vs,
                          recent_k=rkw, recent_v=rvw, t=t)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-2, atol=1e-2
    )


def test_decode_mha_inkernel_append_on_tpu():
    """In-kernel DMA append (f32 window, D=128): the aliased window must
    come back with the new row written and scored."""
    import jax.numpy as jnp

    from rten_tpu.kernels.flash_attention import (
        decode_attention_deferred,
        decode_mha_xla,
    )

    B, H, S, D, cap, rk = 2, 4, 1, 128, 256, 8
    q = jnp.asarray(RNG.standard_normal((B, H, S, D)), jnp.float32)
    k = jnp.asarray(RNG.standard_normal((B, H, cap, D)), jnp.float32)
    v = jnp.asarray(RNG.standard_normal((B, H, cap, D)), jnp.float32)
    rkw = jnp.asarray(RNG.standard_normal((B, H, rk, D)), jnp.float32)
    rvw = jnp.asarray(RNG.standard_normal((B, H, rk, D)), jnp.float32)
    kn = jnp.asarray(RNG.standard_normal((B, H, 1, D)), jnp.float32)
    vn = jnp.asarray(RNG.standard_normal((B, H, 1, D)), jnp.float32)
    lens = jnp.asarray([100, 250], jnp.int32)
    t = jnp.int32(3)
    out, rk2, rv2 = decode_attention_deferred(
        q, k, v, lens, None, None, recent_k=rkw, recent_v=rvw, t=t,
        k_new=kn, v_new=vn,
    )
    rk_want = rkw.at[:, :, 3:4, :].set(kn)
    rv_want = rvw.at[:, :, 3:4, :].set(vn)
    want = decode_mha_xla(q, k, v, lens, recent_k=rk_want,
                          recent_v=rv_want, t=t)
    np.testing.assert_allclose(np.asarray(rk2), np.asarray(rk_want))
    np.testing.assert_allclose(np.asarray(rv2), np.asarray(rv_want))
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(want), rtol=2e-2, atol=1e-2
    )


def test_skinny_m_int8_matmul_on_tpu():
    """Decode-shape (M=16) int8 matmul through the skinny-M block path —
    the configuration that retired the pallas_int8_min_m concession."""
    from rten_tpu.kernels.int8_matmul import (
        int8_matmul_dequant,
        int8_matmul_dequant_xla,
    )

    for m, k, n in ((16, 768, 768), (16, 768, 3072), (16, 3072, 768)):
        a = RNG.integers(0, 255, (m, k)).astype(np.uint8)
        b = RNG.integers(-127, 127, (k, n)).astype(np.int8)
        got = np.asarray(int8_matmul_dequant(
            a, b, np.float32(0.01), np.float32(0.02), np.uint8(120), None))
        want = np.asarray(int8_matmul_dequant_xla(
            a, b, np.float32(0.01), np.float32(0.02), np.uint8(120), None))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-3)


def test_paged_decode_mha_on_tpu():
    """Paged (block-table) decode attention compiled on the chip == the
    gather + XLA reference, shuffled non-contiguous table."""
    from rten_tpu.kernels.flash_attention import (
        decode_mha_xla,
        paged_decode_mha,
        paged_gather_kv,
    )

    B, H, D, BS, MB, NB = 4, 12, 64, 64, 4, 20
    pool_k = RNG.standard_normal((NB, H, BS, D)).astype(np.float32)
    pool_v = RNG.standard_normal((NB, H, BS, D)).astype(np.float32)
    bt = RNG.permutation(np.arange(1, NB))[: B * MB].reshape(B, MB)
    bt = bt.astype(np.int32)
    lens = np.array([5, 255, 64, 130], np.int32)
    q = RNG.standard_normal((B, H, 1, D)).astype(np.float32)

    got = np.asarray(paged_decode_mha(q, pool_k, pool_v, lens, bt))
    kf = paged_gather_kv(pool_k, bt)
    vf = paged_gather_kv(pool_v, bt)
    want = np.asarray(decode_mha_xla(q, kf, vf, lens))
    # Both sides run MXU dots at the TPU default (bf16-pass) precision;
    # the blocked kernel contracts in a different order than the single
    # XLA dot, so agreement is at bf16-accumulation level (same tolerance
    # as the other decode-kernel tests, max observed ~6e-3).
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=1e-2)


def test_decode_append_kernels_on_tpu():
    """Round-4 append kernels on real hardware: the 4D and cat-layout
    variants must agree with the jnp fallback (quantize + row-write +
    attend) on output AND mutated caches at the headline shape."""
    import jax.numpy as jnp

    from rten_tpu.kernels.flash_attention import (
        decode_attention_append,
        decode_attention_append_cat,
        decode_mha_append,
        decode_mha_append_cat,
        heads_to_cat,
    )

    B, H, Hkv, D, cap = 8, 12, 12, 64, 256
    q = jnp.asarray(RNG.standard_normal((B, H, 1, D)), jnp.float32)
    kn = jnp.asarray(RNG.standard_normal((B, Hkv, 1, D)), jnp.float32)
    vn = jnp.asarray(RNG.standard_normal((B, Hkv, 1, D)), jnp.float32)
    k = jnp.asarray(RNG.integers(-127, 128, (B, Hkv, cap, D)), jnp.int8)
    v = jnp.asarray(RNG.integers(-127, 128, (B, Hkv, cap, D)), jnp.int8)
    ks = jnp.asarray(RNG.uniform(0.005, 0.02, (B, Hkv, cap, 1)), jnp.float32)
    vs = jnp.asarray(RNG.uniform(0.005, 0.02, (B, Hkv, cap, 1)), jnp.float32)
    lens = jnp.asarray(RNG.integers(0, 256, (B,)), jnp.int32)

    def check(got, want):
        np.testing.assert_allclose(
            np.asarray(got[0]), np.asarray(want[0]), rtol=2e-2, atol=5e-3
        )
        # s8 caches: Mosaic and XLA may compile the absmax/127 divide as a
        # reciprocal multiply on one side (1-ULP scale difference), which
        # can flip a knife-edge round by 1 LSB — tolerate exactly that.
        for g, w in zip(got[1:3], want[1:3]):
            g = np.asarray(g).astype(np.int16)
            w = np.asarray(w).astype(np.int16)
            assert np.abs(g - w).max() <= 1, np.abs(g - w).max()
            assert (g != w).mean() < 1e-3  # knife-edges are rare

    got = decode_mha_append(q, k, v, lens, ks, vs, k_new=kn, v_new=vn)
    want = decode_attention_append(
        q, k, v, lens, ks, vs, k_new=kn, v_new=vn, use_flash=False,
    )
    check(got, want)

    kc, vc = heads_to_cat(k), heads_to_cat(v)
    gotc = decode_mha_append_cat(q, kc, vc, lens, ks, vs, k_new=kn, v_new=vn)
    wantc = decode_attention_append_cat(
        q, kc, vc, lens, ks, vs, k_new=kn, v_new=vn, use_flash=False,
    )
    check(gotc, wantc)


def test_argmax_pallas_on_tpu():
    """Pallas last-axis argmax vs jnp on the serving logits shape,
    including tie-breaking (first occurrence)."""
    import jax.numpy as jnp

    from rten_tpu.kernels.argmax import argmax_lastdim_pallas

    x = jnp.asarray(RNG.standard_normal((96, 50257)), jnp.float32)
    got = argmax_lastdim_pallas(x)
    want = jnp.argmax(x, axis=-1)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    t = np.zeros((8, 50257), np.float32)
    t[:, 7] = 3.0
    t[:, 40000] = 3.0
    got = argmax_lastdim_pallas(jnp.asarray(t))
    assert (np.asarray(got) == 7).all()


def test_fold_append_kernel_on_tpu():
    """Round-5 G-slot folded append kernel (the headline decode path)
    compiled on the chip vs the jnp fallback, MHA and GQA."""
    import jax.numpy as jnp

    from rten_tpu.kernels.flash_attention import (
        decode_attention_append_cat,
        decode_mha_append_cat,
        heads_to_cat,
    )

    # (Hq, Hkv, window): MHA, GQA, and GQA + sliding-window (all three
    # route through the vectorized fold on this shape).
    for Hq, Hkv, window in ((12, 12, 0), (16, 4, 0), (16, 4, 32)):
        B, D, cap = 8, 64, 256
        q = jnp.asarray(RNG.standard_normal((B, Hq, 1, D)), jnp.float32)
        kn = jnp.asarray(RNG.standard_normal((B, Hkv, 1, D)), jnp.float32)
        vn = jnp.asarray(RNG.standard_normal((B, Hkv, 1, D)), jnp.float32)
        k = heads_to_cat(jnp.asarray(
            RNG.integers(-127, 128, (B, Hkv, cap, D)), jnp.int8))
        v = heads_to_cat(jnp.asarray(
            RNG.integers(-127, 128, (B, Hkv, cap, D)), jnp.int8))
        ks = jnp.asarray(
            RNG.uniform(0.005, 0.02, (B, Hkv, cap, 1)), jnp.float32)
        vs = jnp.asarray(
            RNG.uniform(0.005, 0.02, (B, Hkv, cap, 1)), jnp.float32)
        lens = jnp.asarray(RNG.integers(0, cap, (B,)), jnp.int32)
        got = decode_mha_append_cat(
            q, k, v, lens, ks, vs, k_new=kn, v_new=vn, window=window)
        want = decode_attention_append_cat(
            q, k, v, lens, ks, vs, k_new=kn, v_new=vn, window=window,
            use_flash=False)
        # windowed sums average 8x fewer keys, so bf16-vs-f32 spread is
        # wider (measured envelope ~0.18 vs 0.02 unwindowed)
        atol = 2e-1 if window else 1e-2
        np.testing.assert_allclose(
            np.asarray(got[0]), np.asarray(want[0]), rtol=2e-2, atol=atol)
        for g, w in zip(got[1:3], want[1:3]):
            g = np.asarray(g).astype(np.int16)
            w = np.asarray(w).astype(np.int16)
            assert np.abs(g - w).max() <= 1


def test_paged_append_kernel_on_tpu():
    """Round-5 paged kernel-append (block-table index maps) on the chip."""
    import jax.numpy as jnp

    from rten_tpu.kernels.flash_attention import (
        _append_cat_paged_fallback,
        decode_mha_append_cat,
    )

    B, H, D = 4, 12, 64
    HkvD = H * D
    # (BSk, MB) = (64, 4): per-slot grid kernel; (256, 1): the round-5
    # paged VEC FOLD (per-slot DMA gather through the table).
    for BSk, MB, NB in ((64, 4, 18), (256, 1, 6)):
        q = jnp.asarray(RNG.standard_normal((B, H, 1, D)), jnp.float32)
        kn = jnp.asarray(RNG.standard_normal((B, H, 1, D)), jnp.float32)
        vn = jnp.asarray(RNG.standard_normal((B, H, 1, D)), jnp.float32)
        pool_k = jnp.asarray(
            RNG.integers(-127, 128, (NB, BSk, HkvD)), jnp.int8)
        pool_v = jnp.asarray(
            RNG.integers(-127, 128, (NB, BSk, HkvD)), jnp.int8)
        ks = jnp.asarray(
            RNG.uniform(0.005, 0.02, (NB, H, 1, BSk)), jnp.float32)
        vs = jnp.asarray(
            RNG.uniform(0.005, 0.02, (NB, H, 1, BSk)), jnp.float32)
        bt = jnp.asarray(
            RNG.permutation(np.arange(1, NB))[: B * MB].reshape(B, MB),
            jnp.int32)
        lens = jnp.asarray([0, 17, 130, 255], jnp.int32)
        got = decode_mha_append_cat(
            q, pool_k, pool_v, lens, ks, vs, k_new=kn, v_new=vn,
            block_table=bt)
        want = _append_cat_paged_fallback(
            q, pool_k, pool_v, lens, ks, vs, k_new=kn, v_new=vn,
            scale=1 / np.sqrt(D), window=0, use_flash=False, block_table=bt)
        for g, w in zip(got[1:3], want[1:3]):
            g = np.asarray(g).astype(np.int16)
            w = np.asarray(w).astype(np.int16)
            assert np.abs(g - w).max() <= 1
        # Attention-output golden from the kernel's OWN appended pools: the
        # append itself may legitimately round ±1 int8 code vs the fallback
        # (checked above), and at lens==0 the one-token softmax would expose
        # that full quant step in the output. Reading back what the kernel
        # stored keeps the output tolerance at bf16-MXU level instead.
        out, nk, nv, nks, nvs = (np.asarray(x) for x in got)
        btn = np.asarray(bt)
        for b in range(B):
            L = int(lens[b]) + 1
            ids = btn[b, np.arange(L) // BSk]
            off = np.arange(L) % BSk
            kd = nk[ids, off].reshape(L, H, D) \
                * nks[ids, :, 0, off][:, :, None]
            vd = nv[ids, off].reshape(L, H, D) \
                * nvs[ids, :, 0, off][:, :, None]
            qb = np.asarray(q)[b, :, 0, :]
            s = np.einsum("hd,lhd->hl", qb, kd) / np.sqrt(D)
            p = np.exp(s - s.max(axis=1, keepdims=True))
            p /= p.sum(axis=1, keepdims=True)
            np.testing.assert_allclose(
                out[b, 0].reshape(H, D), np.einsum("hl,lhd->hd", p, vd),
                rtol=2e-2, atol=8e-3)
