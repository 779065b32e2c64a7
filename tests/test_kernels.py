"""Pallas kernels vs XLA reference goldens (interpret mode on CPU).

Mirrors the reference's per-kernel GEMM testing strategy
(rten-gemm/src/tests.rs runs every kernel variant against a reference
implementation); here the 'kernels' are the Pallas bodies run under the
interpreter, compared against the XLA formulation.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from rten_tpu.kernels.int8_matmul import (
    int8_matmul_dequant,
    int8_matmul_dequant_xla,
)
from rten_tpu.kernels.int4_matmul import (
    _unpack_zero_points,
    int4_matmul_pallas,
    int4_matmul_xla,
)
from util import assert_close

RNG = np.random.default_rng(7)


@pytest.mark.parametrize(
    "m,k,n",
    [(1, 64, 48), (16, 128, 128), (33, 200, 130), (130, 300, 257)],
)
@pytest.mark.parametrize("per_channel", [False, True])
def test_int8_matmul_dequant_interpret(m, k, n, per_channel):
    a = RNG.integers(0, 255, (m, k)).astype(np.uint8)
    b = RNG.integers(-127, 127, (k, n)).astype(np.int8)
    if per_channel:
        a_zp = RNG.integers(0, 255, (m,)).astype(np.uint8)
        b_zp = RNG.integers(-20, 20, (n,)).astype(np.int8)
        a_scale = RNG.uniform(0.005, 0.02, (m,)).astype(np.float32)
        b_scale = RNG.uniform(0.005, 0.02, (n,)).astype(np.float32)
    else:
        a_zp = np.uint8(131)
        b_zp = np.int8(-7)
        a_scale = np.float32(0.013)
        b_scale = np.float32(0.021)
    got = int8_matmul_dequant(
        a, b, a_scale, b_scale, a_zp, b_zp, block_m=64, block_n=128, block_k=128,
        interpret=True,
    )
    want = int8_matmul_dequant_xla(a, b, a_scale, b_scale, a_zp, b_zp)
    assert_close(got, want, rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize(
    "bm,bn,bk",
    [(32, 128, 128), (64, 256, 256), (256, 128, 512)],
)
def test_int8_matmul_block_sizes(bm, bn, bk):
    """Every block configuration must agree with the reference — the
    analog of rten-gemm running its suite against every kernel variant."""
    m, k, n = 70, 300, 200
    a = RNG.integers(0, 255, (m, k)).astype(np.uint8)
    b = RNG.integers(-127, 127, (k, n)).astype(np.int8)
    got = int8_matmul_dequant(
        a, b, np.float32(0.01), np.float32(0.02), np.uint8(7), np.int8(3),
        block_m=bm, block_n=bn, block_k=bk, interpret=True,
    )
    want = int8_matmul_dequant_xla(
        a, b, np.float32(0.01), np.float32(0.02), np.uint8(7), np.int8(3)
    )
    assert_close(got, want, rtol=1e-5, atol=1e-4)


def test_flash_attention_mask_and_blocks():
    from rten_tpu.kernels.flash_attention import mha_pallas, mha_xla

    B, H, Tq, Tk, D = 1, 2, 24, 40, 16
    q = RNG.standard_normal((B, H, Tq, D)).astype(np.float32)
    k = RNG.standard_normal((B, H, Tk, D)).astype(np.float32)
    v = RNG.standard_normal((B, H, Tk, D)).astype(np.float32)
    mask = np.where(RNG.random((Tq, Tk)) > 0.2, 0.0, -1e30).astype(np.float32)
    for bq, bk in ((8, 128), (16, 128)):
        got = mha_pallas(
            q, k, v, mask, block_q=bq, block_k=bk, interpret=True
        )
        want = mha_xla(q, k, v, mask)
        assert_close(got, want, rtol=1e-4, atol=1e-5, msg=f"bq={bq}")


def test_int8_matmul_no_zp():
    a = RNG.integers(-127, 127, (8, 96)).astype(np.int8)
    b = RNG.integers(-127, 127, (96, 64)).astype(np.int8)
    got = int8_matmul_dequant(
        a, b, np.float32(0.01), np.float32(0.02), None, None, interpret=True
    )
    want = int8_matmul_dequant_xla(a, b, np.float32(0.01), np.float32(0.02))
    assert_close(got, want, rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("m,k,n,bs", [(4, 256, 96, 32), (17, 512, 130, 64)])
@pytest.mark.parametrize("with_zp", [False, True])
def test_int4_matmul_interpret(m, k, n, bs, with_zp):
    n_blocks = k // bs
    a = RNG.standard_normal((m, k)).astype(np.float32)
    b_packed = RNG.integers(0, 255, (n, k // 2)).astype(np.uint8)
    scales = RNG.uniform(0.01, 0.1, (n, n_blocks)).astype(np.float32)
    if with_zp:
        zp_nibbles = RNG.integers(0, 255, (n * ((n_blocks + 1) // 2),)).astype(np.uint8)
        zps = _unpack_zero_points(zp_nibbles, n, n_blocks)
    else:
        zps = _unpack_zero_points(None, n, n_blocks)
    got = int4_matmul_pallas(
        a, b_packed, scales, zps, K=k, N=n, block_size=bs,
        block_m=32, block_n=64, block_k=256, interpret=True,
    )
    want = int4_matmul_xla(a, b_packed, scales, zps, K=k, N=n, block_size=bs)
    assert_close(got, want, rtol=1e-4, atol=1e-4)


def test_flash_attention_broadcast_mask_row():
    """A (1, Tk) mask must mask every query row (regression: zero-padding
    the row dim silently unmasked rows >= 1 — hit left-padded prefill)."""
    from rten_tpu.kernels.flash_attention import mha_pallas, mha_xla

    B, H, Tq, Tk, D = 1, 2, 12, 24, 8
    q = RNG.standard_normal((B, H, Tq, D)).astype(np.float32)
    k = RNG.standard_normal((B, H, Tk, D)).astype(np.float32)
    v = RNG.standard_normal((B, H, Tk, D)).astype(np.float32)
    mask = np.where(np.arange(Tk) < 5, -1e30, 0.0).astype(np.float32)[None, :]
    got = mha_pallas(q, k, v, mask, causal=True, block_q=8, interpret=True)
    want = mha_xla(q, k, v, mask, causal=True)
    assert_close(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("S,quant", [(1, False), (8, False), (1, True), (5, True)])
def test_decode_mha_interpret(S, quant):
    """Per-slot decode attention kernel vs the XLA golden (f32 + int8 KV)."""
    from rten_tpu.kernels.flash_attention import decode_mha, decode_mha_xla

    rng = np.random.default_rng(0)
    B, H, cap, D = 4, 3, 128, 32
    q = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    lens = jnp.asarray([0, 17, 63, cap - S], jnp.int32)
    if quant:
        k8 = jnp.asarray(rng.integers(-127, 127, (B, H, cap, D)), jnp.int8)
        v8 = jnp.asarray(rng.integers(-127, 127, (B, H, cap, D)), jnp.int8)
        ks = jnp.asarray(rng.uniform(0.005, 0.02, (B, H, cap)), jnp.float32)
        vs = jnp.asarray(rng.uniform(0.005, 0.02, (B, H, cap)), jnp.float32)
        got = decode_mha(q, k8, v8, lens, ks, vs, interpret=True)
        want = decode_mha_xla(q, k8, v8, lens, ks, vs)
    else:
        k = jnp.asarray(rng.standard_normal((B, H, cap, D)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((B, H, cap, D)), jnp.float32)
        got = decode_mha(q, k, v, lens, interpret=True)
        want = decode_mha_xla(q, k, v, lens)
    # int8 KV runs the score/value dots at bf16 pass rate (exact for the
    # s8 side, bf16-rounded q/p — what the MXU does on-chip either way);
    # the XLA golden computes in f32, so allow bf16-level error there.
    tol = dict(rtol=5e-3, atol=5e-3) if quant else dict(rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), **tol)


def test_decode_mha_gqa_interpret():
    from rten_tpu.kernels.flash_attention import decode_mha, decode_mha_xla

    rng = np.random.default_rng(1)
    B, Hq, Hkv, cap, D, S = 2, 8, 2, 128, 32, 1
    q = jnp.asarray(rng.standard_normal((B, Hq, S, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, Hkv, cap, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, Hkv, cap, D)), jnp.float32)
    lens = jnp.asarray([5, 100], jnp.int32)
    got = decode_mha(q, k, v, lens, interpret=True)
    want = decode_mha_xla(q, k, v, lens)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("quant", [False, True])
def test_decode_mha_recent_window_multiblock(quant):
    """Deferred-KV decode: recent window (bf16) + valid-prefix block clamp.

    lens straddle key-block boundaries (0 / mid-block / exact multiple /
    block 1) so the clamped index maps and the compute-skip guard are both
    exercised; the window adds the current dispatch's rows on top.
    """
    from rten_tpu.kernels.flash_attention import decode_mha, decode_mha_xla

    rng = np.random.default_rng(3)
    B, H, S, D, cap, rk = 4, 4, 1, 64, 512, 8
    q = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    rkw = jnp.asarray(rng.standard_normal((B, H, rk, D)), jnp.bfloat16)
    rvw = jnp.asarray(rng.standard_normal((B, H, rk, D)), jnp.bfloat16)
    lens = jnp.asarray([0, 100, 256, 300], jnp.int32)
    t = jnp.int32(2)
    if quant:
        k = jnp.asarray(rng.integers(-127, 127, (B, H, cap, D)), jnp.int8)
        v = jnp.asarray(rng.integers(-127, 127, (B, H, cap, D)), jnp.int8)
        ks = jnp.asarray(rng.uniform(0.005, 0.02, (B, H, cap)), jnp.float32)
        vs = jnp.asarray(rng.uniform(0.005, 0.02, (B, H, cap)), jnp.float32)
        got = decode_mha(q, k, v, lens, ks, vs, interpret=True,
                         recent_k=rkw, recent_v=rvw, t=t, block_k=256)
        want = decode_mha_xla(q, k, v, lens, ks, vs,
                              recent_k=rkw, recent_v=rvw, t=t)
    else:
        k = jnp.asarray(rng.standard_normal((B, H, cap, D)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((B, H, cap, D)), jnp.float32)
        got = decode_mha(q, k, v, lens, interpret=True,
                         recent_k=rkw, recent_v=rvw, t=t, block_k=256)
        want = decode_mha_xla(q, k, v, lens,
                              recent_k=rkw, recent_v=rvw, t=t)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-2, atol=5e-3
    )


def test_decode_mha_clamp_nondeferred_multiblock():
    """Non-deferred path with the clamped index maps at cap > block_k."""
    from rten_tpu.kernels.flash_attention import decode_mha, decode_mha_xla

    rng = np.random.default_rng(4)
    B, H, S, D, cap = 4, 2, 1, 64, 512
    q = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, cap, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, cap, D)), jnp.float32)
    lens = jnp.asarray([5, 255, 256, 511], jnp.int32)
    got = decode_mha(q, k, v, lens, interpret=True, block_k=256)
    want = decode_mha_xla(q, k, v, lens)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5
    )


def test_decode_mha_gqa_quant_nt():
    """GQA (group=3) + int8 KV through the NT-folded kernel: the merged
    lane mask must zero cross-group probabilities AND the concatenated
    per-kv-head scale rows must line up with the sublane K/V merge."""
    from rten_tpu.kernels.flash_attention import decode_mha, decode_mha_xla

    rng = np.random.default_rng(11)
    B, H, Hkv, S, D, cap, rk = 3, 6, 2, 1, 64, 256, 8
    q = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    k = jnp.asarray(rng.integers(-127, 127, (B, Hkv, cap, D)), jnp.int8)
    v = jnp.asarray(rng.integers(-127, 127, (B, Hkv, cap, D)), jnp.int8)
    ks = jnp.asarray(rng.uniform(0.005, 0.02, (B, Hkv, cap)), jnp.float32)
    vs = jnp.asarray(rng.uniform(0.005, 0.02, (B, Hkv, cap)), jnp.float32)
    lens = jnp.asarray([0, 100, 255], jnp.int32)
    rkw = jnp.asarray(rng.standard_normal((B, Hkv, rk, D)), jnp.bfloat16)
    rvw = jnp.asarray(rng.standard_normal((B, Hkv, rk, D)), jnp.bfloat16)
    t = jnp.int32(1)
    got = decode_mha(q, k, v, lens, ks, vs, interpret=True, block_k=128,
                     recent_k=rkw, recent_v=rvw, t=t)
    want = decode_mha_xla(q, k, v, lens, ks, vs,
                          recent_k=rkw, recent_v=rvw, t=t)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-2, atol=5e-3
    )


@pytest.mark.parametrize("quant", [False, True])
def test_decode_mha_inkernel_append(quant):
    """In-kernel DMA append (aligned case: f32 window, D%128==0, S=1):
    the kernel writes the new K/V row into the ALIASED window at row t and
    scores it from VMEM. Output and mutated windows must match the
    dus-append + window-inclusive reference."""
    from rten_tpu.kernels.flash_attention import (
        decode_attention_deferred,
        decode_mha_xla,
    )

    rng = np.random.default_rng(7)
    B, H, S, D, cap, rk = 2, 4, 1, 128, 256, 8
    q = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    rkw = jnp.asarray(rng.standard_normal((B, H, rk, D)), jnp.float32)
    rvw = jnp.asarray(rng.standard_normal((B, H, rk, D)), jnp.float32)
    kn = jnp.asarray(rng.standard_normal((B, H, 1, D)), jnp.float32)
    vn = jnp.asarray(rng.standard_normal((B, H, 1, D)), jnp.float32)
    lens = jnp.asarray([100, 256], jnp.int32)
    t = jnp.int32(3)
    if quant:
        k = jnp.asarray(rng.integers(-127, 127, (B, H, cap, D)), jnp.int8)
        v = jnp.asarray(rng.integers(-127, 127, (B, H, cap, D)), jnp.int8)
        ks = jnp.asarray(rng.uniform(0.005, 0.02, (B, H, cap)), jnp.float32)
        vs = jnp.asarray(rng.uniform(0.005, 0.02, (B, H, cap)), jnp.float32)
    else:
        k = jnp.asarray(rng.standard_normal((B, H, cap, D)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((B, H, cap, D)), jnp.float32)
        ks = vs = None
    out, rk2, rv2 = decode_attention_deferred(
        q, k, v, lens, ks, vs, recent_k=rkw, recent_v=rvw, t=t,
        k_new=kn, v_new=vn, interpret=True,
    )
    # Reference: dus append, then window-inclusive attention.
    rk_want = rkw.at[:, :, 3:4, :].set(kn)
    rv_want = rvw.at[:, :, 3:4, :].set(vn)
    want = decode_mha_xla(q, k, v, lens, ks, vs,
                          recent_k=rk_want, recent_v=rv_want, t=t)
    np.testing.assert_allclose(np.asarray(rk2), np.asarray(rk_want))
    np.testing.assert_allclose(np.asarray(rv2), np.asarray(rv_want))
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(want), rtol=2e-2, atol=5e-3
    )


def test_pack_int4_roundtrip():
    """pack_int4/unpack_int4: split-half nibble layout, bounded error."""
    from rten_tpu.kernels.flash_attention import pack_int4, unpack_int4

    rng = np.random.default_rng(21)
    x = jnp.asarray(rng.standard_normal((2, 3, 5, 64)) * 4.0, jnp.float32)
    packed, s = pack_int4(x)
    assert packed.shape == (2, 3, 5, 32) and packed.dtype == jnp.uint8
    assert s.shape == (2, 3, 5, 1)
    back = unpack_int4(packed) * s
    # absmax/7 scaling: |err| <= s/2 per element.
    err = np.abs(np.asarray(back) - np.asarray(x))
    assert np.all(err <= np.asarray(s) / 2 + 1e-6)
    # Split-half layout: lane d holds dims (d, d + D/2), low nibble first.
    b = np.asarray(packed)
    qlo = (b & 0xF).astype(np.int32) - 8
    qhi = (b >> 4).astype(np.int32) - 8
    ref = np.concatenate([qlo, qhi], axis=-1)
    np.testing.assert_array_equal(np.asarray(unpack_int4(packed)), ref)


@pytest.mark.parametrize("group", [1, 3])
def test_decode_mha_int4_interpret(group):
    """int4 nibble-packed KV through the NT-folded decode kernel (S=1),
    incl. GQA lane masking and lens straddling key-block boundaries."""
    from rten_tpu.kernels.flash_attention import (
        decode_mha,
        decode_mha_xla,
        pack_int4,
    )

    rng = np.random.default_rng(13)
    B, Hkv, cap, D = 3, 2, 256, 64
    H = Hkv * group
    q = jnp.asarray(rng.standard_normal((B, H, 1, D)), jnp.float32)
    kf = jnp.asarray(rng.standard_normal((B, Hkv, cap, D)), jnp.float32)
    vf = jnp.asarray(rng.standard_normal((B, Hkv, cap, D)), jnp.float32)
    k4, ks = pack_int4(kf)
    v4, vs = pack_int4(vf)
    ks = ks.reshape(B, Hkv, cap)
    vs = vs.reshape(B, Hkv, cap)
    lens = jnp.asarray([0, 100, 255], jnp.int32)
    got = decode_mha(q, k4, v4, lens, ks, vs, interpret=True, block_k=128)
    want = decode_mha_xla(q, k4, v4, lens, ks, vs)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5
    )


def test_decode_mha_int4_prefill_perhead():
    """int4 KV at S>1 (prefill) takes the per-head grid; the in-kernel
    unpack must match the XLA dequant golden."""
    from rten_tpu.kernels.flash_attention import (
        decode_mha,
        decode_mha_xla,
        pack_int4,
    )

    rng = np.random.default_rng(14)
    B, H, S, cap, D = 3, 3, 5, 128, 32
    q = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    kf = jnp.asarray(rng.standard_normal((B, H, cap, D)), jnp.float32)
    vf = jnp.asarray(rng.standard_normal((B, H, cap, D)), jnp.float32)
    k4, ks = pack_int4(kf)
    v4, vs = pack_int4(vf)
    ks = ks.reshape(B, H, cap)
    vs = vs.reshape(B, H, cap)
    lens = jnp.asarray([0, 63, cap - S], jnp.int32)
    got = decode_mha(q, k4, v4, lens, ks, vs, interpret=True)
    want = decode_mha_xla(q, k4, v4, lens, ks, vs)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5
    )


def test_decode_mha_int4_recent_window():
    """Deferred-KV on an int4 big cache: the bf16 recent window rides the
    NT kernel's window path while the u8 cache blocks unpack in VMEM."""
    from rten_tpu.kernels.flash_attention import (
        decode_mha,
        decode_mha_xla,
        pack_int4,
    )

    rng = np.random.default_rng(15)
    B, H, cap, D, rk = 2, 4, 256, 64, 8
    q = jnp.asarray(rng.standard_normal((B, H, 1, D)), jnp.float32)
    kf = jnp.asarray(rng.standard_normal((B, H, cap, D)), jnp.float32)
    vf = jnp.asarray(rng.standard_normal((B, H, cap, D)), jnp.float32)
    k4, ks = pack_int4(kf)
    v4, vs = pack_int4(vf)
    ks = ks.reshape(B, H, cap)
    vs = vs.reshape(B, H, cap)
    rkw = jnp.asarray(rng.standard_normal((B, H, rk, D)), jnp.bfloat16)
    rvw = jnp.asarray(rng.standard_normal((B, H, rk, D)), jnp.bfloat16)
    lens = jnp.asarray([7, 200], jnp.int32)
    t = jnp.int32(2)
    got = decode_mha(q, k4, v4, lens, ks, vs, interpret=True, block_k=128,
                     recent_k=rkw, recent_v=rvw, t=t)
    want = decode_mha_xla(q, k4, v4, lens, ks, vs,
                          recent_k=rkw, recent_v=rvw, t=t)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-2, atol=5e-3
    )
