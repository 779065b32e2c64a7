"""Microbench the serving decode-attention kernel at the headline shape
and A/B experimental formulations (DMA floor, VPU-vectorized, etc.).

Usage: python tools/bench_decode_attn.py [--slots 32] [--cap 256]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

if os.environ.get("RTEN_JAX_CACHE", "1") != "0":
    jax.config.update("jax_compilation_cache_dir", "/tmp/rten_jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from rten_tpu.kernels.common import round_up
from rten_tpu.kernels.flash_attention import decode_mha

NEG_INF = -1e30


def timed(fn, *args, iters=30):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e6, out


# --- DMA floor: stream the whole KV through VMEM, one multiply+reduce ---
def _floor_kernel(lens_ref, q_ref, k_ref, v_ref, o_ref):
    o_ref[0, 0] = (
        jnp.sum(k_ref[0], axis=(0, 1)) + jnp.sum(v_ref[0], axis=(0, 1))
        + q_ref[0, 0, 0]
    )


def dma_floor(q, k, v, lens):
    B, Hkv, cap, D = k.shape
    return pl.pallas_call(
        _floor_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, Hkv, 1, D), lambda b, lens: (b, 0, 0, 0)),
                pl.BlockSpec((1, Hkv, cap, D), lambda b, lens: (b, 0, 0, 0)),
                pl.BlockSpec((1, Hkv, cap, D), lambda b, lens: (b, 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, D), lambda b, lens: (b, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((B, 1, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(lens, q, k, v)


# --- VPU-vectorized: no per-head loop, elementwise mul + reduce ---
def _vpu_kernel(lens_ref, q_ref, k_ref, v_ref, o_ref, *, scale, cap):
    b = pl.program_id(0)
    q = q_ref[0, :, 0, :]                       # [H, D]
    k = k_ref[0]                                # [H, cap, D]
    v = v_ref[0]
    H, D = q.shape
    s = jnp.sum(q[:, None, :] * k, axis=2) * scale      # [H, cap]
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col <= lens_ref[b], s, NEG_INF)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    o = jnp.sum(p[:, :, None] * v, axis=1) / l          # [H, D]
    o_ref[0, :, 0, :] = o


def vpu_attn(q, k, v, lens, scale):
    B, H, S, D = q.shape
    cap = k.shape[2]
    return pl.pallas_call(
        functools.partial(_vpu_kernel, scale=scale, cap=cap),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, H, 1, D), lambda b, lens: (b, 0, 0, 0)),
                pl.BlockSpec((1, H, cap, D), lambda b, lens: (b, 0, 0, 0)),
                pl.BlockSpec((1, H, cap, D), lambda b, lens: (b, 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, H, 1, D), lambda b, lens: (b, 0, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, 1, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(lens, q, k, v)


def timed_chained(fn, q, *rest, iters=400):
    """Serialized per-call device latency: iteration i+1's q depends on
    iteration i's out (the serving regime — layers are sequential). Runs a
    lax.scan at two lengths and differences the walls, cancelling the
    ~30ms remote-tunnel round trip that dominates any single dispatch."""

    def make(n):
        @jax.jit
        def chain(q, *rest):
            def body(q, _):
                o = fn(q, *rest)
                return q + 1e-9 * o.reshape(q.shape), ()

            q, _ = jax.lax.scan(body, q, None, length=n)
            return q

        return chain

    short, long_ = make(8), make(iters)
    jax.block_until_ready(short(q, *rest))
    jax.block_until_ready(long_(q, *rest))

    def wall(c):
        t0 = time.perf_counter()
        jax.block_until_ready(c(q, *rest))
        return time.perf_counter() - t0

    ws = min(wall(short) for _ in range(3))
    wl = min(wall(long_) for _ in range(3))
    return (wl - ws) / (iters - 8) * 1e6




# --- Block-diagonal folded-slot kernel: ONE score dot + ONE value dot per
# (slot, key-block) for ALL heads, via block-structured operands.
# Requires K stored TRANSPOSED per head: kt [B, H, D, cap]. The per-head
# loop variant issues 2*H tiny MXU dots + H softmax passes per slot; this
# issues 2 large dots + 1 dense softmax on [H, bk].
def _bd_kernel(lens_ref, q_ref, kt_ref, v_ref, out_ref, m_ref, l_ref,
               acc_ref, *, scale, cap, block_k, group):
    b = pl.program_id(0)
    kb = pl.program_id(1)
    Hkv = kt_ref.shape[1]
    D = kt_ref.shape[2]
    H = q_ref.shape[1]
    Hp = m_ref.shape[0]

    @pl.when(kb == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # q_big [Hp, Hkv*D]: head h's q vector sits in its kv-group's segment.
    q_sm = q_ref[0, :, 0, :]                      # [H, D]
    q_t = jnp.pad(q_sm, ((0, Hp - H), (0, 0)))    # [Hp, D]
    q_rep = jnp.concatenate([q_t] * Hkv, axis=1)  # [Hp, Hkv*D]
    sub = jax.lax.broadcasted_iota(jnp.int32, (Hp, Hkv * D), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (Hp, Hkv * D), 1)
    q_big = jnp.where((lane // D) == (sub // group), q_rep, 0.0)

    kt = kt_ref[0].reshape(Hkv * D, block_k)      # [Hkv*D, bk]
    s = jax.lax.dot_general(
        q_big, kt.astype(q_big.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale                                     # [Hp, bk]

    col = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, (Hp, block_k), 1)
    hrow = jax.lax.broadcasted_iota(jnp.int32, (Hp, block_k), 0)
    valid = (col <= lens_ref[b]) & (col < cap) & (hrow < H)
    s = jnp.where(valid, s, NEG_INF)

    m_prev = m_ref[:]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    p = jnp.exp(s - m_new)
    p = jnp.where(jnp.broadcast_to(m_new, s.shape) <= NEG_INF / 2, 0.0, p)
    alpha = jnp.where(m_prev <= NEG_INF / 2, 0.0, jnp.exp(m_prev - m_new))
    l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)

    # P_big [Hp, Hkv*bk] block-structured by kv group; V merged [Hkv*bk, D].
    p_rep = jnp.concatenate([p] * Hkv, axis=1)
    lane2 = jax.lax.broadcasted_iota(jnp.int32, (Hp, Hkv * block_k), 1)
    sub2 = jax.lax.broadcasted_iota(jnp.int32, (Hp, Hkv * block_k), 0)
    p_big = jnp.where((lane2 // block_k) == (sub2 // group), p_rep, 0.0)
    vm = v_ref[0].reshape(Hkv * block_k, D)
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p_big.astype(vm.dtype) if vm.dtype == jnp.bfloat16 else p_big,
        vm if vm.dtype != jnp.bfloat16 else vm,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_ref[:] = m_new

    @pl.when(kb == pl.num_programs(1) - 1)
    def _():
        l = l_ref[:]
        l = jnp.where(l == 0.0, 1.0, l)
        out_ref[0] = (acc_ref[:] / l)[:H][:, None, :].reshape(
            H, 1, D
        ).astype(out_ref.dtype)


def bd_decode(q, kt, v, lens, *, scale, block_k=256, interpret=False):
    B, H, S, D = q.shape
    _, Hkv, _, cap = kt.shape
    group = H // Hkv
    bk = min(block_k, cap)
    Hp = round_up(H, 8)
    grid = (B, cap // bk)
    kernel = functools.partial(
        _bd_kernel, scale=scale, cap=cap, block_k=bk, group=group,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, H, 1, D), lambda b, j, lens: (b, 0, 0, 0)),
                pl.BlockSpec((1, Hkv, D, bk), lambda b, j, lens: (b, 0, 0, j)),
                pl.BlockSpec((1, Hkv, bk, D), lambda b, j, lens: (b, 0, j, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, H, 1, D), lambda b, j, lens: (b, 0, 0, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((Hp, 1), jnp.float32),
                pltpu.VMEM((Hp, 1), jnp.float32),
                pltpu.VMEM((Hp, D), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, 1, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * Hkv * D * cap,
            bytes_accessed=2 * B * Hkv * cap * D * kt.dtype.itemsize,
            transcendentals=B * H * cap,
        ),
        interpret=interpret,
    )(jnp.asarray(lens, jnp.int32), q, kt, v)




# --- NT variant: same one-dot-per-(slot,block) folding but from the
# NATURAL [B,H,cap,D] layout: s = q @ K_merged^T gives lane-major scores
# [Hp, Hkv*bk] whose exp(NEG_INF)=0 zeros double as the value-dot's block
# structure. No transposed cache, no q_big construction.
def _nt_kernel(lens_ref, q_ref, k_ref, v_ref, out_ref, m_ref, l_ref,
               acc_ref, *, scale, cap, block_k, group):
    b = pl.program_id(0)
    kb = pl.program_id(1)
    Hkv = k_ref.shape[1]
    D = k_ref.shape[3]
    H = q_ref.shape[1]
    Hp = m_ref.shape[0]

    @pl.when(kb == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q_sm = q_ref[0, :, 0, :]                       # [H, D]
    q_t = jnp.pad(q_sm, ((0, Hp - H), (0, 0)))     # [Hp, D]
    km = k_ref[0].reshape(Hkv * block_k, D)
    s = jax.lax.dot_general(
        q_t.astype(km.dtype) if km.dtype == jnp.bfloat16 else q_t,
        km, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale                                      # [Hp, Hkv*bk]

    sub = jax.lax.broadcasted_iota(jnp.int32, (Hp, Hkv * block_k), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (Hp, Hkv * block_k), 1)
    col = kb * block_k + lane % block_k
    valid = (
        ((lane // block_k) == (sub // group))
        & (col <= lens_ref[b]) & (col < cap) & (sub < H)
    )
    s = jnp.where(valid, s, NEG_INF)

    m_prev = m_ref[:]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    p = jnp.exp(s - m_new)
    p = jnp.where(jnp.broadcast_to(m_new, s.shape) <= NEG_INF / 2, 0.0, p)
    alpha = jnp.where(m_prev <= NEG_INF / 2, 0.0, jnp.exp(m_prev - m_new))
    l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
    vm = v_ref[0].reshape(Hkv * block_k, D)
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p.astype(vm.dtype) if vm.dtype == jnp.bfloat16 else p,
        vm, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_ref[:] = m_new

    @pl.when(kb == pl.num_programs(1) - 1)
    def _():
        l = l_ref[:]
        l = jnp.where(l == 0.0, 1.0, l)
        out_ref[0] = (acc_ref[:] / l)[:H][:, None, :].reshape(
            H, 1, D
        ).astype(out_ref.dtype)


def nt_decode(q, k, v, lens, *, scale, block_k=256, interpret=False):
    B, H, S, D = q.shape
    _, Hkv, cap, _ = k.shape
    group = H // Hkv
    bk = min(block_k, cap)
    Hp = round_up(H, 8)
    grid = (B, cap // bk)
    kernel = functools.partial(
        _nt_kernel, scale=scale, cap=cap, block_k=bk, group=group,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, H, 1, D), lambda b, j, lens: (b, 0, 0, 0)),
                pl.BlockSpec((1, Hkv, bk, D), lambda b, j, lens: (b, 0, j, 0)),
                pl.BlockSpec((1, Hkv, bk, D), lambda b, j, lens: (b, 0, j, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, H, 1, D), lambda b, j, lens: (b, 0, 0, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((Hp, 1), jnp.float32),
                pltpu.VMEM((Hp, 1), jnp.float32),
                pltpu.VMEM((Hp, D), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, 1, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * Hkv * D * cap,
            bytes_accessed=2 * B * Hkv * cap * D * k.dtype.itemsize,
            transcendentals=B * H * cap,
        ),
        interpret=interpret,
    )(jnp.asarray(lens, jnp.int32), q, k, v)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, default=32)
    ap.add_argument("--cap", type=int, default=256)
    ap.add_argument("--heads", type=int, default=12)
    ap.add_argument("--d", type=int, default=64)
    args = ap.parse_args()
    B, H, cap, D = args.slots, args.heads, args.cap, args.d

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, H, 1, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, cap, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, cap, D)), jnp.float32)
    lens = jnp.asarray(rng.integers(cap // 2, cap - 2, B), jnp.int32)
    scale = 1.0 / float(np.sqrt(D))
    kv_mb = 2 * B * H * cap * D * 4 / 1e6
    print(f"shape B={B} H={H} cap={cap} D={D}; KV={kv_mb:.0f}MB "
          f"-> floor {kv_mb/819e3*1e6:.1f}us at 819GB/s")

    t, ref = timed(jax.jit(lambda *a: decode_mha(*a, scale=scale)), q, k, v, lens)
    print(f"current folded-loop kernel: {t:7.1f} us  ({kv_mb/t*1e6/1e3:.0f} GB/s)")

    t, _ = timed(jax.jit(dma_floor), q, k, v, lens)
    print(f"pure DMA floor (same layout): {t:7.1f} us  ({kv_mb/t*1e6/1e3:.0f} GB/s)")

    t, got = timed(jax.jit(lambda *a: vpu_attn(*a, scale)), q, k, v, lens)
    err = float(jnp.max(jnp.abs(got - ref)))
    print(f"VPU-vectorized kernel:      {t:7.1f} us  ({kv_mb/t*1e6/1e3:.0f} GB/s)  maxerr {err:.2e}")

    # Block-diagonal folded-slot kernel (K stored transposed per head).
    kt = jnp.swapaxes(k, 2, 3)  # [B,H,D,cap]
    t, got = timed(jax.jit(lambda *a: bd_decode(*a, scale=scale)), q, kt, v, lens)
    err = float(jnp.max(jnp.abs(got - ref)))
    print(f"blockdiag kernel (K^T):     {t:7.1f} us  ({kv_mb/t*1e6/1e3:.0f} GB/s)  maxerr {err:.2e}")
    ktb, vb = kt.astype(jnp.bfloat16), v.astype(jnp.bfloat16)
    t, got = timed(jax.jit(lambda *a: bd_decode(*a, scale=scale)), q, ktb, vb, lens)
    err = float(jnp.max(jnp.abs(got - ref)))
    print(f"blockdiag bf16 (K^T):       {t:7.1f} us  ({kv_mb/2/t*1e6/1e3:.0f} GB/s eff)  maxerr {err:.2e}")

    # Serialized latency (the serving regime: layers run back-to-back).
    t = timed_chained(lambda q, *r: decode_mha(q, *r, scale=scale), q, k, v, lens)
    print(f"CHAINED current kernel:     {t:7.1f} us  ({kv_mb/t*1e6/1e3:.0f} GB/s)")
    kb16, vb16 = k.astype(jnp.bfloat16), v.astype(jnp.bfloat16)
    t = timed_chained(lambda q, *r: decode_mha(q, *r, scale=scale), q, kb16, vb16, lens)
    print(f"CHAINED bf16-KV kernel:     {t:7.1f} us  ({kv_mb/2/t*1e6/1e3:.0f} GB/s eff)")

    def floor_fn(q, k, v, lens):
        o = dma_floor(q, k, v, lens)  # [B, 1, D]
        return jnp.broadcast_to(o[:, None], (B, H, 1, D))

    t = timed_chained(floor_fn, q, k, v, lens)
    print(f"CHAINED DMA floor:          {t:7.1f} us  ({kv_mb/t*1e6/1e3:.0f} GB/s)")

    t = timed_chained(lambda q, *r: bd_decode(q, *r, scale=scale), q, kt, v, lens)
    print(f"CHAINED blockdiag (K^T):    {t:7.1f} us  ({kv_mb/t*1e6/1e3:.0f} GB/s)")
    t = timed_chained(lambda q, *r: bd_decode(q, *r, scale=scale), q, ktb, vb, lens)
    print(f"CHAINED blockdiag bf16:     {t:7.1f} us  ({kv_mb/2/t*1e6/1e3:.0f} GB/s eff)")

    t, got = timed(jax.jit(lambda *a: nt_decode(*a, scale=scale)), q, k, v, lens)
    err = float(jnp.max(jnp.abs(got - ref)))
    print(f"NT natural-layout kernel:   {t:7.1f} us  maxerr {err:.2e}")
    t = timed_chained(lambda q, *r: nt_decode(q, *r, scale=scale), q, k, v, lens)
    print(f"CHAINED NT natural:         {t:7.1f} us  ({kv_mb/t*1e6/1e3:.0f} GB/s)")
    kb16v = k.astype(jnp.bfloat16); vb16v = v.astype(jnp.bfloat16)
    t = timed_chained(lambda q, *r: nt_decode(q, *r, scale=scale), q, kb16v, vb16v, lens)
    print(f"CHAINED NT bf16:            {t:7.1f} us  ({kv_mb/2/t*1e6/1e3:.0f} GB/s eff)")


if __name__ == "__main__":
    main()
