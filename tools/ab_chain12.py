"""Chain 12 per-layer cat-append attention kernels in one scan step and
measure the per-layer slope — isolates whether the isolated 61us/call
cost survives a serving-like 12-layer chain, or per-call overhead
appears when distinct kernel calls (12 caches) run back to back.

Usage: python tools/ab_chain12.py [--slots 96] [--cap 256] [--layers 12]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

if os.environ.get("RTEN_JAX_CACHE", "1") != "0":
    jax.config.update("jax_compilation_cache_dir", "/tmp/rten_jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from rten_tpu.kernels import flash_attention as fa


def scan_cost_us(step, carry0, lo=8, hi=64, reps=3):
    def run(k):
        f = jax.jit(lambda c: jax.lax.scan(
            lambda c, _: (step(c), 0), c, None, length=k)[0])
        c = f(carry0)
        float(np.asarray(c[0].reshape(-1)[0]))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            c = f(carry0)
            float(np.asarray(c[0].reshape(-1)[0]))
            ts.append(time.perf_counter() - t0)
        return min(ts)
    return (run(hi) - run(lo)) / (hi - lo) * 1e6


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, default=96)
    ap.add_argument("--cap", type=int, default=256)
    ap.add_argument("--heads", type=int, default=12)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--layers", type=int, default=12)
    ap.add_argument("--matmul", action="store_true",
                    help="interleave a real int8 weight matmul per layer")
    ap.add_argument("--bk", type=int, default=256, help="kernel block_k")
    args = ap.parse_args()

    B, cap, H, D, L = args.slots, args.cap, args.heads, args.dim, args.layers
    Hkv = H
    HD = Hkv * D
    rng = np.random.default_rng(0)
    caches = []
    for _ in range(L):
        caches.append((
            jnp.asarray(rng.integers(-127, 128, (B, cap, HD)), jnp.int8),
            jnp.asarray(rng.integers(-127, 128, (B, cap, HD)), jnp.int8),
            jnp.asarray(rng.uniform(0.01, 0.03, (B, Hkv, 1, cap)), jnp.float32),
            jnp.asarray(rng.uniform(0.01, 0.03, (B, Hkv, 1, cap)), jnp.float32),
        ))
    lens0 = jnp.full((B,), cap // 2, jnp.int32)
    x0 = jnp.asarray(rng.standard_normal((B, H, 1, D)), jnp.float32)
    if args.matmul:
        ws = [jnp.asarray(rng.integers(-127, 128, (HD, 4 * HD)), jnp.int8)
              for _ in range(L)]
        wds = [jnp.asarray(rng.integers(-127, 128, (4 * HD, HD)), jnp.int8)
               for _ in range(L)]
    else:
        ws = wds = [None] * L
    carry0 = (x0, tuple(caches), lens0)

    def step(c):
        # lens is intentionally FROZEN across iterations: every append lands
        # on the same cache row so per-iteration work is constant and the
        # A/B isolates kernel slope, not cache-growth/cap-boundary effects
        # (round-4 advisor finding — documented, not a bug).
        x, cs, lens = c
        ncs = []
        for i in range(L):
            kc, vc, ks, vs = cs[i]
            out, kc, vc, ks, vs = fa.decode_mha_append_cat(
                x, kc, vc, lens, ks, vs, block_k=args.bk,
                k_new=0.5 * x[:, :Hkv], v_new=0.3 * x[:, :Hkv])
            ncs.append((kc, vc, ks, vs))
            row = out[:, 0]                       # [B, HD]
            if ws[i] is not None:
                h = jax.lax.dot_general(
                    row.astype(jnp.bfloat16), ws[i].astype(jnp.bfloat16),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                row = jax.lax.dot_general(
                    h.astype(jnp.bfloat16), wds[i].astype(jnp.bfloat16),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32) * 1e-6
            x = jnp.transpose(
                row.reshape(B, 1, H, D), (0, 2, 1, 3)) * 0.1
        return (x, tuple(ncs), lens)

    us = scan_cost_us(step, carry0)
    kv_mb = 2 * B * cap * HD / 1e6
    per = us / L
    print(f"slots={B} cap={cap} layers={L} matmul={args.matmul} bk={args.bk}: "
          f"{us:.1f} us/iter = {per:.1f} us/layer "
          f"({kv_mb * 1e3 / per:.0f} GB/s on KV bytes alone)")


if __name__ == "__main__":
    main()
