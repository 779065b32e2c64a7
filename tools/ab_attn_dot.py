"""Reliable on-chip A/B of decode-attention kernel variants.

Host-side timing loops are invalid through the remote-dispatch tunnel
(block_until_ready resolves before device work; identical dispatches can
be elided — a donated 512MB a+1 "measured" 53 TB/s). Instead each variant
runs k iterations inside ONE jitted lax.scan whose carry is the cache
(exactly the serving pattern) and the cost is the SLOPE between k=hi and
k=lo dispatches, with a scalar fetched from the final carry to force real
completion. Dispatch/fetch overhead cancels in the slope.

Usage: python tools/ab_attn_dot.py [--slots 96] [--cap 256]
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
    """us per iteration: slope between hi- and lo-iteration scans."""
    def run(k):
        f = jax.jit(lambda c: jax.lax.scan(
            lambda c, _: (step(c), 0), c, None, length=k)[0])
        c = f(carry0)
        float(np.asarray(c[0].reshape(-1)[0]))  # force + warm
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
    args = ap.parse_args()

    B, cap, H, D = args.slots, args.cap, args.heads, args.dim
    Hkv = H
    HD = Hkv * D
    rng = np.random.default_rng(0)
    kc0 = jnp.asarray(rng.integers(-127, 128, (B, cap, HD)), jnp.int8)
    vc0 = jnp.asarray(rng.integers(-127, 128, (B, cap, HD)), jnp.int8)
    ks0 = jnp.asarray(rng.uniform(0.01, 0.03, (B, Hkv, 1, cap)), jnp.float32)
    vs0 = jnp.asarray(rng.uniform(0.01, 0.03, (B, Hkv, 1, cap)), jnp.float32)
    lens0 = jnp.full((B,), cap // 2, jnp.int32)
    x0 = jnp.asarray(rng.standard_normal((B, H, 1, D)), jnp.float32)
    carry0 = (x0, kc0, vc0, ks0, vs0, lens0)

    def mk_step(variant):
        def step(c):
            x, kc, vc, ks, vs, lens = c
            out, kc, vc, ks, vs = fa.decode_mha_append_cat(
                x, kc, vc, lens, ks, vs,
                k_new=0.5 * x[:, :Hkv], v_new=0.3 * x[:, :Hkv])
            # feed output back as next q (serving-like dependency); keep
            # lens fixed so the write position stays in-bounds. out is
            # cat-layout [B, 1, H*D] -> back to head-major.
            nq = jnp.transpose(
                out.reshape(out.shape[0], 1, H, D), (0, 2, 1, 3)
            )
            return (nq * 0.1, kc, vc, ks, vs, lens)
        return step

    base = scan_cost_us(mk_step("base"), carry0)
    kv_mb = 2 * B * cap * HD / 1e6
    print(f"slots={B} cap={cap} KV={kv_mb:.1f}MB/call")
    print(f"current kernel: {base:7.1f} us/iter "
          f"({kv_mb * 1e3 / base:.0f} GB/s on KV bytes alone)")

    orig = fa._dot_f32

    def dot_bf16(a, b, dims):
        if b.dtype in (jnp.int8, jnp.bfloat16) and min(b.shape) > 1:
            a = a.astype(jnp.bfloat16)
            b = b.astype(jnp.bfloat16)
        else:
            b = b.astype(a.dtype)
        return jax.lax.dot_general(
            a, b, dims, preferred_element_type=jnp.float32
        )

    fa._dot_f32 = dot_bf16
    try:
        t = scan_cost_us(mk_step("bf16"), carry0)
    finally:
        fa._dot_f32 = orig
    print(f"bf16-dot      : {t:7.1f} us/iter")


if __name__ == "__main__":
    main()
