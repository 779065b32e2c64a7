"""Fast on-device kernel self-check used by bench.py (round-4 verdict #7).

Runs the three serving-critical Pallas kernels at small shapes on whatever
backend `import jax` resolves to (the real TPU under the driver) and compares
each against its XLA golden. Prints one PASS/FAIL line per check and exits
nonzero on any failure, so bench.py can report `kernel_selfcheck: pass|fail`
in the JSON artifact. Mirrors tests/test_on_tpu.py (the opt-in suite) at a
~60s budget: int8 matmul (skinny-M decode shape), cat-layout in-kernel
append decode attention (the headline path), and prefill flash attention.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

RNG = np.random.default_rng(5)


def check_int8_matmul():
    from rten_tpu.kernels.int8_matmul import (
        int8_matmul_dequant,
        int8_matmul_dequant_xla,
    )

    a = RNG.integers(0, 255, (16, 768)).astype(np.uint8)
    b = RNG.integers(-127, 127, (768, 768)).astype(np.int8)
    got = np.asarray(int8_matmul_dequant(
        a, b, np.float32(0.01), np.float32(0.02), np.uint8(120), None))
    want = np.asarray(int8_matmul_dequant_xla(
        a, b, np.float32(0.01), np.float32(0.02), np.uint8(120), None))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-3)


def check_append_decode():
    import jax.numpy as jnp

    from rten_tpu.kernels.flash_attention import (
        decode_attention_append_cat,
        decode_mha_append_cat,
        heads_to_cat,
    )

    B, H, D, cap = 8, 12, 64, 256
    q = jnp.asarray(RNG.standard_normal((B, H, 1, D)), jnp.float32)
    kn = jnp.asarray(RNG.standard_normal((B, H, 1, D)), jnp.float32)
    vn = jnp.asarray(RNG.standard_normal((B, H, 1, D)), jnp.float32)
    k = heads_to_cat(jnp.asarray(
        RNG.integers(-127, 128, (B, H, cap, D)), jnp.int8))
    v = heads_to_cat(jnp.asarray(
        RNG.integers(-127, 128, (B, H, cap, D)), jnp.int8))
    ks = jnp.asarray(RNG.uniform(0.005, 0.02, (B, H, cap, 1)), jnp.float32)
    vs = jnp.asarray(RNG.uniform(0.005, 0.02, (B, H, cap, 1)), jnp.float32)
    lens = jnp.asarray(RNG.integers(0, cap, (B,)), jnp.int32)
    got = decode_mha_append_cat(q, k, v, lens, ks, vs, k_new=kn, v_new=vn)
    want = decode_attention_append_cat(
        q, k, v, lens, ks, vs, k_new=kn, v_new=vn, use_flash=False)
    np.testing.assert_allclose(
        np.asarray(got[0]), np.asarray(want[0]), rtol=2e-2, atol=5e-3)
    for g, w in zip(got[1:3], want[1:3]):
        g = np.asarray(g).astype(np.int16)
        w = np.asarray(w).astype(np.int16)
        assert np.abs(g - w).max() <= 1, np.abs(g - w).max()


def check_prefill_attention():
    from rten_tpu.kernels.flash_attention import mha_pallas, mha_xla

    B, H, Tq, Tk, D = 1, 4, 128, 256, 64
    q = RNG.standard_normal((B, H, Tq, D)).astype(np.float32)
    k = RNG.standard_normal((B, H, Tk, D)).astype(np.float32)
    v = RNG.standard_normal((B, H, Tk, D)).astype(np.float32)
    mask = np.where(np.arange(Tk) < 40, -1e30, 0.0).astype(np.float32)[None, :]
    got = np.asarray(mha_pallas(q, k, v, mask, causal=True))
    want = np.asarray(mha_xla(q, k, v, mask, causal=True))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=1e-2)


def main() -> int:
    checks = [
        ("int8_matmul", check_int8_matmul),
        ("append_decode_cat", check_append_decode),
        ("prefill_attention", check_prefill_attention),
    ]
    failed = 0
    for name, fn in checks:
        try:
            fn()
            print(f"SELFCHECK {name} PASS", flush=True)
        except Exception as e:  # noqa: BLE001 - report and keep checking
            failed += 1
            print(f"SELFCHECK {name} FAIL: {e}", flush=True)
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
