#!/usr/bin/env python
"""A/B: Pallas int8 dequant matmul vs the XLA dot at DECODE shapes.

Round-2 shipped `pallas_int8_min_m=64` — a concession routing skinny-M
(decode-step) int8 matmuls to the XLA dot because the general kernel's
launch overhead dominated at M=16. Round 3 added skinny-M block selection
(full-K, few grid steps); this tool records the head-to-head that justifies
retiring the concession (min_m default is now 0).

Shapes are the GPT-2 decode set: [M,768]x[768,768|3072] and
[M,3072]x[3072,768] for M in {16, 32, 64}.

Usage: python tools/ab_int8_decode_matmul.py [--iters 50]
Prints one JSON line per (shape, impl).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rten_tpu.utils import honor_jax_platforms_env

honor_jax_platforms_env()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--ms", default="16,32,64")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from rten_tpu.kernels.int8_matmul import int8_matmul_dequant_auto
    from rten_tpu.ops.matmul import _int_matmul_xla

    rng = np.random.default_rng(0)
    shapes = []
    for m in (int(x) for x in args.ms.split(",")):
        shapes += [(m, 768, 768), (m, 768, 3072), (m, 3072, 768)]

    for m, k, n in shapes:
        a = rng.integers(0, 255, (m, k)).astype(np.uint8)
        b = rng.integers(-127, 127, (k, n)).astype(np.int8)
        a_s, b_s = np.float32(0.02), np.float32(0.01)
        a_zp = np.uint8(128)
        colsums = b.astype(np.int32).sum(axis=0)

        def pallas_fn(a, b, colsums):
            return int8_matmul_dequant_auto(
                a, b, a_s, b_s, a_zp, None, colsums
            )

        def xla_fn(a, b, colsums):
            acc = _int_matmul_xla(a, b, a_zp, None, colsums)
            return acc.astype(jnp.float32) * (a_s * b_s)

        for name, fn in (("pallas", pallas_fn), ("xla_dot", xla_fn)):
            jfn = jax.jit(fn)
            da, db, dc = map(jnp.asarray, (a, b, colsums))
            jax.block_until_ready(jfn(da, db, dc))
            # Chain dependent calls so per-call device time (not tunnel
            # round trips) dominates the measurement. Each call's A input
            # must be a DIFFERENT expression derived from the previous
            # output, or XLA CSEs the repeats into a single dot (x*0 is
            # not foldable for floats — NaN*0 = NaN — so the tap survives
            # while still adding arithmetic zero).
            @jax.jit
            def chain(a, b, colsums, fn=fn, reps=50):
                out = fn(a, b, colsums)
                for _ in range(reps - 1):
                    tap = (out[0, 0] * 0.0).astype(a.dtype)
                    out = fn(a + tap, b, colsums)
                return out

            jax.block_until_ready(chain(da, db, dc))
            times = []
            for _ in range(max(args.iters // 5, 10)):
                t0 = time.perf_counter()
                jax.block_until_ready(chain(da, db, dc))
                times.append((time.perf_counter() - t0) / 50)
            t = float(np.median(times))
            print(json.dumps({
                "shape": f"{m}x{k}x{n}", "impl": name,
                "us_per_call": round(t * 1e6, 2),
            }), flush=True)


if __name__ == "__main__":
    main()
