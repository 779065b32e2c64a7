#!/usr/bin/env python
"""Continuous-batching serving demo: concurrent requests, slot reuse.

Submits a burst of requests larger than the slot pool and reports
per-request TTFT / completion plus aggregate throughput.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rten_tpu.utils import honor_jax_platforms_env

honor_jax_platforms_env()

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--slots", type=int, default=4)
    ap.add_argument("--requests", type=int, default=10)
    ap.add_argument("--prompt-len", type=int, default=32)
    ap.add_argument("--max-new", type=int, default=24)
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--steps-per-dispatch", type=int, default=4)
    args = ap.parse_args()

    from rten_tpu.model import Model, ModelOptions
    from rten_tpu.models import gpt2
    from rten_tpu.serving import ContinuousBatchingEngine

    cfg = gpt2.GPT2Config(n_layer=args.layers)
    weights = gpt2.random_weights(cfg)
    graph = gpt2.build_graph_static_cache(cfg, weights, capacity=256)
    if args.int8:
        from rten_tpu.quantize_pass import quantize_dynamic

        quantize_dynamic(graph)
    model = Model(graph, ModelOptions())
    engine = ContinuousBatchingEngine(
        model, n_layer=cfg.n_layer, n_head=cfg.n_head, head_dim=cfg.head_dim,
        slots=args.slots, capacity=256, prefill_bucket=args.prompt_len,
        greedy_on_device=True, steps_per_dispatch=args.steps_per_dispatch,
    )

    rng = np.random.default_rng(0)
    reqs = [
        engine.submit(
            rng.integers(0, cfg.vocab_size, args.prompt_len).tolist(),
            max_new_tokens=args.max_new,
        )
        for _ in range(args.requests)
    ]
    t0 = time.perf_counter()
    engine.run()
    dt = time.perf_counter() - t0
    for r in reqs:
        print(
            f"req {r.request_id}: {len(r.generated)} tokens, "
            f"ttft {r.ttft_s * 1e3:.0f} ms, done at "
            f"{(r.finished_at - t0 - r.submitted_at + r.submitted_at):.2f}"
        )
    total = sum(len(r.generated) for r in reqs)
    print(f"\n{total} tokens in {dt:.2f}s = {total / dt:.1f} tok/s "
          f"({args.slots} slots, {args.requests} requests)")


if __name__ == "__main__":
    main()
