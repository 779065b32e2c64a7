"""INT8-KV vs f32-KV serving A/B at large capacity (VERDICT round-2 item 4:
'int8-KV bench >= f32-KV tok/s at cap 1024' with the fused-dequant decode
attention kernel).

Usage: python tools/bench_kv.py [--cap 1024] [--new-tokens 64]
Prints one JSON line per config.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SLOTS = 16
PROMPT = 128
K = 32


def run_config(kv_quant: bool, cap: int, new_tokens: int) -> dict:
    from rten_tpu.model import Model, ModelOptions
    from rten_tpu.models import gpt2
    from rten_tpu.quantize_pass import quantize_dynamic
    from rten_tpu.serving import ContinuousBatchingEngine

    cfg = gpt2.GPT2Config(n_layer=12)
    weights = gpt2.random_weights(cfg, seed=0)
    graph = gpt2.build_graph_static_cache(
        cfg, weights, capacity=cap, kv_quant=kv_quant
    )
    quantize_dynamic(graph)
    model = Model(graph, ModelOptions(optimize=True))
    eng = ContinuousBatchingEngine(
        model, n_layer=cfg.n_layer, n_head=cfg.n_head, head_dim=cfg.head_dim,
        slots=SLOTS, capacity=cap, prefill_bucket=PROMPT,
        greedy_on_device=True, steps_per_dispatch=K,
    )
    rng = np.random.default_rng(0)

    def prompts(n):
        return [rng.integers(0, cfg.vocab_size, PROMPT).tolist() for _ in range(n)]

    for p in prompts(SLOTS):
        eng.submit(p, max_new_tokens=2)
    eng.run()
    eng.finished.clear()
    eng.decode_tokens = 0
    reqs = [eng.submit(p, max_new_tokens=new_tokens) for p in prompts(SLOTS)]
    t0 = time.perf_counter()
    eng.run()
    dt = time.perf_counter() - t0
    total = sum(len(r.generated) for r in reqs)
    return {
        "config": f"kv_{'int8' if kv_quant else 'f32'}_cap{cap}",
        "tokens_per_sec": round(total / dt, 2),
        "total_tokens": total,
        "elapsed_s": round(dt, 3),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cap", type=int, default=1024)
    ap.add_argument("--new-tokens", type=int, default=64)
    args = ap.parse_args()
    for quant in (False, True):
        r = run_config(quant, args.cap, args.new_tokens)
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
