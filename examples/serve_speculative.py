#!/usr/bin/env python
"""Speculative-decoding serving demo: a depth-pruned draft speeds up the
target's greedy decode without changing a single output token.

Builds a GPT-2 target and a shallower draft sharing the embedding/early
layers' weights (the classic self-speculation setup), serves a request
wave through SpeculativeEngine, and reports accepted tokens/round plus
the plain-engine comparison.
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
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--draft-layers", type=int, default=2)
    ap.add_argument("--gamma", type=int, default=4)
    ap.add_argument("--slots", type=int, default=2)
    ap.add_argument("--requests", type=int, default=4)
    ap.add_argument("--max-new", type=int, default=32)
    args = ap.parse_args()

    from rten_tpu.model import Model, ModelOptions
    from rten_tpu.models import gpt2
    from rten_tpu.serving import ContinuousBatchingEngine, SpeculativeEngine

    cfg = gpt2.GPT2Config(n_layer=args.layers)
    weights = gpt2.random_weights(cfg, seed=0)
    # Self-speculation draft: the target's first draft-layers blocks +
    # shared embeddings/final norm (a free draft — no second checkpoint).
    dcfg = gpt2.GPT2Config(n_layer=args.draft_layers)
    dweights = {
        k: v for k, v in weights.items()
        if not k.startswith("transformer.h.")
        or int(k.split(".")[2]) < args.draft_layers
    }

    target = Model(
        gpt2.build_graph_static_cache(cfg, weights, capacity=256),
        ModelOptions(optimize=True),
    )
    draft = Model(
        gpt2.build_graph_static_cache(dcfg, dweights, capacity=256),
        ModelOptions(optimize=True),
    )

    rng = np.random.default_rng(0)
    prompts = [
        rng.integers(0, cfg.vocab_size, 32).tolist()
        for _ in range(args.requests)
    ]

    def serve(engine):
        reqs = [engine.submit(p, max_new_tokens=args.max_new) for p in prompts]
        t0 = time.perf_counter()
        engine.run()
        dt = time.perf_counter() - t0
        toks = sum(len(r.generated) for r in reqs)
        return reqs, toks / dt

    kw = dict(
        n_layer=cfg.n_layer, n_head=cfg.n_head, head_dim=cfg.head_dim,
        slots=args.slots, capacity=256, prefill_bucket=32,
        greedy_on_device=True,
    )
    plain, plain_tps = serve(ContinuousBatchingEngine(target, **kw))
    spec_engine = SpeculativeEngine(target, draft, gamma=args.gamma, **kw)
    spec, spec_tps = serve(spec_engine)

    assert all(
        a.generated == b.generated for a, b in zip(plain, spec)
    ), "speculative output diverged from plain greedy"
    s = spec_engine.stats()
    print(f"plain greedy:      {plain_tps:8.1f} tok/s")
    print(f"speculative (g={args.gamma}): {spec_tps:8.1f} tok/s, "
          f"{s['spec_tokens_per_round']:.2f} accepted tokens/round")
    print("outputs identical: True")


if __name__ == "__main__":
    main()
