#!/usr/bin/env python
"""Perplexity comparison: f32 vs int8 GPT-2 (the BASELINE accuracy metric).

The reference's target is "int8 within 1%% perplexity of f32"
(BASELINE.json / docs/quantization.md). With no downloadable corpus or
trained checkpoint, token sequences are sampled FROM the f32 model itself
(so they're in-distribution) and both variants are scored on them. Pass
--tokens-npz to score a real tokenized corpus instead.

Usage: python tools/eval_perplexity.py [--layers 12] [--seq 256] [--n-seqs 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rten_tpu.utils import honor_jax_platforms_env

honor_jax_platforms_env()


def score(model, token_batches):
    """Mean negative log-likelihood per token."""
    total_nll = 0.0
    total_tokens = 0
    for toks in token_batches:
        ids = toks[None, :-1].astype(np.int32)
        T = ids.shape[1]
        feed = {
            "input_ids": ids,
            "attention_mask": np.ones((1, T), np.int32),
            "position_ids": np.arange(T, dtype=np.int32)[None],
        }
        for nid in model.graph.input_ids:
            name = model.graph.node_name(nid)
            if name.startswith("past_key_values."):
                node = model.graph.nodes[nid]
                H, D = node.shape[1], node.shape[3]
                feed[name] = np.zeros((1, H, 0, D), np.float32)
        logits = np.asarray(model.run(feed, ["logits"])[0], np.float64)[0]
        logits -= logits.max(-1, keepdims=True)
        logp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
        targets = toks[1:]
        total_nll += -logp[np.arange(len(targets)), targets].sum()
        total_tokens += len(targets)
    return total_nll / total_tokens


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=12)
    ap.add_argument("--seq", type=int, default=256)
    ap.add_argument("--n-seqs", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--tokens-npz", help="npz with 'tokens' [n, seq] int array")
    args = ap.parse_args()

    from rten_tpu.generate import Generator, GeneratorConfig, MultinomialSampler
    from rten_tpu.models import gpt2

    cfg = gpt2.GPT2Config(n_layer=args.layers)
    weights = gpt2.random_weights(cfg, seed=args.seed)
    f32 = gpt2.load(cfg, weights)
    int8 = gpt2.load(cfg, weights, quantize="int8")

    if args.tokens_npz:
        batches = [t for t in np.load(args.tokens_npz)["tokens"]]
    else:
        rng = np.random.default_rng(args.seed)
        batches = []
        for i in range(args.n_seqs):
            prompt = rng.integers(0, cfg.vocab_size, 8).tolist()
            gen = Generator(
                f32, [prompt],
                GeneratorConfig(
                    bucket_size=64,
                    max_seq_len=args.seq + 128,
                    sampler=MultinomialSampler(seed=i, temperature=1.0),
                ),
            )
            toks = gen.generate(args.seq - 8)[0]
            batches.append(np.concatenate([prompt, toks]))

    nll_f32 = score(f32, batches)
    nll_int8 = score(int8, batches)
    ppl_f32 = float(np.exp(nll_f32))
    ppl_int8 = float(np.exp(nll_int8))
    delta_pct = 100.0 * (ppl_int8 - ppl_f32) / ppl_f32
    print(json.dumps({
        "perplexity_f32": round(ppl_f32, 4),
        "perplexity_int8": round(ppl_int8, 4),
        "delta_pct": round(delta_pct, 3),
        "within_1pct": abs(delta_pct) <= 1.0,
        "tokens_scored": int(sum(len(b) - 1 for b in batches)),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
