#!/usr/bin/env python
"""Text generation: tokenizer -> GPT-2 -> streaming decode.

With a real checkpoint + tokenizer.json:
    python examples/generate_text.py --tokenizer tok.json --prompt "..."
Offline demo mode (default): trains a tiny byte-level BPE on sample text
and runs a random-weight GPT-2 — exercising the full pipeline shape.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rten_tpu.utils import honor_jax_platforms_env

honor_jax_platforms_env()

import numpy as np


def demo_tokenizer():
    from tokenizers import Tokenizer as HFTok, models, pre_tokenizers, decoders, trainers

    t = HFTok(models.BPE())
    t.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    t.decoder = decoders.ByteLevel()
    corpus = ["the quick brown fox jumps over the lazy dog"] * 8
    t.train_from_iterator(
        corpus,
        trainers.BpeTrainer(vocab_size=500, initial_alphabet=pre_tokenizers.ByteLevel.alphabet()),
    )
    from rten_tpu.text import Tokenizer

    return Tokenizer.from_json(t.to_str())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--prompt", default="the quick brown")
    ap.add_argument("--tokenizer", help="path to a tokenizer.json")
    ap.add_argument("--max-tokens", type=int, default=24)
    ap.add_argument("--temperature", type=float, default=0.8)
    ap.add_argument("--top-k", type=int, default=40)
    args = ap.parse_args()

    from rten_tpu.generate import (
        Chain, Generator, GeneratorConfig, MultinomialSampler, TextDecoder,
        Temperature, TopK,
    )
    from rten_tpu.models import gpt2
    from rten_tpu.text import Tokenizer

    tok = Tokenizer.from_file(args.tokenizer) if args.tokenizer else demo_tokenizer()
    cfg = gpt2.GPT2Config(vocab_size=max(tok.vocab_size, 500), n_embd=128, n_layer=4, n_head=8)
    model = gpt2.load(cfg, quantize="int8")

    ids = tok.encode(args.prompt).ids
    print(f"prompt tokens: {ids}")
    gen = Generator(
        model, [ids],
        GeneratorConfig(
            bucket_size=32,
            logits_filters=[Temperature(args.temperature), TopK(args.top_k)],
            sampler=MultinomialSampler(seed=0),
        ),
    )
    decoder = TextDecoder(tok)
    print(args.prompt, end="", flush=True)
    for i, piece in enumerate(decoder.wrap(gen)):
        print(piece, end="", flush=True)
        if i + 1 >= args.max_tokens:
            break
    print()
    print(gen.metrics.report())


if __name__ == "__main__":
    main()
