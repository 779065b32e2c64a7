"""Llama/Qwen2-architecture chat generation (qwen2_chat analog,
rten-examples/src/qwen2_chat.rs): GQA + rotary LLM through either

* the generic ONNX path (export any llama-family decoder with Optimum
  KV-cache IO, drive it with the Generator), or
* the continuous-batching engine (static-cache graph, Pallas decode
  attention with grouped KV heads).

Usage: python examples/chat_llama.py model.onnx "prompt tokens..."  (or --demo)
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rten_tpu.generate import Generator, GeneratorConfig
from rten_tpu.model import Model


def main():
    args = sys.argv[1:]
    if args and args[0] != "--demo":
        path = args[0]
        prompt = [int(t) for t in args[1].split()] if len(args) > 1 else [1]
        model = Model.load_file(path)
        gen = Generator(model, prompt, GeneratorConfig(max_seq_len=512))
        toks = [int(t) for t in gen.generate(64)[0]]
        print("generated token ids:", toks)
        return 0

    # Demo: build a tiny llama-family model, serve TWO prompts through the
    # continuous-batching engine.
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
    from rten_tpu.model import Model as M, ModelOptions
    from rten_tpu.models import llama
    from rten_tpu.serving import ContinuousBatchingEngine

    cfg = llama.LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256,
    )
    g = llama.build_graph_static_cache(cfg, llama.random_weights(cfg), capacity=64)
    model = M(g, ModelOptions(optimize=True))
    eng = ContinuousBatchingEngine(
        model, n_layer=cfg.num_hidden_layers, n_head=cfg.num_key_value_heads,
        head_dim=cfg.head_dim, slots=2, capacity=64, prefill_bucket=8,
        greedy_on_device=True, steps_per_dispatch=8,
    )
    reqs = [
        eng.submit([3, 17, 9], max_new_tokens=16),
        eng.submit([200, 4, 4, 11], max_new_tokens=16),
    ]
    eng.run()
    for r in reqs:
        print(f"request {r.request_id}: {r.generated}")
    print("stats:", {k: v for k, v in eng.stats().items() if v is not None})
    return 0


if __name__ == "__main__":
    sys.exit(main())
