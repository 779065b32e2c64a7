"""HTTP model serving: JSON API over the continuous-batching engine.

    python examples/serve_http.py --demo         # tiny model on :8080
    curl -X POST localhost:8080/generate -d '{"prompt":[3,9,27]}'
    curl localhost:8080/health
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from rten_tpu.model import Model, ModelOptions
    from rten_tpu.models import gpt2
    from rten_tpu.quantize_pass import quantize_dynamic
    from rten_tpu.serving import ContinuousBatchingEngine
    from rten_tpu.serving.http_server import serve

    port = int(os.environ.get("PORT", "8080"))
    cfg = gpt2.GPT2Config(vocab_size=96, n_positions=64, n_embd=64,
                          n_layer=2, n_head=4)
    graph = gpt2.build_graph_static_cache(
        cfg, gpt2.random_weights(cfg, seed=0), capacity=128
    )
    quantize_dynamic(graph)
    engine = ContinuousBatchingEngine(
        Model(graph, ModelOptions(optimize=True)),
        n_layer=cfg.n_layer, n_head=cfg.n_head, head_dim=cfg.head_dim,
        slots=4, capacity=128, prefill_bucket=16, greedy_on_device=True,
        steps_per_dispatch=8, max_queue=64,
    )
    print(f"serving on :{port} (POST /generate, GET /health, GET /stats)")
    serve(engine, port=port)


if __name__ == "__main__":
    main()
