"""TP-sharded serving engine on the virtual CPU mesh matches unsharded."""

import numpy as np

from rten_tpu.model import Model, ModelOptions
from rten_tpu.models import gpt2
from rten_tpu.parallel import MeshConfig, make_mesh, shard_constants
from rten_tpu.serving import ContinuousBatchingEngine


def test_sharded_engine_matches():
    cfg = gpt2.GPT2Config(
        vocab_size=96, n_positions=64, n_embd=64, n_layer=2, n_head=8
    )
    weights = gpt2.random_weights(cfg, seed=5)
    graph = gpt2.build_graph_static_cache(cfg, weights, capacity=64)
    model = Model(graph, ModelOptions(optimize=True))

    def make(params=None):
        return ContinuousBatchingEngine(
            model, n_layer=cfg.n_layer, n_head=cfg.n_head,
            head_dim=cfg.head_dim, slots=2, capacity=64, prefill_bucket=8,
            greedy_on_device=True, steps_per_dispatch=2, params=params,
        )

    prompts = [[5, 9, 23], [40, 7, 12, 3]]
    plain = make()
    reqs = [plain.submit(p, max_new_tokens=6) for p in prompts]
    plain.run()
    want = [r.generated for r in reqs]

    mesh = make_mesh(MeshConfig(1, 8))
    params = shard_constants(graph, mesh)
    sharded = make(params=params)
    reqs2 = [sharded.submit(p, max_new_tokens=6) for p in prompts]
    sharded.run()
    got = [r.generated for r in reqs2]
    assert got == want
