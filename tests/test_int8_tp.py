"""int8 x tensor-parallel (round-2 verdict Weak #3): the BASELINE north
star is int8 GPT-2 tokens/s/chip at multi-chip, but no test exercised a
quantized sharded model. Covers tp_weight_shardings' quantized-operand
rules — per-column scale sharding for col-parallel weights and the
"prepacked col-sums replicate under K-sharding" rule
(parallel/sharding.py:227-241) — with token-exact serving equality on the
8-device CPU mesh."""

import numpy as np
import pytest

from rten_tpu.model import Model, ModelOptions
from rten_tpu.models import gpt2, llama
from rten_tpu.parallel import MeshConfig, make_mesh
from rten_tpu.parallel.sharding import (
    derive_tp_plan,
    shard_constants_by_plan,
    tp_weight_shardings,
)
from rten_tpu.quantize_pass import quantize_dynamic
from rten_tpu.serving import ContinuousBatchingEngine

from jax.sharding import PartitionSpec as P


def _quantized_gpt2(capacity=64):
    cfg = gpt2.GPT2Config(
        vocab_size=128, n_positions=64, n_embd=64, n_layer=2, n_head=8
    )
    graph = gpt2.build_graph_static_cache(
        cfg, gpt2.random_weights(cfg, seed=11), capacity=capacity
    )
    quantize_dynamic(graph)
    model = Model(graph, ModelOptions(optimize=True))
    return cfg, model


def test_int8_plan_covers_quantized_operands():
    cfg, model = _quantized_gpt2()
    g = model.graph
    mesh = make_mesh(MeshConfig(1, 8))
    kinds = derive_tp_plan(g)
    plan = tp_weight_shardings(g, mesh)
    assert plan, "empty plan for quantized graph"

    # The quantized serving graph must contain prepacked int8 matmuls.
    mmitf = [
        (nid, op) for nid, op in g.operators()
        if op.op_type == "MatMulIntegerToFloat"
    ]
    assert mmitf, "quantize_dynamic produced no MatMulIntegerToFloat"
    assert any(
        len(op.inputs) > 7 and op.inputs[7] is not None for _, op in mmitf
    ), "no prepacked col-sums in the quantized graph"

    saw_col_scales = saw_row_colsums = False
    for m_id, kind in kinds.items():
        op = g.nodes[m_id]
        if op.op_type != "MatMulIntegerToFloat":
            continue
        scales = op.inputs[3] if len(op.inputs) > 3 else None
        colsums = op.inputs[7] if len(op.inputs) > 7 else None
        if kind in ("col", "lm_head") and scales in plan:
            assert plan[scales] == P("model")
            saw_col_scales = True
            if colsums in plan:
                assert plan[colsums] == P(None, "model")
        if kind == "row" and colsums in plan:
            # Full-K sums must be REPLICATED under K-sharding.
            assert plan[colsums] == P(None, None)
            saw_row_colsums = True
    assert saw_col_scales, "no col-parallel quantized matmul in plan"
    assert saw_row_colsums, "no row-parallel colsums-replication case hit"


def test_int8_sharded_serving_token_exact():
    """Quantized + TP-sharded serving == quantized unsharded, token for
    token (the flagship int8 x TP combination)."""
    cfg, model = _quantized_gpt2()
    g = model.graph

    def make(params=None):
        return ContinuousBatchingEngine(
            model, n_layer=cfg.n_layer, n_head=cfg.n_head,
            head_dim=cfg.head_dim, slots=2, capacity=64, prefill_bucket=8,
            greedy_on_device=True, steps_per_dispatch=2, params=params,
        )

    prompts = [[5, 9, 23], [40, 7, 12, 3]]
    plain = make()
    reqs = [plain.submit(p, max_new_tokens=8) for p in prompts]
    plain.run()
    want = [r.generated for r in reqs]
    assert all(len(t) == 8 for t in want)

    mesh = make_mesh(MeshConfig(1, 8))
    plan = tp_weight_shardings(g, mesh)
    params = shard_constants_by_plan(g, mesh, plan)
    assert params, "no sharded params"
    sharded = make(params=params)
    reqs2 = [sharded.submit(p, max_new_tokens=8) for p in prompts]
    sharded.run()
    got = [r.generated for r in reqs2]
    assert got == want


def test_int8_sharded_llama_decode_matches():
    """Same combination on the GQA+rotary family via the derived plan."""
    cfg = llama.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=4,
        max_position_embeddings=64,
    )
    cap = 32
    g = llama.build_graph_static_cache(
        cfg, llama.random_weights(cfg, seed=4), capacity=cap
    )
    quantize_dynamic(g)
    model = Model(g, ModelOptions(optimize=True))
    g = model.graph

    slots = 2
    feed = {
        g.find_node("input_ids"): np.array([[3], [9]], np.int32),
        g.find_node("past_lens"): np.zeros(slots, np.int32),
        g.find_node("position_ids"): np.zeros((slots, 1), np.int32),
    }
    for i in range(cfg.num_hidden_layers):
        z = np.zeros(
            (slots, cfg.num_key_value_heads, cap, cfg.head_dim), np.float32
        )
        feed[g.find_node(f"past_key_values.{i}.key")] = z
        feed[g.find_node(f"past_key_values.{i}.value")] = z.copy()
    tok_id = g.find_node("next_token")
    want = np.asarray(model.executor.run(dict(feed), [tok_id])[0])

    mesh = make_mesh(MeshConfig(1, 8))
    plan = tp_weight_shardings(g, mesh)
    assert plan
    params = shard_constants_by_plan(g, mesh, plan)
    feed.update(params)
    got = np.asarray(model.executor.run(feed, [tok_id])[0])
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("kv_bits", [8, 4])
def test_quantized_kv_sharded_llama_serving(kv_bits):
    """Quantized KV cache (int8/int4) x TP on the GQA family: weight-only
    int8 + quantized cache + derived plan, sharded tokens == unsharded."""
    cfg = llama.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=4,
        max_position_embeddings=64,
    )
    g = llama.build_graph_static_cache(
        cfg, llama.random_weights(cfg, seed=6), capacity=64,
        kv_quant=True, kv_bits=kv_bits,
    )
    quantize_dynamic(g)
    model = Model(g, ModelOptions(optimize=True))
    g = model.graph

    def make(params=None):
        return ContinuousBatchingEngine(
            model, n_layer=cfg.num_hidden_layers,
            n_head=cfg.num_key_value_heads, head_dim=cfg.head_dim,
            slots=2, capacity=64, prefill_bucket=8,
            greedy_on_device=True, steps_per_dispatch=2, params=params,
        )

    prompts = [[5, 9, 23], [40, 7, 12, 3]]
    plain = make()
    reqs = [plain.submit(p, max_new_tokens=8) for p in prompts]
    plain.run()
    want = [r.generated for r in reqs]

    mesh = make_mesh(MeshConfig(1, 8))
    plan = tp_weight_shardings(g, mesh)
    assert plan
    sharded = make(params=shard_constants_by_plan(g, mesh, plan))
    reqs2 = [sharded.submit(p, max_new_tokens=8) for p in prompts]
    sharded.run()
    assert [r.generated for r in reqs2] == want
