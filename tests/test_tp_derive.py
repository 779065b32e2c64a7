"""Generic TP plan derivation from graph structure (round-1 weak #6: the
regex table only knew GPT-2). Checks the Megatron pairing classification on
GPT-2 AND Llama graphs, plus numeric equality sharded-vs-single on the
8-device CPU mesh for the derived plan."""

import numpy as np
import pytest

from util import assert_close

from rten_tpu.ir.graph import Graph
from rten_tpu.model import Model, ModelOptions
from rten_tpu.models import gpt2, llama
from rten_tpu.parallel import MeshConfig, make_mesh
from rten_tpu.parallel.sharding import (
    derive_tp_plan,
    shard_constants_by_plan,
    tp_weight_shardings,
)


def _kinds_by_name(g: Graph):
    plan = derive_tp_plan(g)
    return {
        (g.nodes[m].name or g.node_name(m)): kind for m, kind in plan.items()
    }


def test_derive_plan_gpt2():
    cfg = gpt2.GPT2Config(vocab_size=96, n_positions=64, n_embd=64,
                          n_layer=2, n_head=4)
    g = gpt2.build_graph(cfg, gpt2.random_weights(cfg, seed=0))
    kinds = _kinds_by_name(g)
    for i in range(2):
        assert kinds[f"transformer.h.{i}.attn.c_attn"] == "col"
        assert kinds[f"transformer.h.{i}.attn.c_proj"] == "row"
        assert kinds[f"transformer.h.{i}.mlp.c_fc"] == "col"
        assert kinds[f"transformer.h.{i}.mlp.c_proj"] == "row"
    assert kinds["lm_head"] == "lm_head"


def test_derive_plan_llama():
    cfg = llama.LlamaConfig(
        vocab_size=96, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64,
    )
    g = llama.build_graph_static_cache(cfg, llama.random_weights(cfg), capacity=32)
    kinds = _kinds_by_name(g)
    for i in range(2):
        p = f"model.layers.{i}"
        assert kinds[f"{p}.self_attn.q_proj"] == "col"
        assert kinds[f"{p}.self_attn.k_proj"] == "col"
        assert kinds[f"{p}.self_attn.v_proj"] == "col"
        assert kinds[f"{p}.self_attn.o_proj"] == "row"
        assert kinds[f"{p}.mlp.gate_proj"] == "col"
        assert kinds[f"{p}.mlp.up_proj"] == "col"
        assert kinds[f"{p}.mlp.down_proj"] == "row"
    assert kinds["lm_head"] == "lm_head"


def test_derived_plan_numerics_gpt2():
    """Sharded forward with the DERIVED plan == single-device forward."""
    cfg = gpt2.GPT2Config(vocab_size=96, n_positions=64, n_embd=64,
                          n_layer=2, n_head=8)
    model = gpt2.load(cfg, gpt2.random_weights(cfg, seed=3))
    g = model.graph
    B, T = 2, 8
    ids = (np.arange(B * T, dtype=np.int32).reshape(B, T)) % cfg.vocab_size
    feed_by_name = {
        "input_ids": ids,
        "attention_mask": np.ones((B, T), np.int32),
        "position_ids": np.broadcast_to(np.arange(T, dtype=np.int32), (B, T)).copy(),
    }
    for i in range(cfg.n_layer):
        feed_by_name[f"past_key_values.{i}.key"] = np.zeros(
            (B, cfg.n_head, 0, cfg.head_dim), np.float32
        )
        feed_by_name[f"past_key_values.{i}.value"] = np.zeros(
            (B, cfg.n_head, 0, cfg.head_dim), np.float32
        )
    want = np.asarray(model.run(feed_by_name, ["logits"])[0])

    mesh = make_mesh(MeshConfig(1, 8))
    plan = tp_weight_shardings(g, mesh)
    assert plan, "derived plan is empty"
    params = shard_constants_by_plan(g, mesh, plan)
    feed = {g.find_node(k): v for k, v in feed_by_name.items()}
    feed.update(params)
    got = np.asarray(model.executor.run(feed, [g.find_node("logits")])[0])
    assert_close(got, want, rtol=2e-4, atol=1e-5)
