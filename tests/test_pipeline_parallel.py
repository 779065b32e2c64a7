"""Pipeline parallelism: GPipe stages carved from the graph IR.

The runner must produce EXACTLY Model.run's output (same ops, different
partitioning), detect the transformer trunk structurally, and
backpropagate through the ppermute/scan schedule.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from rten_tpu.model import Model, ModelOptions
from rten_tpu.models import gpt2
from rten_tpu.parallel.pipeline import (
    PipelineRunner,
    find_cut_values,
    plan_pipeline,
)


def _mesh(n):
    devs = jax.devices()[:n]
    return Mesh(np.array(devs), ("pipe",))


def _model(n_layer=4, optimize=False):
    cfg = gpt2.GPT2Config(
        vocab_size=97, n_positions=32, n_embd=32, n_layer=n_layer, n_head=4
    )
    weights = gpt2.random_weights(cfg, seed=3)
    g = gpt2.build_graph(cfg, weights)
    return cfg, Model(g, ModelOptions(optimize=optimize))


def _feed(cfg, B=4, T=8):
    rng = np.random.default_rng(0)
    feed = {
        "input_ids": rng.integers(0, cfg.vocab_size, (B, T)).astype(np.int32),
        "attention_mask": np.ones((B, T), np.int32),
        "position_ids": np.broadcast_to(
            np.arange(T, dtype=np.int32), (B, T)
        ).copy(),
    }
    for i in range(cfg.n_layer):
        z = np.zeros((B, cfg.n_head, 0, cfg.head_dim), np.float32)
        feed[f"past_key_values.{i}.key"] = z
        feed[f"past_key_values.{i}.value"] = z.copy()
    return feed


def test_cut_points_find_residual_stream():
    cfg, model = _model(n_layer=3)
    g = model.graph
    cuts = find_cut_values(
        g, g.find_node("input_ids"), g.find_node("logits")
    )
    # main + wte-gather + embed-sum + 2 residual adds/layer + ln_f + logits
    assert len(cuts) == 3 + 2 * cfg.n_layer + 2


def test_plan_detects_trunk():
    cfg, model = _model(n_layer=4)
    plan = plan_pipeline(model.graph, 2)
    assert plan.layers == 4
    assert plan.n_stages == 2
    # Each stage owns 2 layers x (qkv w+b, proj w+b, 2 ln w+b, fc w+b,
    # mlp-proj w+b)
    assert len(plan.weight_ids[0]) == len(plan.weight_ids[1])
    # Per-layer KV inputs classify as staged, mask as shared.
    assert len(plan.staged_side[0]) == 4  # 2 layers x (key, value)
    names = [model.graph.node_name(i) for i in plan.shared_side]
    assert "attention_mask" in names


@pytest.mark.parametrize("n_stages,n_micro", [(2, 2), (4, 4)])
def test_pipeline_matches_single_device(n_stages, n_micro):
    cfg, model = _model(n_layer=4)
    feed = _feed(cfg, B=4, T=8)
    want = np.asarray(model.run(feed)[0])
    runner = PipelineRunner(
        model, _mesh(n_stages), n_micro=n_micro
    )
    got = np.asarray(runner.run(feed))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_pipeline_rejects_uneven_split():
    cfg, model = _model(n_layer=3)
    with pytest.raises(ValueError, match="equal stages"):
        plan_pipeline(model.graph, 2)


def test_pipeline_backprop():
    """Gradients flow through ppermute/scan: a pipeline loss step must
    match the single-device gradient on the stacked stage weights."""
    cfg, model = _model(n_layer=2)
    feed = _feed(cfg, B=2, T=4)
    mesh = _mesh(2)
    runner = PipelineRunner(model, mesh, n_micro=2)
    g = model.graph
    env = {g.find_node(k): np.asarray(v) for k, v in feed.items()}
    p = runner.plan
    x = np.asarray(model.executor.run(dict(env), [p.boundaries[0]])[0])
    B = x.shape[0]
    mb = B // 2
    x_mb = x.reshape(2, mb, *x.shape[1:])
    mask = np.asarray(env[p.shared_side[0]]).reshape(2, mb, -1)

    from jax.sharding import NamedSharding, PartitionSpec as P

    from rten_tpu.parallel.pipeline import pipeline_loop

    pipe_sh = NamedSharding(mesh, P("pipe"))
    staged = []
    for j in range(len(p.staged_side[0])):
        col = np.stack(
            [np.asarray(env[p.staged_side[s][j]]) for s in range(2)]
        )
        staged.append(
            jax.device_put(col.reshape(2, 2, mb, *col.shape[2:]), pipe_sh)
        )

    @jax.jit
    def loss(ws):
        y = pipeline_loop(
            mesh, "pipe", runner.stage_fn, 2, 2,
            (True,), tuple(True for _ in staged),
            ws, jnp.asarray(x_mb), [jnp.asarray(mask)], staged,
        )
        return jnp.sum(y * y)

    ws0 = [np.asarray(w) for w in runner.stacked_w]

    def put(ws):
        return [jax.device_put(w, pipe_sh) for w in ws]

    grads = jax.grad(loss)(put(ws0))
    assert all(np.all(np.isfinite(np.asarray(g))) for g in grads)
    # Finite-difference check on one scalar of the first stacked weight.
    eps = 1e-3
    w_pert = [w.copy() for w in ws0]
    w_pert[0] = w_pert[0].copy()
    w_pert[0].flat[0] += eps
    d_num = (float(loss(put(w_pert))) - float(loss(put(ws0)))) / eps
    d_an = float(np.asarray(grads[0]).flat[0])
    assert abs(d_num - d_an) <= 1e-2 * max(1.0, abs(d_an)) + 1e-2


def test_pipeline_on_optimized_graph():
    """Fusion passes rewrite blocks uniformly, so the trunk stays periodic
    and the pipeline must still match (attention fusion, folding, DCE)."""
    cfg, model = _model(n_layer=4, optimize=True)
    feed = _feed(cfg, B=4, T=8)
    want = np.asarray(model.run(feed)[0])
    runner = PipelineRunner(model, _mesh(2), n_micro=2)
    assert runner.plan.layers == 4
    got = np.asarray(runner.run(feed))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
