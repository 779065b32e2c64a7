"""MoE op + expert parallelism.

The dense-mask MoE lowering must match a straightforward per-token
reference (explicit top-k loop), and sharding the stacked expert weights
over the mesh (MOE_EP_RULES) must not change the result.
"""

import jax
import numpy as np
import pytest

from rten_tpu.dtypes import DataType
from rten_tpu.ir.builder import GraphBuilder
from rten_tpu.model import Model, ModelOptions
from rten_tpu.models import moe as moe_model
from rten_tpu.parallel import MeshConfig, make_mesh, shard_constants
from rten_tpu.parallel.sharding import MOE_EP_RULES


def _moe_ref(x, router_w, w_up, w_down, top_k, act="gelu", normalize=True):
    """Per-token loop reference (numpy, float64 for stability)."""
    B, T, E = x.shape
    X = w_up.shape[0]
    out = np.zeros((B, T, E), np.float64)
    xf = x.astype(np.float64)
    logits = xf @ router_w.astype(np.float64)

    def _act(h):
        if act == "gelu":
            from scipy.stats import norm as _n  # pragma: no cover

            raise AssertionError("unused")
        if act == "silu":
            return h / (1 + np.exp(-h))
        ff = h.shape[-1] // 2
        g, u = h[..., :ff], h[..., ff:]
        return (g / (1 + np.exp(-g))) * u

    for b in range(B):
        for t in range(T):
            l = logits[b, t]
            idx = np.argsort(-l)[:top_k]
            sel = l[idx]
            if normalize:
                g = np.exp(sel - sel.max())
                g = g / g.sum()
            else:
                g = 1 / (1 + np.exp(-sel))
            for gi, e in zip(g, idx):
                h = xf[b, t] @ w_up[e].astype(np.float64)
                h = _act(h)
                out[b, t] += gi * (h @ w_down[e].astype(np.float64))
    return out.astype(np.float32)


def _one_moe_graph(E, X, F, top_k, act, weights):
    b = GraphBuilder()
    x = b.input("x", DataType.Float, ("batch", "seq", E))
    y = b.op(
        "MoE",
        [x, b.constant("m.moe.router_w", weights["router"]),
         b.constant("m.moe.w_up", weights["up"]),
         b.constant("m.moe.w_down", weights["down"])],
        {"top_k": top_k, "activation": act, "normalize_gates": 1},
        output_names=["y"],
    )
    b.output(y)
    return b.finish()


@pytest.mark.parametrize("top_k", [1, 2])
def test_moe_op_matches_reference(top_k):
    rng = np.random.default_rng(5)
    B, T, E, X, F = 2, 5, 8, 4, 12
    weights = {
        "router": rng.standard_normal((E, X)).astype(np.float32),
        "up": (rng.standard_normal((X, E, 2 * F)) * 0.3).astype(np.float32),
        "down": (rng.standard_normal((X, F, E)) * 0.3).astype(np.float32),
    }
    g = _one_moe_graph(E, X, F, top_k, "swiglu", weights)
    m = Model(g, ModelOptions(optimize=False))
    x = rng.standard_normal((B, T, E)).astype(np.float32)
    got = np.asarray(m.run({"x": x})[0])
    want = _moe_ref(x, weights["router"], weights["up"], weights["down"],
                    top_k, act="swiglu")
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_moe_top1_only_selected_expert_contributes():
    """With orthogonal routing, zeroing the UNselected experts' weights
    must not change the output (the mask really gates)."""
    rng = np.random.default_rng(6)
    E, X, F = 4, 2, 6
    router = np.zeros((E, X), np.float32)
    router[0, 0] = 10.0   # token with +x0 routes to expert 0
    router[0, 1] = -10.0
    up = (rng.standard_normal((X, E, F)) * 0.3).astype(np.float32)
    down = (rng.standard_normal((X, F, E)) * 0.3).astype(np.float32)
    x = np.ones((1, 1, E), np.float32)

    g1 = _one_moe_graph(E, X, F, 1, "silu",
                        {"router": router, "up": up, "down": down})
    up2, down2 = up.copy(), down.copy()
    up2[1] = 0.0
    down2[1] = 0.0
    g2 = _one_moe_graph(E, X, F, 1, "silu",
                        {"router": router, "up": up2, "down": down2})
    y1 = np.asarray(Model(g1).run({"x": x})[0])
    y2 = np.asarray(Model(g2).run({"x": x})[0])
    np.testing.assert_allclose(y1, y2, rtol=1e-6, atol=1e-7)


def _lm_feed(cfg, B=4, T=8, seed=0):
    rng = np.random.default_rng(seed)
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


def test_moe_lm_expert_parallel_matches_single_device():
    """Full MoE causal LM: expert-sharded (EP over the 'model' axis) run
    must equal the unsharded run."""
    cfg = moe_model.MoEConfig(n_layer=2, n_experts=4, top_k=2)
    g = moe_model.build_graph(cfg, moe_model.random_weights(cfg, seed=7))
    m = Model(g, ModelOptions(optimize=True))
    feed = _lm_feed(cfg)
    want = np.asarray(m.run(feed)[0])

    mesh = make_mesh(MeshConfig(data=2, model=4))
    params = shard_constants(m.graph, mesh, rules=MOE_EP_RULES)
    env = {m.graph.find_node(k): v for k, v in feed.items()}
    env.update(params)
    got = np.asarray(
        m.executor.run(env, [m.graph.find_node("logits")])[0]
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_moe_lm_pipelines():
    """The MoE trunk is layer-periodic too: PipelineRunner must detect it
    and reproduce the single-device logits (pp x ep composability is the
    mesh layout's job; this validates the pp cut on a second family)."""
    from jax.sharding import Mesh

    from rten_tpu.parallel.pipeline import PipelineRunner

    cfg = moe_model.MoEConfig(n_layer=2, n_experts=4, top_k=2)
    g = moe_model.build_graph(cfg, moe_model.random_weights(cfg, seed=8))
    m = Model(g, ModelOptions(optimize=False))
    feed = _lm_feed(cfg, B=2, T=4)
    want = np.asarray(m.run(feed)[0])
    mesh = Mesh(np.array(jax.devices()[:2]), ("pipe",))
    runner = PipelineRunner(m, mesh, n_micro=2)
    got = np.asarray(runner.run(feed))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_moe_capacity_dispatch_matches_dense():
    """GShard capacity dispatch == dense-mask compute when no expert
    overflows (ample capacity_factor)."""
    rng = np.random.default_rng(9)
    B, T, E, X, F = 2, 8, 8, 4, 12
    weights = {
        "router": rng.standard_normal((E, X)).astype(np.float32),
        "up": (rng.standard_normal((X, E, 2 * F)) * 0.3).astype(np.float32),
        "down": (rng.standard_normal((X, F, E)) * 0.3).astype(np.float32),
    }
    x = rng.standard_normal((B, T, E)).astype(np.float32)

    def run(extra):
        b = GraphBuilder()
        xin = b.input("x", DataType.Float, ("batch", "seq", E))
        y = b.op(
            "MoE",
            [xin, b.constant("m.moe.router_w", weights["router"]),
             b.constant("m.moe.w_up", weights["up"]),
             b.constant("m.moe.w_down", weights["down"])],
            {"top_k": 2, "activation": "swiglu", "normalize_gates": 1,
             **extra},
            output_names=["y"],
        )
        b.output(y)
        return np.asarray(Model(b.finish()).run({"x": x})[0])

    dense = run({})
    # capacity_factor 4.0 with X=4, k=2: C >= N*k -> nothing ever drops.
    cap = run({"dispatch": "capacity", "capacity_factor": 4.0})
    np.testing.assert_allclose(cap, dense, rtol=1e-4, atol=1e-5)

    # Tight capacity: drops allowed; output stays finite and no larger in
    # norm than the dense one (dropped contributions are zeroed).
    tight = run({"dispatch": "capacity", "capacity_factor": 0.5})
    assert np.all(np.isfinite(tight))
    assert np.linalg.norm(tight) <= np.linalg.norm(dense) * 1.5


def test_moe_capacity_expert_parallel():
    """Capacity dispatch under EP sharding == unsharded capacity run."""
    cfg = moe_model.MoEConfig(n_layer=1, n_experts=4, top_k=2)
    weights = moe_model.random_weights(cfg, seed=10)
    g = moe_model.build_graph(cfg, weights)
    # Flip every MoE op to capacity dispatch.
    for _, op in g.operators():
        if op.op_type == "MoE":
            op.attrs["dispatch"] = "capacity"
            op.attrs["capacity_factor"] = 4.0
    m = Model(g, ModelOptions(optimize=True))
    feed = _lm_feed(cfg)
    want = np.asarray(m.run(feed)[0])
    mesh = make_mesh(MeshConfig(data=2, model=4))
    params = shard_constants(m.graph, mesh, rules=MOE_EP_RULES)
    env = {m.graph.find_node(k): v for k, v in feed.items()}
    env.update(params)
    got = np.asarray(m.executor.run(env, [m.graph.find_node("logits")])[0])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
