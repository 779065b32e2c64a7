"""Regression tests for round-1 advisor findings (ADVICE.md)."""

import os

import numpy as np
import pytest

from rten_tpu.dtypes import DataType
from rten_tpu.formats.onnx import ExternalDataLoader, ProtobufError
from rten_tpu.ir.graph import Graph
from rten_tpu.optimize import fuse_identity, propagate_constants


def _mlp_graph_with_identity_output():
    """x -> Add(c) -> Identity -> named output 'y'."""
    g = Graph()
    x = g.add_value("x", DataType.Float, (2, 2))
    c = g.add_constant("c", np.ones((2, 2), np.float32))
    mid = g.add_value("mid", DataType.Float, (2, 2))
    y = g.add_value("y", DataType.Float, (2, 2))
    g.add_op("Add", [x, c], [mid])
    g.add_op("Identity", [mid], [y])
    g.input_ids = [x]
    g.output_ids = [y]
    return g, x, y


def test_identity_preserves_named_graph_output():
    g, x, y = _mlp_graph_with_identity_output()
    fuse_identity(g)
    # Named output must survive: output_ids still resolves to the node
    # called "y" and the graph still computes it.
    assert g.output_ids == [y]
    assert g.find_node("y") == y

    from rten_tpu.model import Model, ModelOptions

    m = Model(g, ModelOptions(optimize=True))
    assert "y" in m.output_names()
    out = np.asarray(m.run({"x": np.zeros((2, 2), np.float32)}, ["y"])[0])
    np.testing.assert_allclose(out, np.ones((2, 2), np.float32))


def test_identity_mid_graph_still_removed():
    g = Graph()
    x = g.add_value("x", DataType.Float, (2, 2))
    mid = g.add_value("mid", DataType.Float, (2, 2))
    c = g.add_constant("c", np.full((2, 2), 2.0, np.float32))
    y = g.add_value("y", DataType.Float, (2, 2))
    g.add_op("Identity", [x], [mid])
    g.add_op("Mul", [mid, c], [y])
    g.input_ids = [x]
    g.output_ids = [y]
    assert fuse_identity(g)
    assert all(op.op_type != "Identity" for _, op in g.operators())


def test_external_data_sibling_prefix_dir_rejected(tmp_path):
    base = tmp_path / "foo"
    base.mkdir()
    evil = tmp_path / "foo-evil"
    evil.mkdir()
    (evil / "w.bin").write_bytes(b"\x00" * 16)
    loader = ExternalDataLoader(str(base))
    with pytest.raises(ProtobufError):
        loader.load("../foo-evil/w.bin", 0, 16)


def test_external_data_inside_dir_ok(tmp_path):
    base = tmp_path / "foo"
    (base / "sub").mkdir(parents=True)
    (base / "sub" / "w.bin").write_bytes(bytes(range(16)))
    loader = ExternalDataLoader(str(base))
    mv = loader.load("sub/w.bin", 4, 8)
    assert bytes(mv) == bytes(range(4, 12))


def test_external_data_symlink_escape_rejected(tmp_path):
    base = tmp_path / "foo"
    base.mkdir()
    secret = tmp_path / "secret.bin"
    secret.write_bytes(b"\x01" * 16)
    os.symlink(str(secret), str(base / "link.bin"))
    loader = ExternalDataLoader(str(base))
    with pytest.raises(ProtobufError):
        loader.load("link.bin", 0, 16)


def test_const_prop_does_not_freeze_downstream_of_random():
    # RandomNormal -> Add(const) -> output: nothing here may be folded,
    # even though Add's other input is constant and RandomNormal itself
    # is already excluded.
    g = Graph()
    r = g.add_value("r", DataType.Float, (4, 4))
    c = g.add_constant("c", np.ones((4, 4), np.float32))
    y = g.add_value("y", DataType.Float, (4, 4))
    g.add_op("RandomNormal", [], [r], {"shape": [4, 4]})
    g.add_op("Add", [r, c], [y])
    g.output_ids = [y]
    propagate_constants(g)
    ops = {op.op_type for _, op in g.operators()}
    assert "RandomNormal" in ops and "Add" in ops

    from rten_tpu.model import Model, ModelOptions

    m = Model(g, ModelOptions(optimize=True))
    a = np.asarray(m.run({}, ["y"])[0])
    b = np.asarray(m.run({}, ["y"])[0])
    assert not np.allclose(a, b), "random op output was frozen by const-prop"


def test_const_prop_still_folds_deterministic_chain():
    g = Graph()
    c1 = g.add_constant("c1", np.ones((2, 2), np.float32))
    c2 = g.add_constant("c2", np.full((2, 2), 3.0, np.float32))
    mid = g.add_value("mid", DataType.Float, (2, 2))
    x = g.add_value("x", DataType.Float, (2, 2))
    y = g.add_value("y", DataType.Float, (2, 2))
    g.add_op("Add", [c1, c2], [mid])
    g.add_op("Mul", [x, mid], [y])
    g.input_ids = [x]
    g.output_ids = [y]
    propagate_constants(g)
    ops = [op.op_type for _, op in g.operators()]
    assert "Add" not in ops  # folded
    assert "Mul" in ops


def test_submit_rejects_oversized_prompt():
    """Oversized prompts must fail at submit(), not crash the step loop."""
    from rten_tpu.serving.engine import ContinuousBatchingEngine

    class _FakeModel:
        executor = None
        graph = None

    eng = ContinuousBatchingEngine.__new__(ContinuousBatchingEngine)
    eng.capacity = 64
    eng.queue = __import__("collections").deque()
    eng._req_counter = __import__("itertools").count()
    eng.prefix_tokens = None   # submit()'s prefix/LoRA validation state
    eng._adapter_nid = None
    eng.lora_input_ids = {}
    with pytest.raises(ValueError):
        eng.submit(list(range(60)), max_new_tokens=16)


def test_nbits_zero_points_odd_n_blocks():
    """Packed uint8 zero points with odd n_blocks: per-column byte padding."""
    from rten_tpu.ops.matmul import dequant_nbits

    K, N, bs = 96, 4, 32  # n_blocks = 3 (odd)
    n_blocks = 3
    rng = np.random.default_rng(0)
    # Weights: all quantized value 7, varying per-block zero points.
    packed = np.full((N, n_blocks, bs // 2), 0x77, np.uint8)
    scales = np.ones((N, n_blocks), np.float32)
    zp_vals = rng.integers(0, 16, size=(N, n_blocks), dtype=np.uint8)
    # Pack per ORT layout: each column gets ceil(3/2)=2 bytes.
    zp_packed = np.zeros((N, 2), np.uint8)
    zp_packed[:, 0] = zp_vals[:, 0] | (zp_vals[:, 1] << 4)
    zp_packed[:, 1] = zp_vals[:, 2]
    w = np.asarray(
        dequant_nbits(packed, scales, zp_packed.reshape(-1), K=K, N=N, block_size=bs)
    )
    want = np.repeat((7 - zp_vals.astype(np.int32)).astype(np.float32), bs, axis=1)
    np.testing.assert_allclose(w, want[:, :K])


def test_nbits_zero_points_odd_kernel_path_matches():
    from rten_tpu.kernels.int4_matmul import _unpack_zero_points

    N, n_blocks = 5, 7
    rng = np.random.default_rng(1)
    zp_vals = rng.integers(0, 16, size=(N, n_blocks), dtype=np.uint8)
    bpc = (n_blocks + 1) // 2
    zp_packed = np.zeros((N, bpc), np.uint8)
    for j in range(n_blocks):
        if j % 2 == 0:
            zp_packed[:, j // 2] |= zp_vals[:, j]
        else:
            zp_packed[:, j // 2] |= zp_vals[:, j] << 4
    got = np.asarray(_unpack_zero_points(zp_packed.reshape(-1), N, n_blocks))
    np.testing.assert_array_equal(got, zp_vals.astype(np.int32))
