"""Regression tests for round-2 advisor findings (ADVICE.md round 2).

1. .rten reader decodes absent scalar attrs with *schema.fbs* defaults
   (what the reference's generated flatbuffers accessors return), not ONNX
   defaults; our writer materializes ONNX defaults like rten-convert does.
2. The HTTP serving loop survives engine.step() exceptions (in-flight
   requests fail with an error instead of every later request hanging),
   and empty prompts are rejected at submit().
3. prepack_int8_weights skips u8 weights with runtime zero points (the
   precomputed u8 colsums would mismatch the kernel's shifted s8 operand).
4. prepack_int8_weights pads per-column zero-point vectors alongside the
   N-padding (the kernel reshapes zp to [1, Np]).
5. engine.finished stays bounded on a long-running server (drain API).
"""

import itertools
import struct
from collections import deque

import numpy as np
import pytest

from rten_tpu import Executor, RunConfig
from rten_tpu.dtypes import DataType
from rten_tpu.formats.rten import FbTable, _decode_attrs, load_rten, save_rten
from rten_tpu.ir.graph import Constant, Graph
from rten_tpu.optimize import prepack_int8_weights
from rten_tpu.serving.engine import ContinuousBatchingEngine


# --- 1. schema defaults ------------------------------------------------------

def _empty_table():
    import flatbuffers

    b = flatbuffers.Builder(64)
    b.StartObject(1)
    off = b.EndObject()
    b.Finish(off)
    buf = bytes(b.Output())
    root = struct.unpack_from("<I", buf, 0)[0]
    return FbTable(buf, root)


@pytest.mark.parametrize(
    "table,field,want",
    [
        ("DequantizeLinearAttrs", "axis", 0),
        ("QuantizeLinearAttrs", "axis", 0),
        ("GemmAttrs", "alpha", 0.0),
        ("GemmAttrs", "beta", 0.0),
        ("MultinomialAttrs", "sample_size", 0),
        ("FlattenAttrs", "axis", 0),
        ("SoftmaxAttrs", "axis", 0),
        ("LayerNormalizationAttrs", "epsilon", 0.0),
        ("TopKAttrs", "largest", False),
        ("TriluAttrs", "upper", False),
        ("LeakyReluAttrs", "alpha", 0.0),
        ("EluAttrs", "alpha", 0.0),
        ("CastAttrs", "to", DataType.Int32),
    ],
)
def test_absent_scalar_attrs_decode_schema_defaults(table, field, want):
    """Absent fields must decode exactly like the reference's generated
    accessors: the schema.fbs field default (0/0.0/false/first enum
    member), NOT the ONNX spec default."""
    attrs = _decode_attrs(table, _empty_table(), None)
    assert attrs[field] == want


def test_writer_materializes_onnx_defaults(tmp_path):
    """A Gemm whose attrs dict relies on ONNX defaults must round-trip with
    alpha=beta=1.0 physically present — rten-convert writes them, and the
    reference runtime would otherwise compute with the 0.0 schema default."""
    g = Graph()
    a = g.add_value("a", DataType.Float, (2, 3))
    w = g.add_constant("w", np.eye(3, dtype=np.float32))
    y = g.add_value("y", DataType.Float, (2, 3))
    g.add_op("Gemm", [a, w], [y], {})  # no alpha/beta/trans attrs
    dq_in = g.add_value("qx", DataType.Int8, (4,))
    sc = g.add_constant("sc", np.float32(0.5))
    dq_out = g.add_value("dq", DataType.Float, (4,))
    g.add_op("DequantizeLinear", [dq_in, sc], [dq_out], {})  # ONNX axis dflt 1
    g.input_ids = [a, dq_in]
    g.output_ids = [y, dq_out]
    path = str(tmp_path / "m.rten")
    save_rten(g, path)
    g2, _ = load_rten(open(path, "rb").read())
    ops = {op.op_type: op for _, op in g2.operators()}
    assert ops["Gemm"].attrs["alpha"] == 1.0
    assert ops["Gemm"].attrs["beta"] == 1.0
    assert ops["DequantizeLinear"].attrs["axis"] == 1


# --- 2. serving loop robustness ---------------------------------------------

def _skeleton_engine(step_error=None):
    eng = ContinuousBatchingEngine.__new__(ContinuousBatchingEngine)
    eng.capacity = 64
    eng.max_queue = None
    eng.queue = deque()
    eng._req_counter = itertools.count()
    eng.slots = 2
    eng.slot_req = [None, None]
    eng.slot_len = np.zeros(2, np.int32)
    eng.slot_last_tok = np.zeros(2, np.int32)
    eng.finished = []
    eng.finished_count = 0
    eng._ttft_window = deque(maxlen=16)
    eng._latency_window = deque(maxlen=16)
    eng._inflight = None
    eng._dev_state = None
    eng._cache_alloc = []
    eng.caches = []
    eng._last_step_s = None
    eng.steps = 0
    eng.decode_tokens = 0
    eng.device_sampler = None
    if step_error is not None:
        def _boom():
            raise RuntimeError(step_error)
        eng.step = _boom
    return eng


def test_submit_rejects_empty_prompt():
    eng = _skeleton_engine()
    with pytest.raises(ValueError):
        eng.submit([], max_new_tokens=4)


def test_engine_loop_survives_step_exception():
    """A step() crash must release waiters with an error, not hang them."""
    from rten_tpu.serving.http_server import EngineLoop

    eng = _skeleton_engine(step_error="device exploded")
    loop = EngineLoop(eng)
    try:
        req = loop.submit_and_wait([1, 2, 3], 4, wait_s=10.0)
        # The loop thread is still alive and serving after the crash.
        assert loop._thread.is_alive()
    finally:
        loop.shutdown()
    assert req.done
    assert req.error is not None and "device exploded" in req.error


def test_fail_inflight_fails_running_and_queued():
    from rten_tpu.serving.engine import Request

    eng = _skeleton_engine()
    running = Request(prompt=[1], request_id=0)
    queued = Request(prompt=[2], request_id=1)
    eng.slot_req[0] = running
    eng.queue.append(queued)
    failed = eng.fail_inflight("boom")
    assert {r.request_id for r in failed} == {0, 1}
    assert all(r.done and r.error == "boom" for r in failed)
    assert eng.slot_req[0] is None and not eng.queue


def test_drain_finished_bounds_memory():
    from rten_tpu.serving.engine import Request

    eng = _skeleton_engine()
    for i in range(10):
        r = Request(prompt=[1], request_id=i)
        r.finished_at = r.submitted_at + 0.1
        eng._finish(r)
    assert len(eng.drain_finished()) == 10
    assert eng.finished == []          # drained
    assert eng.finished_count == 10    # cumulative stat survives
    assert eng.stats()["finished_requests"] == 10


# --- 3/4. prepack edge cases -------------------------------------------------

def _mmitf_graph(b_arr, b_zp, *, zp_is_input=False, b_scale=None, M=4):
    K = b_arr.shape[0]
    g = Graph()
    a = g.add_value("a", DataType.UInt8, (M, K))
    b_id = g.add_constant("w", b_arr)
    a_scale = g.add_constant("a_scale", np.float32(0.02))
    if b_scale is None:
        b_scale = np.float32(0.01)
    bs_id = g.add_constant("b_scale", b_scale)
    azp_id = g.add_constant("a_zp", np.uint8(128))
    if zp_is_input:
        zp_id = g.add_value("b_zp", DataType.from_np(b_zp.dtype), b_zp.shape)
    else:
        zp_id = g.add_constant("b_zp", b_zp)
    y = g.add_value("y", DataType.Float, (M, b_arr.shape[1]))
    g.add_op(
        "MatMulIntegerToFloat",
        [a, b_id, a_scale, bs_id, azp_id, zp_id, None],
        [y],
    )
    g.input_ids = [a] + ([zp_id] if zp_is_input else [])
    g.output_ids = [y]
    return g, a, zp_id


def _expected(a, b, b_zp, b_scale):
    acc = (a.astype(np.int32) - 128) @ (
        b.astype(np.int32) - np.asarray(b_zp, np.int32)
    )
    return acc.astype(np.float32) * 0.02 * np.asarray(b_scale, np.float32)


def test_prepack_skips_u8_weight_with_runtime_zp():
    """u8 weight + non-constant zp: load-time u8 colsums would be off by
    a_zp*128*K after the kernel's runtime u8->s8 shift — must not prepack."""
    rng = np.random.default_rng(0)
    K, N = 32, 128
    b = rng.integers(0, 255, (K, N)).astype(np.uint8)
    g, a_id, zp_id = _mmitf_graph(b, np.uint8(7), zp_is_input=True)
    assert not prepack_int8_weights(g)
    op = next(op for _, op in g.operators())
    assert len(op.inputs) < 8 or op.inputs[7] is None
    # Numerics still correct through the unprepacked path.
    a = rng.integers(0, 255, (4, K)).astype(np.uint8)
    ex = Executor(g, RunConfig())
    got = np.asarray(ex.run({a_id: a, zp_id: np.uint8(7)}, g.output_ids)[0])
    np.testing.assert_allclose(got, _expected(a, b, 7, 0.01), rtol=1e-4)


@pytest.mark.parametrize("min_m", [0, 1024])  # pallas-interpret and XLA paths
def test_prepack_pads_per_column_zp(min_m):
    """s8 weight, per-column zp, N not a multiple of 128: the zp vector must
    be padded with the weight so the kernel's [1, Np] reshape works."""
    rng = np.random.default_rng(1)
    K, N = 32, 100
    b = rng.integers(-127, 127, (K, N)).astype(np.int8)
    b_zp = rng.integers(-20, 20, (N,)).astype(np.int8)
    b_scale = rng.uniform(0.005, 0.02, (N,)).astype(np.float32)
    g, a_id, _ = _mmitf_graph(b, b_zp, b_scale=b_scale, M=64)
    assert prepack_int8_weights(g)
    op = next(op for _, op in g.operators())
    assert op.attrs.get("rten_orig_n") == N
    zp_node = g.nodes[op.inputs[5]]
    assert isinstance(zp_node, Constant) and zp_node.array.shape == (128,)
    np.testing.assert_array_equal(zp_node.array[:N], b_zp.astype(np.int32))
    a = rng.integers(0, 255, (64, K)).astype(np.uint8)
    ex = Executor(g, RunConfig(pallas_int8_min_m=min_m))
    got = np.asarray(ex.run({a_id: a}, g.output_ids)[0])
    np.testing.assert_allclose(
        got, _expected(a, b, b_zp, b_scale), rtol=1e-3, atol=1e-3
    )


def test_prepack_u8_weight_const_zp_still_prepacks():
    """The common offline-quantized case (u8 weight, constant zp) must keep
    the full prepack: flip folded, colsums attached, numerics exact."""
    rng = np.random.default_rng(2)
    K, N = 32, 128
    b = rng.integers(0, 255, (K, N)).astype(np.uint8)
    g, a_id, _ = _mmitf_graph(b, np.uint8(7))
    assert prepack_int8_weights(g)
    op = next(op for _, op in g.operators())
    assert op.inputs[7] is not None
    assert g.nodes[op.inputs[1]].array.dtype == np.int8  # flip folded
    a = rng.integers(0, 255, (4, K)).astype(np.uint8)
    ex = Executor(g, RunConfig())
    got = np.asarray(ex.run({a_id: a}, g.output_ids)[0])
    np.testing.assert_allclose(got, _expected(a, b, 7, 0.01), rtol=1e-4)
