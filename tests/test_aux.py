"""Aux subsystems: serialization, profiler, CLI, CTC decoding."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
import torch

from util import assert_close

from rten_tpu.ctc import CtcDecoder, ctc_beam_search_decode, ctc_greedy_decode
from rten_tpu.serialize import (
    read_safetensors,
    read_tensors,
    write_safetensors,
    write_tensors,
)

RNG = np.random.default_rng(21)


def test_safetensors_roundtrip(tmp_path):
    tensors = {
        "a": RNG.standard_normal((3, 4)).astype(np.float32),
        "b": RNG.integers(0, 255, (7,)).astype(np.uint8),
        "c": RNG.standard_normal((2, 2, 2)).astype(np.float16),
        "d": np.asarray([True, False, True]),
    }
    p = tmp_path / "t.safetensors"
    write_safetensors(p, tensors, metadata={"src": "test"})
    got = read_safetensors(p)
    for k, v in tensors.items():
        assert got[k].dtype == v.dtype
        np.testing.assert_array_equal(got[k], v)
    # Cross-check against the reference library.
    from safetensors.numpy import load_file

    ref = load_file(str(p))
    for k, v in tensors.items():
        np.testing.assert_array_equal(ref[k], v)


def test_safetensors_reads_reference_file(tmp_path):
    from safetensors.numpy import save_file

    tensors = {"x": RNG.standard_normal((5, 6)).astype(np.float32)}
    p = str(tmp_path / "ref.safetensors")
    save_file(tensors, p)
    got = read_safetensors(p)
    np.testing.assert_array_equal(got["x"], tensors["x"])


def test_npz_roundtrip(tmp_path):
    p = str(tmp_path / "t.npz")
    write_tensors(p, {"x": np.arange(5.0), "y": np.int32([1, 2])})
    got = read_tensors(p)
    np.testing.assert_array_equal(got["x"], np.arange(5.0))


def test_profiler():
    from rten_tpu import Executor, GraphBuilder, RunConfig

    b = GraphBuilder()
    x = b.input("x")
    w = b.constant("w", RNG.standard_normal((64, 64)).astype(np.float32))
    y = b.op("MatMul", [x, w])
    b.output(y.relu())
    g = b.finish()
    ex = Executor(g, RunConfig())
    feed = {g.input_ids[0]: RNG.standard_normal((8, 64)).astype(np.float32)}
    outs, prof = ex.profile_run(feed, g.output_ids)
    assert len(prof.records) == 2
    report = prof.report()
    assert "MatMul" in report and "Relu" in report


def test_ctc_greedy():
    # T=5, C=3 (blank=0). Path: 1 1 blank 2 2 -> [1, 2]
    probs = np.array(
        [[0.1, 0.8, 0.1], [0.1, 0.8, 0.1], [0.9, 0.05, 0.05],
         [0.1, 0.1, 0.8], [0.2, 0.1, 0.7]]
    )
    hyp = ctc_greedy_decode(probs)
    assert hyp.labels == [1, 2]


def test_ctc_beam_vs_torchaudio_style():
    # Beam search should sum over paths: a case where greedy is suboptimal.
    probs = np.array(
        [[0.4, 0.6, 0.0], [0.4, 0.0, 0.6], [0.5, 0.5, 0.0]]
    )
    greedy = ctc_greedy_decode(probs)
    beams = ctc_beam_search_decode(probs, beam_width=8, n_best=3)
    assert beams[0].score >= beams[-1].score
    # Exhaustive check of best labeling by brute force.
    best_label, best_p = None, 0.0
    from itertools import product

    for path in product(range(3), repeat=3):
        p = np.prod([probs[t, c] for t, c in enumerate(path)])
        lab = []
        prev = -1
        for c in path:
            if c != 0 and c != prev:
                lab.append(c)
            prev = c
        key = tuple(lab)
        # accumulate per labeling
        best_label = best_label or {}
        best_label[key] = best_label.get(key, 0.0) + p
    want = max(best_label.items(), key=lambda kv: kv[1])
    assert tuple(beams[0].labels) == want[0]
    assert abs(np.exp(beams[0].score) - want[1]) < 1e-6


def test_cli_end_to_end(tmp_path):
    import torch.nn as nn

    from onnx_export_util import export_onnx

    m = nn.Sequential(nn.Linear(16, 8), nn.ReLU(), nn.Linear(8, 4))
    x = torch.randn(2, 16)
    path = str(tmp_path / "m.onnx")
    export_onnx(m, x, path, ["x"], ["y"])

    from rten_tpu.cli import main

    out_file = str(tmp_path / "outs.npz")
    rc = main([path, "-n", "2", "--save-outputs", out_file, "-q"])
    assert rc == 0
    # check-outputs agrees with itself
    rc = main([path, "--inputs", out_file, "--check-outputs", out_file, "-q"])
    # (inputs file doesn't contain 'x', so random inputs are used; the
    # comparison can fail — instead save inputs too)
    feed = {"x": x.numpy()}
    from rten_tpu.serialize import write_tensors

    in_file = str(tmp_path / "ins.npz")
    write_tensors(in_file, feed)
    rc = main([path, "--inputs", in_file, "--save-outputs", out_file, "-q"])
    assert rc == 0
    rc = main([path, "--inputs", in_file, "--check-outputs", out_file, "-q"])
    assert rc == 0


def test_graph_tool_expose_and_rename(tmp_path):
    """tools/graph_tool.py: expose intermediate outputs, rename inputs,
    round-trip through .rtpu (update-onnx-model.py analog)."""
    import subprocess
    import sys as _sys

    import torch
    import torch.nn as nn
    from onnx_export_util import export_onnx

    net = nn.Sequential(nn.Linear(8, 8), nn.ReLU(), nn.Linear(8, 4)).eval()
    x = torch.randn(2, 8)
    src = str(tmp_path / "m.onnx")
    export_onnx(net, x, src, ["x"], ["y"])
    out = str(tmp_path / "m2.rtpu")

    from rten_tpu.model import Model, ModelOptions

    plain = Model.load_file(src, ModelOptions(optimize=False))
    mid_name = None
    for _, op in plain.graph.operators():
        if op.op_type == "Relu":
            mid_name = plain.graph.node_name(op.outputs[0])
    assert mid_name

    r = subprocess.run(
        [_sys.executable, "tools/graph_tool.py", src, "--no-optimize",
         "--expose-output", mid_name, "--rename-input", "x:input", "-o", out],
        capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert r.returncode == 0, r.stdout + r.stderr

    m2 = Model.load_file(out)
    assert "input" in m2.input_names()
    assert mid_name in m2.output_names()
    outs = m2.run({"input": x.numpy()})
    assert len(outs) == 2
    got_mid = np.asarray(outs[m2.output_names().index(mid_name)])
    with torch.no_grad():
        want_mid = net[1](net[0](x)).numpy()
    np.testing.assert_allclose(got_mid, want_mid, rtol=1e-5, atol=1e-6)


def test_functional_helpers_match_torch():
    """rten_tpu.functional (Operators-trait sugar, rten operators.rs)."""
    import torch
    import torch.nn.functional as TF

    from rten_tpu import functional as F

    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, 8)).astype(np.float32)
    t = torch.from_numpy(x)
    np.testing.assert_allclose(F.softmax(x), TF.softmax(t, -1).numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(F.gelu(x), TF.gelu(t).numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(F.silu(x), TF.silu(t).numpy(), rtol=1e-5, atol=1e-6)
    w = np.ones(8, np.float32)
    np.testing.assert_allclose(
        F.layer_norm(x, w, np.zeros(8, np.float32)),
        TF.layer_norm(t, (8,)).numpy(), rtol=1e-4, atol=1e-5,
    )
    vals, idx = F.top_k(x, 3)
    tv, ti = torch.topk(t, 3)
    np.testing.assert_allclose(vals, tv.numpy(), rtol=1e-6)
    np.testing.assert_array_equal(idx, ti.numpy())
    assert F.arg_max(x).tolist() == t.argmax(-1).tolist()
