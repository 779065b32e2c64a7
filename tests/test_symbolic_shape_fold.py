"""Symbolic shape-value folding in the optimizer (rten-shape-inference
symbolic values, rten-shape-inference/src/lib.rs:40-62 + the
ShapeSliceToConstant early fusion, rten src/optimize.rs:611-651)."""

import numpy as np
import torch
import torch.nn as nn

from onnx_export_util import export_onnx
from util import assert_close

from rten_tpu.dtypes import DataType
from rten_tpu.ir.graph import Constant, Graph
from rten_tpu.model import Model, ModelOptions
from rten_tpu.optimize import fold_shape_computations
from rten_tpu.shape_inference import SymVal, infer_shapes_and_values


def test_symval_propagation_through_chain():
    """Shape(["batch",12,64]) -> Gather(2) is concrete despite symbolic batch."""
    g = Graph()
    x = g.add_value("x", DataType.Float, ("batch", 12, 64))
    sh = g.add_value("sh", DataType.Int32, (3,))
    idx = g.add_constant("idx", np.int32(2))
    d2 = g.add_value("d2", DataType.Int32, ())
    g.add_op("Shape", [x], [sh])
    g.add_op("Gather", [sh, idx], [d2], {"axis": 0})
    g.input_ids, g.output_ids = [x], [d2]
    _, vals = infer_shapes_and_values(g)
    assert vals[sh].dims == ["batch", 12, 64]
    assert vals[d2].dims == [64]
    assert int(vals[d2].concrete()) == 64


def test_fold_replaces_concrete_shape_values():
    """Reshape target built from Shape pieces folds to a Constant even with
    a symbolic batch, and the model still runs."""
    g = Graph()
    x = g.add_value("x", DataType.Float, ("batch", 12, 64))
    sh = g.add_value("sh", DataType.Int32, (3,))
    g.add_op("Shape", [x], [sh])
    tail = g.add_value("tail", DataType.Int32, (2,))
    one = g.add_constant("one", np.int32([1]))
    three = g.add_constant("three", np.int32([3]))
    g.add_op("Slice", [sh, one, three], [tail])
    prod = g.add_value("prod", DataType.Int32, ())
    g.add_op("ReduceProd", [tail], [prod], {"keepdims": 0})
    g.input_ids, g.output_ids = [x], [prod]

    assert fold_shape_computations(g)
    assert isinstance(g.nodes[prod], Constant)
    assert int(g.nodes[prod].array) == 12 * 64
    # Shape/Slice/ReduceProd chain is gone.
    assert all(
        op.op_type not in ("Shape", "Slice", "ReduceProd")
        for _, op in g.operators()
    )


def test_symbolic_dims_stay_unfolded():
    g = Graph()
    x = g.add_value("x", DataType.Float, ("batch", 64))
    sh = g.add_value("sh", DataType.Int32, (2,))
    g.add_op("Shape", [x], [sh])
    g.input_ids, g.output_ids = [x], [sh]
    fold_shape_computations(g)
    # sh contains the symbolic batch -> must NOT fold (and is an output).
    from rten_tpu.ir.graph import Value

    assert isinstance(g.nodes[sh], Value)
    m = Model(g, ModelOptions(optimize=True))
    out = np.asarray(m.run({"x": np.zeros((5, 64), np.float32)})[0])
    np.testing.assert_array_equal(out, [5, 64])


def test_torch_export_with_dynamic_batch_folds_and_runs(tmp_path):
    """A real exporter graph with dynamic batch: view/flatten emit
    Shape->Gather chains; after folding the model must match torch at
    several batch sizes."""

    class M(nn.Module):
        def __init__(self):
            super().__init__()
            self.fc = nn.Linear(12 * 16, 8)

        def forward(self, x):
            b = x.shape[0]
            return self.fc(x.reshape(b, -1))

    torch.manual_seed(0)
    net = M().eval()
    x = torch.randn(4, 12, 16)
    p = export_onnx(net, x, str(tmp_path / "dyn.onnx"), ["x"], ["y"],
                    dynamic_axes={"x": {0: "batch"}})
    m = Model.load_file(p, ModelOptions(optimize=True))
    for b in (2, 4, 7):
        xb = torch.randn(b, 12, 16)
        got = np.asarray(m.run({"x": xb.numpy()})[0])
        want = net(xb).detach().numpy()
        assert_close(got, want, rtol=1e-4, atol=1e-5)
