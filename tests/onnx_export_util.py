"""Helper: export torch modules to ONNX without the `onnx` pip package.

torch's TorchScript exporter serializes the protobuf itself; it only
imports `onnx` for an optional onnxscript post-processing step, which we
bypass. This gives the tests real-world exporter output to validate the
from-scratch parser against.
"""

from __future__ import annotations

import torch
from torch.onnx._internal.torchscript_exporter import onnx_proto_utils

# Bypass the onnxscript-function post-processing (requires `onnx` module).
onnx_proto_utils._add_onnxscript_fn = lambda model_bytes, custom_opsets: model_bytes


def export_onnx(module, args, path, input_names=None, output_names=None,
                dynamic_axes=None, opset_version=17):
    module = module.eval()
    with torch.no_grad():
        torch.onnx.export(
            module,
            args if isinstance(args, tuple) else (args,),
            path,
            input_names=input_names,
            output_names=output_names,
            dynamic_axes=dynamic_axes,
            opset_version=opset_version,
            dynamo=False,
        )
    return path
