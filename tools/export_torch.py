#!/usr/bin/env python
"""Export a torch module to ONNX without the `onnx` pip package, then
optionally quantize + convert to .rtpu in one step.

The tools/export-timm-model.py analog: point it at a torchvision/timm/HF
constructor and get an engine-ready model file.

Examples:
    python tools/export_torch.py --module tests.torch_models:resnet50 \
        --shape 1,3,224,224 --out resnet50.onnx
    python tools/export_torch.py --module my_pkg:make_model \
        --shape 2,16 --quantize --out model.rtpu
"""

from __future__ import annotations

import argparse
import importlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.getcwd())

from rten_tpu.utils import honor_jax_platforms_env

honor_jax_platforms_env()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--module", required=True,
                    help="constructor as 'package.module:callable'")
    ap.add_argument("--shape", required=True,
                    help="example input shape, comma-separated (e.g. 1,3,224,224)")
    ap.add_argument("--out", required=True, help=".onnx or .rtpu output path")
    ap.add_argument("--quantize", action="store_true", help="dynamic int8")
    ap.add_argument("--input-name", default="input")
    ap.add_argument("--output-name", default="output")
    ap.add_argument("--opset", type=int, default=17)
    ap.add_argument("--dynamic-batch", action="store_true")
    args = ap.parse_args()

    import torch

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
    from onnx_export_util import export_onnx

    mod_name, _, fn_name = args.module.partition(":")
    ctor = getattr(importlib.import_module(mod_name), fn_name)
    model = ctor().eval()
    shape = [int(x) for x in args.shape.split(",")]
    example = torch.randn(*shape)

    onnx_path = args.out if args.out.endswith(".onnx") else args.out + ".tmp.onnx"
    dyn = {args.input_name: {0: "batch"}} if args.dynamic_batch else None
    export_onnx(model, example, onnx_path, [args.input_name],
                [args.output_name], dynamic_axes=dyn, opset_version=args.opset)
    print(f"exported {onnx_path}")

    if args.out.endswith(".onnx") and not args.quantize:
        return 0

    from rten_tpu.model import Model, ModelOptions

    m = Model.load_file(onnx_path, ModelOptions(optimize=True))
    if args.quantize:
        from rten_tpu.quantize_pass import quantize_dynamic

        quantize_dynamic(m.graph)
        m.executor._weights = None
    if args.out.endswith(".onnx"):
        print("(quantization requested but output is .onnx; writing .rtpu alongside)")
        out = args.out[:-5] + ".rtpu"
    else:
        out = args.out
    m.save(out, metadata={"source_module": args.module})
    print(f"saved {out}")
    if onnx_path.endswith(".tmp.onnx"):
        os.unlink(onnx_path)
    return 0


if __name__ == "__main__":
    sys.exit(main())
