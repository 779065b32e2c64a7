"""Monocular depth estimation (depth_anything analog,
rten-examples/src/depth_anything.rs): image -> normalized depth map ->
stats / nearest-region box.

Usage: python examples/depth.py model.onnx image.png  (or --demo)
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rten_tpu.imageproc import bounding_rect, find_contours
from rten_tpu.model import Model


def estimate_depth(model: Model, image_chw: np.ndarray) -> np.ndarray:
    out = np.asarray(model.run({model.input_names()[0]: image_chw[None]})[0])
    depth = out[0]
    lo, hi = float(depth.min()), float(depth.max())
    return (depth - lo) / max(hi - lo, 1e-9)


def main():
    args = sys.argv[1:]
    if args and args[0] != "--demo":
        path = args[0]
        from rten_tpu.imageio import read_image

        img = read_image(args[1])
    else:
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
        from example_models import export_depth_model

        path = "/tmp/depth_model.onnx"
        export_depth_model(path)
        img = np.random.default_rng(0).random((3, 32, 32)).astype(np.float32)

    model = Model.load_file(path)
    depth = estimate_depth(model, img)
    near = (depth > 0.8).astype(np.uint8)
    contours = find_contours(near)
    print(f"depth map {depth.shape}: mean {depth.mean():.3f}")
    for ct in contours[:5]:
        r = bounding_rect(ct)
        print(f"  near region: ({r.top},{r.left})-({r.bottom},{r.right})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
