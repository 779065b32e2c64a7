"""Semantic segmentation (deeplab/rmbg analog,
rten-examples/src/deeplab.rs): per-pixel class map -> masks -> contours
via rten_tpu.imageproc.

Usage: python examples/segment.py model.onnx image.png  (or --demo)
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rten_tpu.imageproc import bounding_rect, find_contours
from rten_tpu.model import Model


def segment(model: Model, image_chw: np.ndarray):
    """Returns (class_map [H, W] int, per-class contour lists)."""
    logits = np.asarray(model.run({model.input_names()[0]: image_chw[None]})[0])
    class_map = logits[0].argmax(axis=0)
    regions = {}
    for c in np.unique(class_map):
        mask = (class_map == c).astype(np.uint8)
        regions[int(c)] = find_contours(mask)
    return class_map, regions


def main():
    args = sys.argv[1:]
    if args and args[0] != "--demo":
        path, img_path = args[0], args[1]
        from rten_tpu.imageio import read_image

        img = read_image(img_path)
    else:
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
        from example_models import export_seg_model

        path = "/tmp/seg_model.onnx"
        export_seg_model(path)
        img = np.random.default_rng(0).random((3, 32, 32)).astype(np.float32)

    model = Model.load_file(path)
    class_map, regions = segment(model, img)
    for c, contours in regions.items():
        px = int((class_map == c).sum())
        rects = [bounding_rect(ct) for ct in contours[:3]]
        print(f"class {c}: {px} px, {len(contours)} regions, "
              f"first rects {[(r.top, r.left, r.bottom, r.right) for r in rects]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
