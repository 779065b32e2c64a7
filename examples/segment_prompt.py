"""Prompted segmentation (segment-anything analog,
rten-examples/src/segment_anything.rs): run the heavy image encoder once,
then re-run the light prompt decoder for each set of clicked points,
producing a mask + IoU-quality score per prompt.

Usage: python examples/segment_prompt.py encoder.onnx decoder.onnx image.npy x,y [x,y ...]
       python examples/segment_prompt.py --demo
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rten_tpu.model import Model


def embed_image(encoder: Model, image_chw: np.ndarray) -> np.ndarray:
    """One-time image embedding (the expensive half of the pipeline)."""
    return np.asarray(
        encoder.run({encoder.input_names()[0]: image_chw[None]})[0]
    )


def segment_points(decoder: Model, image_embed: np.ndarray,
                   points_xy: np.ndarray, threshold: float = 0.0):
    """Mask + IoU score for one prompt (points normalized to [0, 1])."""
    labels = np.ones(points_xy.shape[:1], np.int64)
    mask, iou = decoder.run({
        "image_embed": image_embed,
        "points": points_xy[None].astype(np.float32),
        "labels": labels[None],
    })
    mask = np.asarray(mask)[0, 0]
    return mask > threshold, float(np.asarray(iou).ravel()[0])


def main():
    if len(sys.argv) >= 5 and sys.argv[1] != "--demo":
        enc_path, dec_path, img_path = sys.argv[1:4]
        image = np.load(img_path)
        prompts = [tuple(map(float, a.split(","))) for a in sys.argv[4:]]
    else:
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
        from example_models import export_sam_models

        enc_path, dec_path = "/tmp/sam_enc.onnx", "/tmp/sam_dec.onnx"
        export_sam_models(enc_path, dec_path)
        rng = np.random.default_rng(0)
        image = rng.random((3, 32, 32)).astype(np.float32)
        prompts = [(0.25, 0.25), (0.75, 0.6)]
    encoder = Model.load_file(enc_path)
    decoder = Model.load_file(dec_path)
    embed = embed_image(encoder, image)
    for xy in prompts:
        mask, iou = segment_points(decoder, embed, np.array([xy]))
        print(f"point {xy}: mask {mask.shape}, {int(mask.sum())} px, "
              f"iou score {iou:.3f}")


if __name__ == "__main__":
    main()
