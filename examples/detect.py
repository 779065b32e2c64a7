"""Object detection end-to-end: ONNX detector -> engine -> NMS -> boxes.

The vision-detection demo the reference ships as rten-examples/src/yolo.rs:
load a YOLO-style ONNX model (output [B, 4+nc, N], xywh+class scores),
run it on the engine, decode + NMS on the host via rten_tpu.imageproc,
and draw/print the boxes.

Usage:
    python examples/detect.py model.onnx image.png
    python examples/detect.py --demo        # tiny random-weight demo model
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rten_tpu.imageproc import Rect, draw_rect, nms_boxes
from rten_tpu.model import Model


def decode_detections(
    raw: np.ndarray,
    score_threshold: float = 0.25,
    iou_threshold: float = 0.45,
):
    """YOLOv8-layout postprocess: raw [4+nc, N] -> [(Rect, cls, score)].

    Rows 0-3: cx, cy, w, h in input pixels; rows 4..: class scores.
    """
    boxes_xywh = raw[:4].T          # [N, 4]
    scores_all = raw[4:].T          # [N, nc]
    cls = scores_all.argmax(axis=1)
    score = scores_all.max(axis=1)
    cx, cy, w, h = boxes_xywh.T
    tlbr = np.stack([cy - h / 2, cx - w / 2, cy + h / 2, cx + w / 2], axis=1)
    keep = nms_boxes(tlbr, score, iou_threshold, score_threshold)
    return [
        (Rect(*[float(c) for c in tlbr[i]]), int(cls[i]), float(score[i]))
        for i in keep
    ]


def run_detection(model_path: str, image_chw: np.ndarray,
                  score_threshold: float = 0.25):
    model = Model.load_file(model_path)
    out = np.asarray(model.run({model.input_names()[0]: image_chw[None]})[0])
    return decode_detections(out[0], score_threshold=score_threshold)


def main():
    args = sys.argv[1:]
    if args and args[0] == "--demo":
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
        from yolo_like_model import export_yolo_like

        path = "/tmp/yolo_like.onnx"
        export_yolo_like(path)
        rng = np.random.default_rng(0)
        img = rng.random((3, 64, 64), np.float32)
    else:
        if len(args) < 2:
            print(__doc__)
            return 1
        path = args[0]
        from rten_tpu.imageio import read_image

        img = read_image(args[1])

    dets = run_detection(path, img, score_threshold=0.3)
    canvas = np.zeros(img.shape[1:], np.uint8)
    for rect, cls, score in dets[:20]:
        print(f"class={cls} score={score:.3f} "
              f"box=({rect.top:.0f},{rect.left:.0f})-({rect.bottom:.0f},{rect.right:.0f})")
        draw_rect(
            canvas,
            Rect(int(rect.top), int(rect.left), int(rect.bottom), int(rect.right)),
            255,
        )
    print(f"{len(dets)} detections")
    return 0


if __name__ == "__main__":
    sys.exit(main())
