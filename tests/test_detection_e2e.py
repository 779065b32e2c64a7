"""Detection example end-to-end: engine output + our NMS must match the
torch reference pipeline box-for-box (reference rten-examples/src/yolo.rs
+ its python reference diff workflow)."""

import os
import sys

import numpy as np
import pytest
import torch

from yolo_like_model import YoloLike, export_yolo_like

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))
from detect import decode_detections, run_detection  # noqa: E402


@pytest.fixture(scope="module")
def yolo(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("det") / "yolo_like.onnx")
    module = export_yolo_like(path)
    return path, module


def _torch_reference_dets(module, img, score_thr=0.1, iou_thr=0.45):
    """Independent numpy postprocess over the torch forward."""
    with torch.no_grad():
        raw = module(torch.from_numpy(img[None]))[0].numpy()
    xywh = raw[:4].T
    scores_all = raw[4:].T
    cls = scores_all.argmax(1)
    score = scores_all.max(1)
    cx, cy, w, h = xywh.T
    tlbr = np.stack([cy - h / 2, cx - w / 2, cy + h / 2, cx + w / 2], 1)
    order = np.argsort(-score)
    order = order[score[order] > score_thr]
    keep = []
    def iou(a, b):
        t = max(a[0], b[0]); l = max(a[1], b[1])
        bo = min(a[2], b[2]); r = min(a[3], b[3])
        inter = max(bo - t, 0) * max(r - l, 0)
        ar_a = (a[2] - a[0]) * (a[3] - a[1])
        ar_b = (b[2] - b[0]) * (b[3] - b[1])
        return inter / (ar_a + ar_b - inter + 1e-9)
    for i in order:
        if all(iou(tlbr[i], tlbr[j]) <= iou_thr for j in keep):
            keep.append(int(i))
    return [(tlbr[i], int(cls[i]), float(score[i])) for i in keep]


def test_detection_matches_torch_reference(yolo):
    path, module = yolo
    rng = np.random.default_rng(3)
    img = rng.random((3, 64, 64)).astype(np.float32)

    got = run_detection(path, img, score_threshold=0.1)
    want = _torch_reference_dets(module, img, score_thr=0.1)
    assert len(got) == len(want) > 0
    for (rect, cls, score), (wbox, wcls, wscore) in zip(got, want):
        assert cls == wcls
        assert abs(score - wscore) < 1e-3
        np.testing.assert_allclose(
            [rect.top, rect.left, rect.bottom, rect.right], wbox,
            rtol=1e-3, atol=1e-2,
        )


def test_decode_respects_thresholds(yolo):
    path, module = yolo
    rng = np.random.default_rng(4)
    img = rng.random((3, 64, 64)).astype(np.float32)
    hi = run_detection(path, img, score_threshold=0.9)
    lo = run_detection(path, img, score_threshold=0.01)
    assert len(hi) <= len(lo)
    for _, _, score in hi:
        assert score > 0.9


def test_demo_example_runs(yolo, capsys):
    """examples/detect.py --demo executes end to end."""
    import detect

    old_argv = sys.argv
    sys.argv = ["detect.py", "--demo"]
    try:
        assert detect.main() == 0
    finally:
        sys.argv = old_argv
    out = capsys.readouterr().out
    assert "detections" in out
