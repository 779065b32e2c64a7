#!/usr/bin/env python
"""Image classification: ONNX model + imageio preprocessing.

With a real export:  python examples/classify_image.py model.onnx cat.jpg
Demo mode (no args): builds a small CNN in torch, exports ONNX in-process,
classifies a synthetic image — the full imagenet-example flow
(read image -> normalize -> run -> top-k) without downloads.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rten_tpu.utils import honor_jax_platforms_env

honor_jax_platforms_env()

import numpy as np

IMAGENET_MEAN = [0.485, 0.456, 0.406]
IMAGENET_STD = [0.229, 0.224, 0.225]


def demo_model(tmpdir):
    import torch
    import torch.nn as nn

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests"))
    from onnx_export_util import export_onnx

    m = nn.Sequential(
        nn.Conv2d(3, 16, 3, stride=2, padding=1), nn.ReLU(),
        nn.AdaptiveAvgPool2d(1), nn.Flatten(), nn.Linear(16, 10),
    ).eval()
    path = os.path.join(tmpdir, "demo_classifier.onnx")
    export_onnx(m, torch.randn(1, 3, 64, 64), path, ["image"], ["logits"])
    return path


def main():
    from rten_tpu.imageio import image_to_tensor, read_image
    from rten_tpu.imageproc import normalize_image
    from rten_tpu.model import Model

    if len(sys.argv) >= 3:
        model_path, image_path = sys.argv[1], sys.argv[2]
        chw = read_image(image_path)
    else:
        import tempfile

        tmpdir = tempfile.mkdtemp()
        model_path = demo_model(tmpdir)
        rng = np.random.default_rng(0)
        chw = image_to_tensor((rng.random((64, 64, 3)) * 255).astype(np.uint8))

    model = Model.load_file(model_path)
    x = normalize_image(chw, IMAGENET_MEAN, IMAGENET_STD)[None]
    logits = np.asarray(model.run({model.input_names()[0]: x})[0])[0]
    top = np.argsort(-logits)[:5]
    probs = np.exp(logits - logits.max())
    probs /= probs.sum()
    print("top-5:")
    for i in top:
        print(f"  class {i}: {probs[i]:.3f}")


if __name__ == "__main__":
    main()
