"""Background removal (BRIA RMBG analog, rten-examples/src/rmbg.rs): a
matting model predicts a per-pixel alpha channel; the foreground is
composited as RGBA (or over a solid color).

Usage: python examples/remove_background.py rmbg.onnx image.npy out.npy
       python examples/remove_background.py --demo
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rten_tpu.model import Model


def remove_background(model: Model, image_chw: np.ndarray) -> np.ndarray:
    """RGBA [4, H, W] with the model's alpha matte in channel 3."""
    alpha = np.asarray(
        model.run({model.input_names()[0]: image_chw[None]})[0]
    )[0]  # [1, H, W]
    return np.concatenate([image_chw, alpha], axis=0)


def composite(rgba: np.ndarray, bg_rgb=(1.0, 1.0, 1.0)) -> np.ndarray:
    """Alpha-blend the cutout over a solid background color."""
    a = rgba[3:4]
    bg = np.asarray(bg_rgb, np.float32).reshape(3, 1, 1)
    return rgba[:3] * a + bg * (1.0 - a)


def main():
    if len(sys.argv) >= 3 and sys.argv[1] != "--demo":
        model_path, img_path = sys.argv[1:3]
        image = np.load(img_path)
    else:
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
        from example_models import export_rmbg_model

        model_path = "/tmp/rmbg.onnx"
        export_rmbg_model(model_path)
        rng = np.random.default_rng(0)
        image = rng.random((3, 32, 32)).astype(np.float32)
    model = Model.load_file(model_path)
    rgba = remove_background(model, image)
    fg = float(rgba[3].mean())
    print(f"alpha matte: mean coverage {fg:.3f}, shape {rgba.shape}")
    if len(sys.argv) >= 4 and sys.argv[1] != "--demo":
        np.save(sys.argv[3], rgba)


if __name__ == "__main__":
    main()
