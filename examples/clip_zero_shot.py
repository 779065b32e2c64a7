"""CLIP-style zero-shot image classification (rten-examples/src/clip.rs):
embed an image and a set of text labels with a dual encoder, score by
scaled cosine similarity, softmax over labels.

Usage: python examples/clip_zero_shot.py image_enc.onnx text_enc.onnx
       python examples/clip_zero_shot.py --demo
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rten_tpu.model import Model


def zero_shot_scores(img_model: Model, txt_model: Model,
                     image: np.ndarray, label_ids, logit_scale: float = 100.0):
    """image [3,H,W] + tokenized labels -> probability per label."""
    img_emb = np.asarray(
        img_model.run({"image": image[None].astype(np.float32)})[0]
    )[0]
    T = max(len(x) for x in label_ids)
    ids = np.zeros((len(label_ids), T), np.int32)
    mask = np.zeros((len(label_ids), T), np.int32)
    for i, x in enumerate(label_ids):
        ids[i, : len(x)] = x
        mask[i, : len(x)] = 1
    txt_emb = np.asarray(txt_model.run(
        {"input_ids": ids, "attention_mask": mask}
    )[0])
    logits = logit_scale * txt_emb @ img_emb  # embeddings are L2-normalized
    e = np.exp(logits - logits.max())
    return e / e.sum()


def main():
    if len(sys.argv) >= 3 and sys.argv[1] != "--demo":
        img_path, txt_path = sys.argv[1], sys.argv[2]
    else:
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
        from example_models import export_clip_models

        img_path, txt_path = "/tmp/clip_img.onnx", "/tmp/clip_txt.onnx"
        export_clip_models(img_path, txt_path)
    img_model = Model.load_file(img_path)
    txt_model = Model.load_file(txt_path)
    rng = np.random.default_rng(1)
    image = rng.random((3, 32, 32)).astype(np.float32)
    labels = [[5, 9, 23], [40, 7, 12], [3, 3, 8, 1]]
    probs = zero_shot_scores(img_model, txt_model, image, labels)
    for i, p in enumerate(probs):
        print(f"label {i}: {p:.4f}")
    print("best:", int(np.argmax(probs)))


if __name__ == "__main__":
    main()
