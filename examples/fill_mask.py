"""Masked word prediction (fill-mask) with a masked-LM model.

Reference counterpart: rten-examples/src/modernbert.rs — run a BERT-class
masked-LM over text containing [MASK] tokens and report the top
predictions for each masked position.

Usage: python examples/fill_mask.py model.onnx "text with [MASK]"  (or --demo)
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rten_tpu.model import Model


def _softmax(x: np.ndarray) -> np.ndarray:
    e = np.exp(x - x.max(axis=-1, keepdims=True))
    return e / e.sum(axis=-1, keepdims=True)


def predict_masked(model: Model, input_ids, mask_id: int,
                   attention_mask=None, top_k: int = 5):
    """Top-k (token_id, probability) per masked position.

    Returns {position: [(id, prob), ...]} for every position where
    ``input_ids`` equals ``mask_id`` (batch of one).
    """
    ids = np.asarray(input_ids, np.int32)
    if ids.ndim == 1:
        ids = ids[None]
    feed = {"input_ids": ids}
    names = set(model.input_names())
    if "attention_mask" in names:
        am = (np.ones_like(ids) if attention_mask is None
              else np.asarray(attention_mask, np.int32).reshape(ids.shape))
        feed["attention_mask"] = am
    logits = np.asarray(model.run(feed)[0])[0]        # [T, vocab]
    probs = _softmax(logits.astype(np.float64))
    out = {}
    for pos in np.flatnonzero(ids[0] == mask_id):
        order = np.argsort(-probs[pos])[:top_k]
        out[int(pos)] = [(int(i), float(probs[pos, i])) for i in order]
    return out


def main():
    args = sys.argv[1:]
    if args and args[0] != "--demo":
        model = Model.load_file(args[0])
        from rten_tpu.text import Tokenizer

        tok = Tokenizer.from_file(args[1])
        text = args[2] if len(args) > 2 else "The capital of France is [MASK]."
        ids = tok.encode(text).ids
        mask_id = tok.token_to_id("[MASK]")
        decode = lambda i: tok.decode([i])
    else:
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
        from example_models import export_mlm_model

        path = "/tmp/fill_mask.onnx"
        export_mlm_model(path)
        model = Model.load_file(path)
        rng = np.random.default_rng(0)
        ids = rng.integers(3, 128, 12).tolist()
        mask_id = 1
        ids[4] = mask_id
        ids[9] = mask_id
        decode = lambda i: f"<tok{i}>"

    preds = predict_masked(model, ids, mask_id)
    for pos, topk in sorted(preds.items()):
        best = ", ".join(f"{decode(i)} ({p:.3f})" for i, p in topk[:3])
        print(f"position {pos}: {best}")


if __name__ == "__main__":
    main()
