"""Extractive question answering (BERT-QA style).

Reference counterpart: rten-examples/src/bert_qa.rs — run a QA model
producing start/end logits over the token sequence, decode the best
answer span.

Usage: python examples/qa_bert.py model.onnx  (or --demo)
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rten_tpu.model import Model


def best_span(start_logits: np.ndarray, end_logits: np.ndarray,
              max_answer_len: int = 30):
    """Highest-scoring (start <= end < start+max_len) span."""
    T = start_logits.shape[-1]
    scores = start_logits[:, None] + end_logits[None, :]
    mask = np.triu(np.ones((T, T), bool)) & ~np.triu(
        np.ones((T, T), bool), k=max_answer_len
    )
    scores = np.where(mask, scores, -np.inf)
    idx = int(np.argmax(scores))
    return idx // T, idx % T


def answer_span(model: Model, input_ids, attention_mask=None,
                token_type_ids=None):
    feed = {"input_ids": np.asarray(input_ids, np.int32)}
    names = set(model.input_names())
    if attention_mask is not None and "attention_mask" in names:
        feed["attention_mask"] = np.asarray(attention_mask, np.int32)
    if token_type_ids is not None and "token_type_ids" in names:
        feed["token_type_ids"] = np.asarray(token_type_ids, np.int32)
    outs = model.run(feed)
    start_logits = np.asarray(outs[0])[0]
    end_logits = np.asarray(outs[1])[0]
    return best_span(start_logits, end_logits)


def main():
    if len(sys.argv) > 1 and sys.argv[1] != "--demo":
        path = sys.argv[1]
    else:
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
        from example_models import export_qa_model

        path = "/tmp/qa_model.onnx"
        export_qa_model(path)
    model = Model.load_file(path)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 100, size=(1, 64))
    mask = np.ones((1, 64), np.int32)
    s, e = answer_span(model, ids, mask)
    print(f"answer span: tokens [{s}, {e}]")
    return 0


if __name__ == "__main__":
    sys.exit(main())
