"""Text embedding similarity (jina_similarity analog,
rten-examples/src/jina_similarity.rs): embed sentences with a
mean-pooled encoder, rank by cosine similarity.

Usage: python examples/similarity.py model.onnx  (or --demo)
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rten_tpu.model import Model


def embed(model: Model, input_ids: np.ndarray, attention_mask: np.ndarray):
    out = model.run({
        "input_ids": np.asarray(input_ids, np.int32),
        "attention_mask": np.asarray(attention_mask, np.int32),
    })[0]
    return np.asarray(out)


def rank_by_similarity(model: Model, query_ids, candidate_ids):
    """Returns candidate indices sorted by cosine similarity to the query."""
    all_ids = [query_ids] + list(candidate_ids)
    T = max(len(x) for x in all_ids)
    ids = np.zeros((len(all_ids), T), np.int32)
    mask = np.zeros((len(all_ids), T), np.int32)
    for i, x in enumerate(all_ids):
        ids[i, : len(x)] = x
        mask[i, : len(x)] = 1
    emb = embed(model, ids, mask)  # already L2-normalized by the model
    sims = emb[1:] @ emb[0]
    order = np.argsort(-sims)
    return [(int(i), float(sims[i])) for i in order]


def main():
    if len(sys.argv) > 1 and sys.argv[1] != "--demo":
        path = sys.argv[1]
    else:
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
        from example_models import export_embed_model

        path = "/tmp/embed_model.onnx"
        export_embed_model(path)
    model = Model.load_file(path)
    rng = np.random.default_rng(0)
    query = rng.integers(1, 100, 12).tolist()
    cands = [rng.integers(1, 100, rng.integers(5, 16)).tolist() for _ in range(4)]
    cands.append(query)  # the query itself should rank first
    for idx, sim in rank_by_similarity(model, query, cands):
        print(f"candidate {idx}: cosine {sim:.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
