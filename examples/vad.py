"""Voice activity detection (silero analog, rten-examples/src/silero.rs):
stream fixed-size audio chunks through a small conv+LSTM model whose
recurrent (h, c) state is threaded between calls, then merge per-chunk
speech probabilities into speech segments.

Usage: python examples/vad.py vad.onnx audio.npy
       python examples/vad.py --demo
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rten_tpu.model import Model


CHUNK = 512


def stream_probs(model: Model, audio: np.ndarray, hidden: int = 32):
    """Yield one speech probability per CHUNK-sample window, carrying the
    model's recurrent state across calls (the streaming contract silero
    models use)."""
    h = np.zeros((1, 1, hidden), np.float32)
    c = np.zeros((1, 1, hidden), np.float32)
    probs = []
    n = (len(audio) // CHUNK) * CHUNK
    for off in range(0, n, CHUNK):
        chunk = audio[off:off + CHUNK].astype(np.float32)[None]
        prob, h, c = (np.asarray(o) for o in model.run(
            {"audio": chunk, "h": h, "c": c}
        ))
        probs.append(float(prob[0]))
    return probs


def segments(probs, threshold=0.5, sample_rate=16000):
    """Merge per-chunk probabilities into (start_s, end_s) speech spans."""
    spans = []
    start = None
    for i, p in enumerate(probs):
        if p >= threshold and start is None:
            start = i
        elif p < threshold and start is not None:
            spans.append((start * CHUNK / sample_rate,
                          i * CHUNK / sample_rate))
            start = None
    if start is not None:
        spans.append((start * CHUNK / sample_rate,
                      len(probs) * CHUNK / sample_rate))
    return spans


def main():
    if len(sys.argv) >= 3 and sys.argv[1] != "--demo":
        model_path = sys.argv[1]
        audio = np.load(sys.argv[2])
    else:
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
        from example_models import export_vad_model

        model_path = "/tmp/vad.onnx"
        export_vad_model(model_path)
        rng = np.random.default_rng(0)
        audio = rng.standard_normal(CHUNK * 20).astype(np.float32) * 0.1
        audio[CHUNK * 5: CHUNK * 12] += np.sin(
            np.linspace(0, 440 * 2 * np.pi, CHUNK * 7)
        ).astype(np.float32)
    model = Model.load_file(model_path)
    probs = stream_probs(model, audio)
    spans = segments(probs)
    print(f"{len(probs)} chunks; speech segments: "
          + ", ".join(f"{a:.2f}-{b:.2f}s" for a, b in spans))


if __name__ == "__main__":
    main()
