"""Speech recognition with CTC decoding (wav2vec2 analog,
rten-examples/src/wav2vec2.rs): acoustic model emits per-frame log-probs,
rten_tpu.ctc decodes greedy or beam.

Usage: python examples/asr_ctc.py model.onnx audio.npy  (or --demo)
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rten_tpu.ctc import ctc_beam_search_decode, ctc_greedy_decode
from rten_tpu.model import Model

ALPHABET = "_abcdefghijklmnopqrstuvwxyz '.,"  # index 0 = blank


def transcribe(model: Model, audio: np.ndarray, beam: int = 0):
    log_probs = np.asarray(model.run({model.input_names()[0]: audio[None]})[0])[0]
    if beam:
        ids = ctc_beam_search_decode(log_probs, beam_width=beam)[0].labels
    else:
        ids = ctc_greedy_decode(log_probs).labels
    return "".join(ALPHABET[i] for i in ids if i < len(ALPHABET)), ids


def main():
    args = sys.argv[1:]
    if args and args[0] != "--demo":
        path = args[0]
        audio = np.load(args[1]).astype(np.float32)
    else:
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
        from example_models import export_ctc_model

        path = "/tmp/ctc_model.onnx"
        export_ctc_model(path)
        audio = np.random.default_rng(0).standard_normal(4000).astype(np.float32)

    model = Model.load_file(path)
    text, ids = transcribe(model, audio)
    print(f"transcript ({len(ids)} tokens): {text!r}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
