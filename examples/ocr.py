"""OCR with an encoder-decoder model (TrOCR analog,
rten-examples/src/trocr.rs): a vision encoder produces hidden states, a
merged text decoder (Optimum conventions: use_cache_branch, frozen
past_key_values.N.encoder.* cross caches) generates characters through the
generic Generator.

Usage: python examples/ocr.py encoder.onnx decoder.onnx image.png  (or --demo)
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rten_tpu.generate import Generator, GeneratorConfig
from rten_tpu.model import Model

CHARSET = "\0<>0123456789abcdefghijklmnopqrstuvwxyz "  # 0=pad, 1=bos, 2=eos


def recognize(encoder: Model, decoder: Model, image_chw: np.ndarray,
              max_tokens: int = 32, bos_id: int = 1, eos_id: int = 2):
    enc_out = np.asarray(
        encoder.run({encoder.input_names()[0]: image_chw[None]})[0]
    )
    gen = Generator(
        decoder, [bos_id],
        GeneratorConfig(
            max_seq_len=64,
            eos_ids=[eos_id],
            constant_inputs={"encoder_hidden_states": enc_out},
        ),
    )
    ids = [int(t) for t in gen.generate(max_tokens)[0]]
    text = "".join(
        CHARSET[i] for i in ids if 2 < i < len(CHARSET)
    )
    return text, ids


def main():
    args = sys.argv[1:]
    if args and args[0] != "--demo":
        enc_path, dec_path, img_path = args[0], args[1], args[2]
        from rten_tpu.imageio import read_image

        img = read_image(img_path)
    else:
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
        from example_models import export_ocr_models

        enc_path, dec_path = "/tmp/ocr_enc.onnx", "/tmp/ocr_dec.onnx"
        export_ocr_models(enc_path, dec_path)
        img = np.random.default_rng(0).random((1, 16, 64)).astype(np.float32)

    encoder = Model.load_file(enc_path)
    decoder = Model.load_file(dec_path)
    text, ids = recognize(encoder, decoder, img)
    print(f"recognized: {text!r} ({len(ids)} tokens)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
