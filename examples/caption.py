"""Image captioning with a vision encoder + text decoder.

Reference counterpart: rten-examples/src/distilvit.rs — a ViT image
encoder produces patch hidden states; a merged text decoder (Optimum
conventions: use_cache_branch, frozen past_key_values.N.encoder.* cross
caches) generates the caption through the generic Generator — the same
encoder-decoder stack as OCR, fed patch embeddings instead of text.

Usage: python examples/caption.py encoder.onnx decoder.onnx image.png  (or --demo)
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rten_tpu.generate import Generator, GeneratorConfig
from rten_tpu.model import Model


def caption(encoder: Model, decoder: Model, image_chw: np.ndarray,
            max_tokens: int = 24, bos_id: int = 1, eos_id: int = 2):
    """Generate caption token ids for one [C, H, W] image."""
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
    return [int(t) for t in gen.generate(max_tokens)[0]]


def main():
    args = sys.argv[1:]
    if args and args[0] != "--demo":
        enc_path, dec_path, img_path = args[0], args[1], args[2]
        from rten_tpu.imageio import read_image

        img = read_image(img_path)
    else:
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
        from example_models import export_caption_models

        enc_path, dec_path = "/tmp/cap_enc.onnx", "/tmp/cap_dec.onnx"
        export_caption_models(enc_path, dec_path)
        img = np.random.default_rng(0).random((3, 32, 32)).astype(np.float32)

    encoder = Model.load_file(enc_path)
    decoder = Model.load_file(dec_path)
    ids = caption(encoder, decoder, img)
    print("caption token ids:", ids)


if __name__ == "__main__":
    main()
