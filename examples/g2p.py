"""Grapheme-to-phoneme with a byte-level encoder-decoder (ByT5 analog,
rten-examples/src/byt5_g2p.rs): text is tokenized as raw UTF-8 bytes
(token = byte + 3, ByT5's convention), run through the encoder, and a
merged decoder generates phoneme bytes through the generic Generator.
The output phoneme string feeds TTS frontends (see tts_vocoder.py).

Usage: python examples/g2p.py encoder.onnx decoder.onnx "some text"
       python examples/g2p.py --demo
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rten_tpu.generate import Generator, GeneratorConfig
from rten_tpu.model import Model

PAD, EOS, UNK = 0, 1, 2
BYTE_OFFSET = 3  # ByT5: ids 0-2 are specials, byte b -> id b+3


def byte_tokenize(text: str) -> list[int]:
    return [b + BYTE_OFFSET for b in text.encode("utf-8")] + [EOS]


def byte_detokenize(ids) -> str:
    data = bytes(i - BYTE_OFFSET for i in ids
                 if BYTE_OFFSET <= i < BYTE_OFFSET + 256)
    return data.decode("utf-8", errors="replace")


def to_phonemes(encoder: Model, decoder: Model, text: str,
                max_tokens: int = 48) -> str:
    ids = np.asarray([byte_tokenize(text)], np.int64)
    mask = np.ones_like(ids)
    enc_out = np.asarray(
        encoder.run({"input_ids": ids, "attention_mask": mask})[0]
    )
    gen = Generator(
        decoder, [PAD],  # T5-family decoders start from the pad token
        GeneratorConfig(
            max_seq_len=64,
            eos_ids=[EOS],
            constant_inputs={"encoder_hidden_states": enc_out},
        ),
    )
    out = [int(t) for t in gen.generate(max_tokens)[0]]
    return byte_detokenize(out)


def main():
    if len(sys.argv) >= 4 and sys.argv[1] != "--demo":
        enc_path, dec_path, text = sys.argv[1:4]
    else:
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
        from example_models import export_g2p_models

        enc_path, dec_path = "/tmp/g2p_enc.onnx", "/tmp/g2p_dec.onnx"
        export_g2p_models(enc_path, dec_path)
        text = "hello"
    encoder = Model.load_file(enc_path)
    decoder = Model.load_file(dec_path)
    phonemes = to_phonemes(encoder, decoder, text)
    print(f"{text!r} -> {phonemes!r}")


if __name__ == "__main__":
    main()
