#!/usr/bin/env python
"""Speech-to-text pipeline shape: audio -> log-mel -> Whisper -> tokens.

Demo mode (default): random-weight tiny Whisper over synthetic audio —
exercises the full path (mel frontend, encoder, one-shot cross-KV,
KV-cached decode). With a real checkpoint, load weights via
transformers WhisperForConditionalGeneration and pass --wav.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rten_tpu.utils import honor_jax_platforms_env

honor_jax_platforms_env()

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--wav", help="16kHz mono wav file")
    ap.add_argument("--max-tokens", type=int, default=16)
    args = ap.parse_args()

    from rten_tpu.models import whisper

    cfg = whisper.WhisperConfig(
        vocab_size=120, n_mels=80, d_model=64, encoder_layers=2,
        decoder_layers=2, heads=4, max_source_positions=100,
        max_target_positions=64,
    )
    rng = np.random.default_rng(0)
    # Random weights standing in for a checkpoint (same graph/math).
    import torch

    from transformers import WhisperConfig as HFConfig
    from transformers import WhisperForConditionalGeneration

    torch.manual_seed(0)
    hf = WhisperForConditionalGeneration(HFConfig(
        vocab_size=cfg.vocab_size, num_mel_bins=cfg.n_mels, d_model=cfg.d_model,
        encoder_layers=cfg.encoder_layers, decoder_layers=cfg.decoder_layers,
        encoder_attention_heads=cfg.heads, decoder_attention_heads=cfg.heads,
        encoder_ffn_dim=128, decoder_ffn_dim=128,
        max_source_positions=cfg.max_source_positions,
        max_target_positions=cfg.max_target_positions,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
        decoder_start_token_id=1,
    ))
    model = whisper.WhisperModel(cfg, whisper.weights_from_torch(hf))

    if args.wav:
        import wave

        with wave.open(args.wav) as w:
            audio = np.frombuffer(
                w.readframes(w.getnframes()), np.int16
            ).astype(np.float32) / 32768.0
    else:
        t = np.linspace(0, 2.0, 32000)
        audio = (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)

    # Mel front-end ON DEVICE: the STFT + filterbank run as an engine graph
    # (whisper.build_mel_frontend), not host numpy.
    from rten_tpu.model import Model as _M, ModelOptions as _MO

    mel_graph = whisper.build_mel_frontend(len(audio), n_mels=cfg.n_mels)
    mel_model = _M(mel_graph, _MO(optimize=True))
    mel = np.asarray(mel_model.run({"audio": audio[None]})[0])[0]
    # Fit the encoder context (2x positions after the stride-2 conv).
    frames = cfg.max_source_positions * 2
    if mel.shape[1] < frames:
        mel = np.pad(mel, ((0, 0), (0, frames - mel.shape[1])))
    mel = mel[:, :frames][None]
    print(f"mel: {mel.shape}")

    gen = model.generator(mel, [[1]])  # decoder_start_token
    toks = gen.generate(args.max_tokens)[0]
    print(f"tokens: {toks.tolist()}")
    print(gen.metrics.report())


if __name__ == "__main__":
    main()
