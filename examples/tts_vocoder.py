"""Text-to-speech vocoder (piper analog, rten-examples/src/piper.rs):
run a mel spectrogram through a HiFiGAN-class ConvTranspose upsampling
stack to synthesize a waveform, then write a 16-bit WAV.

Usage: python examples/tts_vocoder.py vocoder.onnx mel.npy out.wav
       python examples/tts_vocoder.py --demo
"""

from __future__ import annotations

import os
import struct
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rten_tpu.model import Model


def synthesize(model: Model, mel: np.ndarray) -> np.ndarray:
    """mel [n_mels, T] (or [B, n_mels, T]) -> waveform [samples] float32."""
    if mel.ndim == 2:
        mel = mel[None]
    wav = np.asarray(model.run({"mel": mel.astype(np.float32)})[0])
    return wav[0, 0]


def write_wav(path: str, wav: np.ndarray, sample_rate: int = 22050):
    """Minimal 16-bit PCM WAV writer (no deps; rten's demos use hound)."""
    pcm = np.clip(wav, -1.0, 1.0)
    pcm = (pcm * 32767.0).astype("<i2").tobytes()
    with open(path, "wb") as f:
        f.write(b"RIFF")
        f.write(struct.pack("<I", 36 + len(pcm)))
        f.write(b"WAVEfmt ")
        f.write(struct.pack("<IHHIIHH", 16, 1, 1, sample_rate,
                            sample_rate * 2, 2, 16))
        f.write(b"data")
        f.write(struct.pack("<I", len(pcm)))
        f.write(pcm)


def main():
    if len(sys.argv) >= 2 and sys.argv[1] != "--demo":
        model_path, mel_path = sys.argv[1], sys.argv[2]
        out = sys.argv[3] if len(sys.argv) > 3 else "out.wav"
        mel = np.load(mel_path)
    else:
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
        from example_models import export_vocoder_model

        model_path = "/tmp/vocoder.onnx"
        export_vocoder_model(model_path)
        t = np.linspace(0, 8 * np.pi, 64, dtype=np.float32)
        mel = np.sin(t)[None, :] * np.ones((20, 1), np.float32)
        out = "/tmp/tts_out.wav"
    model = Model.load_file(model_path)
    wav = synthesize(model, mel)
    write_wav(out, wav)
    print(f"wrote {out}: {wav.shape[0]} samples, "
          f"peak {np.abs(wav).max():.3f}")


if __name__ == "__main__":
    main()
