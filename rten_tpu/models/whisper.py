"""Whisper encoder-decoder built in engine IR.

Mirrors the reference's whisper example flow (rten-examples/src/whisper.rs
driven by rten-generate with cross-attention caches): three graphs —

* encoder: mel [B, n_mels, T] -> conv stack -> transformer -> hidden states
* cross_kv: encoder states -> per-layer cross-attention K/V (computed ONCE
  per audio segment, the analog of rten generator.rs:891-915)
* decoder: tokens + self-attention KV cache (growing, Generator-managed) +
  frozen cross KV inputs -> logits + present.N.{key,value}

Weights map 1:1 from HF `WhisperForConditionalGeneration.state_dict()`.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import numpy as np

from ..dtypes import DataType
from ..ir.builder import GraphBuilder
from ..ir.graph import Graph
from ..model import Model, ModelOptions


@dataclasses.dataclass
class WhisperConfig:
    vocab_size: int = 51865
    n_mels: int = 80
    d_model: int = 384
    encoder_layers: int = 4
    decoder_layers: int = 4
    heads: int = 6
    max_source_positions: int = 1500
    max_target_positions: int = 448

    @property
    def head_dim(self):
        return self.d_model // self.heads


def _sinusoids(length: int, channels: int) -> np.ndarray:
    """Whisper's fixed sinusoidal encoder positions."""
    log_timescale = np.log(10000) / (channels // 2 - 1)
    inv = np.exp(-log_timescale * np.arange(channels // 2))
    scaled = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(scaled), np.cos(scaled)], axis=1).astype(np.float32)


def log_mel_spectrogram(
    audio: np.ndarray,
    n_mels: int = 80,
    n_fft: int = 400,
    hop: int = 160,
    sample_rate: int = 16000,
) -> np.ndarray:
    """Whisper's mel front-end (reference: rten whisper example feeds
    precomputed features; here the STFT+mel filterbank is built in,
    mirroring openai/whisper's audio.py math). audio [T] -> [n_mels, frames].
    """
    audio = np.asarray(audio, np.float32)
    window = np.hanning(n_fft + 1)[:-1].astype(np.float32)
    pad = n_fft // 2
    padded = np.pad(audio, pad, mode="reflect")
    n_frames = 1 + (len(padded) - n_fft) // hop
    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    frames = padded[idx] * window
    spec = np.abs(np.fft.rfft(frames, axis=-1)) ** 2  # [frames, bins]
    mel_fb = _mel_filterbank(sample_rate, n_fft, n_mels)
    mel = mel_fb @ spec[:-1].T  # whisper drops the last frame
    log_spec = np.log10(np.maximum(mel, 1e-10))
    log_spec = np.maximum(log_spec, log_spec.max() - 8.0)
    return ((log_spec + 4.0) / 4.0).astype(np.float32)


def _mel_filterbank(sr: int, n_fft: int, n_mels: int) -> np.ndarray:
    """Slaney-style mel filterbank (librosa-compatible)."""
    fmax = sr / 2
    n_bins = n_fft // 2 + 1
    freqs = np.linspace(0, fmax, n_bins)

    def hz_to_mel(f):
        f = np.asarray(f, np.float64)
        mel = f / 66.6666666
        log_region = f >= 1000.0
        mel = np.where(
            log_region, 15.0 + np.log(np.maximum(f, 1e-9) / 1000.0) / np.log(6.4) * 27.0, mel
        )
        return mel

    def mel_to_hz(m):
        m = np.asarray(m, np.float64)
        hz = m * 66.6666666
        log_region = m >= 15.0
        return np.where(log_region, 1000.0 * np.exp(np.log(6.4) * (m - 15.0) / 27.0), hz)

    mels = np.linspace(hz_to_mel(0.0), hz_to_mel(fmax), n_mels + 2)
    pts = mel_to_hz(mels)
    fb = np.zeros((n_mels, n_bins))
    for i in range(n_mels):
        lo, center, hi = pts[i], pts[i + 1], pts[i + 2]
        up = (freqs - lo) / max(center - lo, 1e-9)
        down = (hi - freqs) / max(hi - center, 1e-9)
        fb[i] = np.maximum(0, np.minimum(up, down))
        # Slaney normalization.
        fb[i] *= 2.0 / (hi - lo)
    return fb.astype(np.float32)


def build_mel_frontend(
    n_samples: int,
    n_mels: int = 80,
    n_fft: int = 400,
    hop: int = 160,
    sample_rate: int = 16000,
) -> Graph:
    """The mel spectrogram as an IR GRAPH (STFT op + filterbank matmul), so
    the whole audio front-end runs on-device instead of host numpy
    (round-1 gap: 'encoder uses precomputed mel'). Input audio [B, T],
    output mel [B, n_mels, frames] — numerically matches
    log_mel_spectrogram (the rten STFT-op whisper path, src/ops/fft.rs:137).
    """
    b = GraphBuilder()
    audio = b.input("audio", DataType.Float, ("batch", n_samples))
    pad = n_fft // 2
    pads = b.constant(None, np.int32([0, pad, 0, pad]))
    padded = b.op("Pad", [audio, pads], {"mode": "reflect"})
    window = b.constant("hann", np.hanning(n_fft + 1)[:-1].astype(np.float32))
    step = b.constant(None, np.int32(hop))
    spec_ri = b.op("STFT", [padded, step, window], {"onesided": 1})
    # power spectrum |z|^2 = re^2 + im^2
    two = b.constant(None, np.int32(2))
    re = b.op("Gather", [spec_ri, b.constant(None, np.int32(0))], {"axis": -1})
    im = b.op("Gather", [spec_ri, b.constant(None, np.int32(1))], {"axis": -1})
    power = b.op("Add", [b.op("Mul", [re, re]), b.op("Mul", [im, im])])
    # drop the last frame (whisper convention), [B, F-1, bins]
    n_frames = 1 + (n_samples + 2 * pad - n_fft) // hop
    starts = b.constant(None, np.int32([0]))
    ends = b.constant(None, np.int32([n_frames - 1]))
    axes = b.constant(None, np.int32([1]))
    power = b.op("Slice", [power, starts, ends, axes])
    fb = b.constant(
        "mel_fb", np.ascontiguousarray(_mel_filterbank(sample_rate, n_fft, n_mels).T)
    )  # [bins, n_mels]
    mel = b.op("MatMul", [power, fb])  # [B, F-1, n_mels]
    mel = b.op("Transpose", [mel], {"perm": [0, 2, 1]})  # [B, n_mels, F-1]
    floor = b.constant(None, np.float32(1e-10))
    ln10 = b.constant(None, np.float32(1.0 / np.log(10.0)))
    log_spec = b.op("Mul", [b.op("Log", [b.op("Max", [mel, floor])]), ln10])
    # clamp to (global max - 8)
    gmax = b.op("ReduceMax", [log_spec], {"axes": [1, 2], "keepdims": 1})
    eight = b.constant(None, np.float32(8.0))
    log_spec = b.op("Max", [log_spec, b.op("Sub", [gmax, eight])])
    four = b.constant(None, np.float32(4.0))
    out = b.op(
        "Div", [b.op("Add", [log_spec, four]), four], output_names=["mel"]
    )
    b.output(out)
    return b.finish()


def build_encoder(cfg: WhisperConfig, w: Dict[str, np.ndarray]) -> Graph:
    b = GraphBuilder()
    H, D = cfg.heads, cfg.head_dim

    def c(name):
        return b.constant(name, np.ascontiguousarray(w[name], np.float32))

    mel = b.input("mel", DataType.Float, ("batch", cfg.n_mels, "frames"))
    x = b.op(
        "Conv", [mel, c("model.encoder.conv1.weight"), c("model.encoder.conv1.bias")],
        {"pads": [1, 1], "strides": [1]},
    )
    x = b.op("Gelu", [x])
    x = b.op(
        "Conv", [x, c("model.encoder.conv2.weight"), c("model.encoder.conv2.bias")],
        {"pads": [1, 1], "strides": [2]},
    )
    x = b.op("Gelu", [x])
    x = b.op("Transpose", [x], {"perm": [0, 2, 1]})  # [B, T, D]
    pos = b.constant(
        "encoder_positions", _sinusoids(cfg.max_source_positions, cfg.d_model)
    )
    # Slice positions to the actual frame count via Shape->Slice.
    shp = b.op("Shape", [x])
    t_len = b.op("Gather", [shp, b.constant(None, np.int32(1))])
    zero = b.constant(None, np.int32([0]))
    t_vec = b.op("Reshape", [t_len, b.constant(None, np.int32([1]))])
    pos_sliced = b.op("Slice", [pos, zero, t_vec, b.constant(None, np.int32([0]))])
    x = x + pos_sliced

    def ln(h, prefix):
        return b.op(
            "LayerNormalization", [h, c(f"{prefix}.weight"), c(f"{prefix}.bias")]
        )

    def linear(h, prefix, bias=True):
        wt = b.constant(
            f"{prefix}.weight_t", np.ascontiguousarray(w[f"{prefix}.weight"].T, np.float32)
        )
        if bias and f"{prefix}.bias" in w:
            return b.op("MatMulAdd", [h, wt, c(f"{prefix}.bias")], name=prefix)
        return b.op("MatMul", [h, wt], name=prefix)

    def heads_of(h):
        r = b.op("Reshape", [h, b.constant(None, np.int32([0, 0, H, D]))])
        return b.op("Transpose", [r], {"perm": [0, 2, 1, 3]})

    def merge(h):
        r = b.op("Transpose", [h], {"perm": [0, 2, 1, 3]})
        return b.op("Reshape", [r, b.constant(None, np.int32([0, 0, cfg.d_model]))])

    scale = b.constant(None, np.float32(cfg.head_dim ** -0.25))
    for i in range(cfg.encoder_layers):
        p = f"model.encoder.layers.{i}"
        h = ln(x, f"{p}.self_attn_layer_norm")
        q = heads_of(linear(h, f"{p}.self_attn.q_proj"))
        k = heads_of(linear(h, f"{p}.self_attn.k_proj", bias=False))
        v = heads_of(linear(h, f"{p}.self_attn.v_proj"))
        a = b.op("Attention", [q, k, v], {})
        x = x + linear(merge(a), f"{p}.self_attn.out_proj")
        h2 = ln(x, f"{p}.final_layer_norm")
        fc = b.op("Gelu", [linear(h2, f"{p}.fc1")])
        x = x + linear(fc, f"{p}.fc2")
    x = ln(x, "model.encoder.layer_norm")
    b.graph.nodes[x.node_id].name = "encoder_hidden_states"
    b.graph._name_to_id["encoder_hidden_states"] = x.node_id
    b.output(x)
    return b.finish()


def build_cross_kv(cfg: WhisperConfig, w: Dict[str, np.ndarray]) -> Graph:
    """encoder_hidden_states -> cross K/V per decoder layer (computed once)."""
    b = GraphBuilder()
    H, D = cfg.heads, cfg.head_dim
    enc = b.input("encoder_hidden_states", DataType.Float, ("batch", "frames", cfg.d_model))

    outs = []
    for i in range(cfg.decoder_layers):
        p = f"model.decoder.layers.{i}.encoder_attn"
        kt = b.constant(
            f"{p}.k_proj.weight_t", np.ascontiguousarray(w[f"{p}.k_proj.weight"].T, np.float32)
        )
        vt = b.constant(
            f"{p}.v_proj.weight_t", np.ascontiguousarray(w[f"{p}.v_proj.weight"].T, np.float32)
        )
        vb = b.constant(f"{p}.v_proj.bias", np.ascontiguousarray(w[f"{p}.v_proj.bias"], np.float32))
        k = b.op("MatMul", [enc, kt])
        v = b.op("MatMulAdd", [enc, vt, vb])
        for val, name in ((k, f"cross.{i}.key"), (v, f"cross.{i}.value")):
            r = b.op("Reshape", [val, b.constant(None, np.int32([0, 0, H, D]))])
            t = b.op("Transpose", [r], {"perm": [0, 2, 1, 3]}, output_names=[name])
            outs.append(t)
    b.output(*outs)
    return b.finish()


def build_decoder(cfg: WhisperConfig, w: Dict[str, np.ndarray]) -> Graph:
    b = GraphBuilder()
    H, D = cfg.heads, cfg.head_dim

    def c(name):
        return b.constant(name, np.ascontiguousarray(w[name], np.float32))

    ids = b.input("input_ids", DataType.Int32, ("batch", "seq"))
    attn_mask = b.input("attention_mask", DataType.Int32, ("batch", "total_seq"))
    pos = b.input("position_ids", DataType.Int32, ("batch", "seq"))

    x = b.op("Gather", [c("model.decoder.embed_tokens.weight"), ids])
    x = x + b.op("Gather", [c("model.decoder.embed_positions.weight"), pos])

    mask_f = b.op("Cast", [attn_mask], {"to": DataType.Float})
    one = b.constant(None, np.float32(1.0))
    neg = b.constant(None, np.float32(-1e30))
    add_mask = b.op("Mul", [b.op("Sub", [one, mask_f]), neg])
    add_mask = b.op("Unsqueeze", [add_mask, b.constant(None, np.int32([1, 2]))])

    def ln(h, prefix):
        return b.op(
            "LayerNormalization", [h, c(f"{prefix}.weight"), c(f"{prefix}.bias")]
        )

    def linear(h, prefix, bias=True):
        wt = b.constant(
            f"{prefix}.weight_t", np.ascontiguousarray(w[f"{prefix}.weight"].T, np.float32)
        )
        if bias and f"{prefix}.bias" in w:
            return b.op("MatMulAdd", [h, wt, c(f"{prefix}.bias")], name=prefix)
        return b.op("MatMul", [h, wt], name=prefix)

    def heads_of(h):
        r = b.op("Reshape", [h, b.constant(None, np.int32([0, 0, H, D]))])
        return b.op("Transpose", [r], {"perm": [0, 2, 1, 3]})

    def merge(h):
        r = b.op("Transpose", [h], {"perm": [0, 2, 1, 3]})
        return b.op("Reshape", [r, b.constant(None, np.int32([0, 0, cfg.d_model]))])

    presents = []
    for i in range(cfg.decoder_layers):
        p = f"model.decoder.layers.{i}"
        past_k = b.input(
            f"past_key_values.{i}.decoder.key", DataType.Float, ("batch", H, "past", D)
        )
        past_v = b.input(
            f"past_key_values.{i}.decoder.value", DataType.Float, ("batch", H, "past", D)
        )
        cross_k = b.input(
            f"cross.{i}.key", DataType.Float, ("batch", H, "frames", D)
        )
        cross_v = b.input(
            f"cross.{i}.value", DataType.Float, ("batch", H, "frames", D)
        )
        h = ln(x, f"{p}.self_attn_layer_norm")
        q = heads_of(linear(h, f"{p}.self_attn.q_proj"))
        k = heads_of(linear(h, f"{p}.self_attn.k_proj", bias=False))
        v = heads_of(linear(h, f"{p}.self_attn.v_proj"))
        a, pk, pv = b.op(
            "Attention",
            [q, k, v, add_mask, past_k, past_v],
            {"is_causal": 1},
            n_outputs=3,
            output_names=[
                f"self_attn_{i}",
                f"present.{i}.decoder.key",
                f"present.{i}.decoder.value",
            ],
        )
        presents.extend([pk, pv])
        x = x + linear(merge(a), f"{p}.self_attn.out_proj")
        # Cross attention over frozen encoder K/V (no mask, not causal).
        h2 = ln(x, f"{p}.encoder_attn_layer_norm")
        q2 = heads_of(linear(h2, f"{p}.encoder_attn.q_proj"))
        a2 = b.op("Attention", [q2, cross_k, cross_v], {})
        x = x + linear(merge(a2), f"{p}.encoder_attn.out_proj")
        h3 = ln(x, f"{p}.final_layer_norm")
        fc = b.op("Gelu", [linear(h3, f"{p}.fc1")])
        x = x + linear(fc, f"{p}.fc2")

    x = ln(x, "model.decoder.layer_norm")
    lm = b.constant(
        "proj_out.weight_t",
        np.ascontiguousarray(w["model.decoder.embed_tokens.weight"].T, np.float32),
    )
    b.output(b.op("MatMul", [x, lm], output_names=["logits"]))
    for pr in presents:
        b.graph.output_ids.append(pr.node_id)
    return b.finish()


def weights_from_torch(module) -> Dict[str, np.ndarray]:
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}


class WhisperModel:
    """Bundled encoder + cross-kv + decoder, Generator-ready."""

    def __init__(self, cfg: WhisperConfig, weights: Dict[str, np.ndarray],
                 options: ModelOptions = None):
        options = options or ModelOptions()
        self.cfg = cfg
        self.encoder = Model(build_encoder(cfg, weights), options)
        self.cross_kv = Model(build_cross_kv(cfg, weights), options)
        self.decoder = Model(build_decoder(cfg, weights), options)

    def encode(self, mel: np.ndarray):
        """mel [B, n_mels, frames] -> dict of per-step constant inputs for
        the decoder (encoder states already folded into cross K/V)."""
        enc = self.encoder.run({"mel": mel})[0]
        kv = self.cross_kv.run({"encoder_hidden_states": enc})
        names = [
            f"cross.{i}.{k}" for i in range(self.cfg.decoder_layers)
            for k in ("key", "value")
        ]
        return dict(zip(names, kv)), enc

    def generator(self, mel: np.ndarray, prompt_ids, config=None):
        from ..generate import Generator, GeneratorConfig

        cross, _ = self.encode(mel)
        config = config or GeneratorConfig(bucket_size=32, max_seq_len=self.cfg.max_target_positions)
        config.constant_inputs = {**config.constant_inputs, **cross}
        return Generator(self.decoder, prompt_ids, config)
