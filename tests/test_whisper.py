"""Whisper IR model vs HF transformers (tiny random config)."""

import numpy as np
import pytest
import torch

from util import assert_close

from rten_tpu.models import whisper


@pytest.fixture(scope="module")
def tiny():
    from transformers import WhisperConfig as HFConfig
    from transformers import WhisperForConditionalGeneration

    cfg = whisper.WhisperConfig(
        vocab_size=100, n_mels=16, d_model=32, encoder_layers=2,
        decoder_layers=2, heads=4, max_source_positions=50,
        max_target_positions=40,
    )
    torch.manual_seed(0)
    hf = WhisperForConditionalGeneration(
        HFConfig(
            vocab_size=cfg.vocab_size,
            num_mel_bins=cfg.n_mels,
            d_model=cfg.d_model,
            encoder_layers=cfg.encoder_layers,
            decoder_layers=cfg.decoder_layers,
            encoder_attention_heads=cfg.heads,
            decoder_attention_heads=cfg.heads,
            encoder_ffn_dim=64,
            decoder_ffn_dim=64,
            max_source_positions=cfg.max_source_positions,
            max_target_positions=cfg.max_target_positions,
            pad_token_id=0,
            bos_token_id=1,
            eos_token_id=2,
            decoder_start_token_id=1,
            suppress_tokens=[],
            begin_suppress_tokens=[],
        )
    ).eval()
    weights = whisper.weights_from_torch(hf)
    model = whisper.WhisperModel(cfg, weights)
    return cfg, hf, model


def test_encoder_matches(tiny):
    cfg, hf, model = tiny
    # Frame count must be 2*max_source_positions (conv2 stride 2).
    mel = torch.randn(1, cfg.n_mels, cfg.max_source_positions * 2)
    with torch.no_grad():
        want = hf.model.encoder(mel).last_hidden_state.numpy()
    _, enc = model.encode(mel.numpy())
    assert_close(np.asarray(enc), want, rtol=1e-3, atol=1e-4)


def test_decoder_prefill_matches(tiny):
    cfg, hf, model = tiny
    mel = torch.randn(1, cfg.n_mels, cfg.max_source_positions * 2)
    dec_ids = torch.tensor([[7, 3, 11, 19]])
    with torch.no_grad():
        want = hf(input_features=mel, decoder_input_ids=dec_ids).logits.numpy()
    cross, _ = model.encode(mel.numpy())
    feed = {
        "input_ids": dec_ids.numpy().astype(np.int32),
        "attention_mask": np.ones((1, 4), np.int32),
        "position_ids": np.arange(4, dtype=np.int32)[None],
        **cross,
    }
    for i in range(cfg.decoder_layers):
        feed[f"past_key_values.{i}.decoder.key"] = np.zeros(
            (1, cfg.heads, 0, cfg.head_dim), np.float32
        )
        feed[f"past_key_values.{i}.decoder.value"] = np.zeros(
            (1, cfg.heads, 0, cfg.head_dim), np.float32
        )
    got = np.asarray(model.decoder.run(feed, ["logits"])[0])
    assert_close(got, want, rtol=1e-3, atol=1e-4)


def test_whisper_greedy_generate_matches(tiny):
    cfg, hf, model = tiny
    mel = torch.randn(1, cfg.n_mels, cfg.max_source_positions * 2)
    prompt = [5, 9]
    n_new = 8
    with torch.no_grad():
        want = hf.generate(
            input_features=mel,
            decoder_input_ids=torch.tensor([prompt]),
            max_new_tokens=n_new,
            do_sample=False,
        )[0, len(prompt):].numpy()
    gen = model.generator(mel.numpy(), [prompt])
    got = gen.generate(len(want))[0]
    np.testing.assert_array_equal(got, want.astype(np.int32))


def test_mel_frontend_graph_matches_numpy():
    """In-graph STFT mel front-end == host log_mel_spectrogram."""
    from rten_tpu.model import Model, ModelOptions
    from rten_tpu.models.whisper import build_mel_frontend, log_mel_spectrogram

    rng = np.random.default_rng(0)
    n = 16000  # 1s window
    audio = (rng.standard_normal(n) * 0.1).astype(np.float32)
    g = build_mel_frontend(n)
    m = Model(g, ModelOptions(optimize=True))
    got = np.asarray(m.run({"audio": audio[None]})[0])[0]
    want = log_mel_spectrogram(audio)
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)
