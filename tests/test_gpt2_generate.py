"""GPT-2 IR model + Generator vs HF transformers (CPU torch golden)."""

import numpy as np
import pytest
import torch

from util import assert_close

from rten_tpu.generate import Generator, GeneratorConfig, ArgMaxSampler
from rten_tpu.models import gpt2


@pytest.fixture(scope="module")
def tiny():
    cfg = gpt2.GPT2Config(
        vocab_size=128, n_positions=64, n_embd=32, n_layer=2, n_head=4
    )
    from transformers import GPT2Config as HFConfig, GPT2LMHeadModel

    torch.manual_seed(0)
    hf = GPT2LMHeadModel(
        HFConfig(
            vocab_size=cfg.vocab_size,
            n_positions=cfg.n_positions,
            n_embd=cfg.n_embd,
            n_layer=cfg.n_layer,
            n_head=cfg.n_head,
            activation_function="gelu_new",
        )
    ).eval()
    weights = gpt2.weights_from_torch(hf)
    model = gpt2.load(cfg, weights)
    return cfg, hf, weights, model


def test_prefill_logits_match(tiny):
    cfg, hf, weights, model = tiny
    ids = np.array([[5, 9, 23, 40, 7]], np.int32)
    mask = np.ones_like(ids)
    pos = np.arange(ids.shape[1], dtype=np.int32)[None]
    with torch.no_grad():
        want = hf(
            input_ids=torch.from_numpy(ids.astype(np.int64)),
            attention_mask=torch.from_numpy(mask.astype(np.int64)),
        ).logits.numpy()
    feed = {"input_ids": ids, "attention_mask": mask, "position_ids": pos}
    for i in range(cfg.n_layer):
        feed[f"past_key_values.{i}.key"] = np.zeros(
            (1, cfg.n_head, 0, cfg.head_dim), np.float32
        )
        feed[f"past_key_values.{i}.value"] = np.zeros(
            (1, cfg.n_head, 0, cfg.head_dim), np.float32
        )
    got = np.asarray(model.run(feed, ["logits"])[0])
    assert_close(got, want, rtol=1e-3, atol=1e-4)


def test_decode_step_with_past_matches(tiny):
    cfg, hf, weights, model = tiny
    prompt = torch.tensor([[5, 9, 23, 40]])
    with torch.no_grad():
        out = hf(input_ids=prompt, use_cache=True)
        # Snapshot now: the next forward mutates the Cache object in place.
        pkv_np = [
            (out.past_key_values[i][0].clone().numpy(), out.past_key_values[i][1].clone().numpy())
            for i in range(cfg.n_layer)
        ]
        step = hf(
            input_ids=torch.tensor([[7]]),
            past_key_values=out.past_key_values,
        )
        want = step.logits.numpy()

    feed = {
        "input_ids": np.array([[7]], np.int32),
        "attention_mask": np.ones((1, 5), np.int32),
        "position_ids": np.array([[4]], np.int32),
    }
    for i in range(cfg.n_layer):
        feed[f"past_key_values.{i}.key"] = pkv_np[i][0]
        feed[f"past_key_values.{i}.value"] = pkv_np[i][1]
    got = np.asarray(model.run(feed, ["logits"])[0])
    assert_close(got, want, rtol=1e-3, atol=1e-4)


def test_generator_greedy_matches_hf(tiny):
    cfg, hf, weights, model = tiny
    prompt = [5, 9, 23, 40, 7, 12]
    n_new = 12
    with torch.no_grad():
        want = hf.generate(
            torch.tensor([prompt]),
            max_new_tokens=n_new,
            do_sample=False,
            pad_token_id=0,
        )[0, len(prompt):].numpy()
    gen = Generator(
        model, [prompt], GeneratorConfig(bucket_size=8, max_seq_len=64)
    )
    got = gen.generate(n_new)[0]
    np.testing.assert_array_equal(got, want.astype(np.int32))
    assert gen.metrics.generated_tokens == n_new
    assert gen.metrics.ttft_s() is not None


def test_generator_batch2(tiny):
    cfg, hf, weights, model = tiny
    # Different-length prompts in one batch (left-padded internally).
    p1 = [5, 9, 23, 40, 7, 12]
    p2 = [3, 8, 11, 30, 2, 19]
    gen = Generator(
        model, [p1, p2], GeneratorConfig(bucket_size=8, max_seq_len=64)
    )
    got = gen.generate(6)
    assert got.shape == (2, 6)
    # Each row must match its single-prompt generation.
    for row, p in ((0, p1), (1, p2)):
        solo = Generator(
            model, [p], GeneratorConfig(bucket_size=8, max_seq_len=64)
        ).generate(6)[0]
        np.testing.assert_array_equal(got[row], solo)


def test_int8_quantized_gpt2_close(tiny):
    cfg, hf, weights, model = tiny
    qmodel = gpt2.load(cfg, weights, quantize="int8")
    prompt = [5, 9, 23, 40, 7, 12]
    g1 = Generator(model, [prompt], GeneratorConfig(bucket_size=8)).generate(8)[0]
    g2 = Generator(qmodel, [prompt], GeneratorConfig(bucket_size=8)).generate(8)[0]
    # int8 dynamic quant should track f32 closely on most steps.
    agree = np.mean(g1 == g2)
    assert agree >= 0.5, (g1, g2)
