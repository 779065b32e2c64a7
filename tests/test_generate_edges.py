"""Generator/engine edge cases: bucket boundaries, capacity limits,
filter composition."""

import numpy as np
import pytest

from rten_tpu.generate import (
    Chain,
    Generator,
    GeneratorConfig,
    MultinomialSampler,
    Temperature,
    TopK,
    TopP,
)
from rten_tpu.generate.filter import RepetitionPenalty
from rten_tpu.generate.generator import GeneratorError
from rten_tpu.models import gpt2


@pytest.fixture(scope="module")
def model():
    cfg = gpt2.GPT2Config(vocab_size=64, n_positions=64, n_embd=32, n_layer=1, n_head=4)
    return cfg, gpt2.load(cfg, gpt2.random_weights(cfg, seed=2))


def test_prompt_exactly_at_bucket(model):
    cfg, m = model
    prompt = list(range(8))  # == bucket size
    g = Generator(m, [prompt], GeneratorConfig(bucket_size=8, max_seq_len=32))
    out = g.generate(4)
    assert out.shape == (1, 4)


def test_max_seq_len_enforced(model):
    cfg, m = model
    g = Generator(m, [[1, 2, 3]], GeneratorConfig(bucket_size=8, max_seq_len=10))
    with pytest.raises(GeneratorError):
        g.generate(20)


def test_eos_stops_iteration(model):
    cfg, m = model
    ref = Generator(m, [[5, 6, 7]], GeneratorConfig(bucket_size=8)).generate(8)[0]
    eos = int(ref[1])
    g = Generator(
        m, [[5, 6, 7]], GeneratorConfig(bucket_size=8, eos_ids=[eos])
    )
    toks = [t for t in g]
    assert toks == ref[: list(ref).index(eos) + 1].tolist()


def test_filters_compose():
    logits = np.asarray([[1.0, 5.0, 3.0, 4.9, 0.5]])
    out = TopK(2).apply(logits.copy(), None)
    assert np.isfinite(out[0, [1, 3]]).all()
    assert np.isinf(out[0, [0, 2, 4]]).all()
    out = TopP(0.5).apply(logits.copy(), None)
    assert np.isfinite(out[0, 1])  # top token always kept
    out = Chain(Temperature(2.0), TopK(3)).apply(logits.copy(), None)
    assert np.isfinite(out).sum() == 3
    prev = np.asarray([[1, 3]])
    out = RepetitionPenalty(2.0).apply(logits.copy(), prev)
    assert out[0, 1] == 2.5 and out[0, 3] == 2.45
    assert out[0, 2] == 3.0


def test_sampled_generation_reproducible(model):
    cfg, m = model
    conf = lambda: GeneratorConfig(
        bucket_size=8,
        sampler=MultinomialSampler(seed=42),
        logits_filters=[Temperature(0.9), TopK(10)],
    )
    a = Generator(m, [[3, 4]], conf()).generate(6)[0]
    b = Generator(m, [[3, 4]], conf()).generate(6)[0]
    np.testing.assert_array_equal(a, b)


def test_session_save_resume(model, tmp_path):
    cfg, m = model
    prompt = [3, 9, 12, 30]
    full = Generator(m, [prompt], GeneratorConfig(bucket_size=8)).generate(10)[0]

    g = Generator(m, [prompt], GeneratorConfig(bucket_size=8))
    first = g.generate(4)[0]
    p = str(tmp_path / "session.safetensors")
    g.save_session(p)

    g2 = Generator(m, [prompt], GeneratorConfig(bucket_size=8))
    g2.restore_session(p)
    rest = g2.generate(6)[0]
    np.testing.assert_array_equal(np.concatenate([first, rest]), full)
