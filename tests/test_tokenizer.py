"""Tokenizer vs the HF `tokenizers` library as golden.

Mirrors the reference's strategy of validating rten-text against HF
tokenizer.json behavior; with no network, goldens are locally-trained
tokenizers exercising the same pipeline components GPT-2/BERT use.
"""

import json

import pytest
from tokenizers import Tokenizer as HFTokenizer
from tokenizers import models, normalizers, pre_tokenizers, processors, decoders, trainers

from rten_tpu.text import Tokenizer

CORPUS = [
    "The quick brown fox jumps over the lazy dog.",
    "Pack my box with five dozen liquor jugs!",
    "TPUs multiply matrices efficiently, don't they?",
    "Hello world; hello tokens 123 456.",
    "  weird   spacing\tand\nnewlines",
    "naïve café résumé — unicode façade",
    "数字と漢字のテスト 1234",
]

SAMPLES = [
    "Hello world!",
    "The quick brown fox, again — don't stop.",
    "  leading space and 987 numbers",
    "unicode: café naïve 漢字",
    "",
    "a",
]


@pytest.fixture(scope="module")
def gpt2_style(tmp_path_factory):
    """Byte-level BPE with GPT-2's pipeline."""
    tok = HFTokenizer(models.BPE())
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=400, special_tokens=["<|endoftext|>"],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
    )
    tok.train_from_iterator(CORPUS * 4, trainer)
    path = str(tmp_path_factory.mktemp("tok") / "gpt2_style.json")
    tok.save(path)
    return tok, path


@pytest.fixture(scope="module")
def bert_style(tmp_path_factory):
    tok = HFTokenizer(models.WordPiece(unk_token="[UNK]"))
    tok.normalizer = normalizers.BertNormalizer()
    tok.pre_tokenizer = pre_tokenizers.BertPreTokenizer()
    tok.decoder = decoders.WordPiece()
    trainer = trainers.WordPieceTrainer(
        vocab_size=400, special_tokens=["[UNK]", "[CLS]", "[SEP]"]
    )
    tok.train_from_iterator(CORPUS * 4, trainer)
    tok.post_processor = processors.TemplateProcessing(
        single="[CLS] $A [SEP]",
        pair="[CLS] $A [SEP] $B [SEP]",
        special_tokens=[("[CLS]", tok.token_to_id("[CLS]")), ("[SEP]", tok.token_to_id("[SEP]"))],
    )
    path = str(tmp_path_factory.mktemp("tok") / "bert_style.json")
    tok.save(path)
    return tok, path


def test_bpe_byte_level_matches_hf(gpt2_style):
    hf, path = gpt2_style
    ours = Tokenizer.from_file(path)
    for s in SAMPLES:
        want = hf.encode(s).ids
        got = ours.encode(s).ids
        assert got == want, f"{s!r}: {got} != {want}"
        assert ours.decode(got) == hf.decode(want)


def test_wordpiece_matches_hf(bert_style):
    hf, path = bert_style
    ours = Tokenizer.from_file(path)
    for s in SAMPLES:
        want = hf.encode(s).ids
        got = ours.encode(s).ids
        assert got == want, f"{s!r}: {got} != {want}"
        assert ours.decode(got) == hf.decode(want)


def test_special_token_splitting(gpt2_style):
    hf, path = gpt2_style
    ours = Tokenizer.from_file(path)
    s = "Hello<|endoftext|>world"
    assert ours.encode(s).ids == hf.encode(s).ids
    eot = ours.token_to_id("<|endoftext|>")
    assert eot == hf.token_to_id("<|endoftext|>")
    # decode skips specials by default
    assert "<|endoftext|>" not in ours.decode(ours.encode(s).ids)


def test_fuzz_bpe_token_exact(gpt2_style):
    """Random unicode soup: byte-level BPE must match HF token-for-token."""
    import random

    hf, path = gpt2_style
    ours = Tokenizer.from_file(path)
    rng = random.Random(0)
    pools = [
        "abcdefghijklmnopqrstuvwxyz", "ABCDEFGHIJKLMNOPQRSTUVWXYZ",
        "0123456789", " \t\n", ".,;:!?'\"-—", "αβγδε", "漢字かなカナ",
        "émüñç", "🙂🚀", "​﻿",
    ]
    for trial in range(200):
        n = rng.randint(0, 40)
        s = "".join(rng.choice(rng.choice(pools)) for _ in range(n))
        want = hf.encode(s).ids
        got = ours.encode(s).ids
        assert got == want, (trial, repr(s), got, want)
        assert ours.decode(got) == hf.decode(want), (trial, repr(s))


def test_fuzz_wordpiece_token_exact(bert_style):
    import random

    hf, path = bert_style
    ours = Tokenizer.from_file(path)
    rng = random.Random(1)
    pools = [
        "abcdefghijklmnopqrstuvwxyz", "ABCDEFG", "0123456789", " ",
        ".,!?", "éüñ", "漢字",
    ]
    for trial in range(200):
        n = rng.randint(0, 30)
        s = "".join(rng.choice(rng.choice(pools)) for _ in range(n))
        want = hf.encode(s).ids
        got = ours.encode(s).ids
        assert got == want, (trial, repr(s), got, want)
