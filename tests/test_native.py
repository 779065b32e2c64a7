"""Native C++ tokenizer core vs the pure-Python implementation."""

import numpy as np
import pytest

from rten_tpu import native


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("g++ unavailable; native lib not built")
    return lib


def test_native_bpe_matches_python(lib):
    from rten_tpu.text.tokenizer import BpeModel

    vocab = {"h": 0, "e": 1, "l": 2, "o": 3, "he": 4, "ll": 5, "hell": 6,
             "hello": 7, "lo": 8}
    merges = [("h", "e"), ("l", "l"), ("he", "ll"), ("hell", "o"), ("l", "o")]
    py = BpeModel(vocab, merges)
    nat = native.NativeBpe(vocab, merges)
    for word in ("hello", "hell", "helo", "olleh", "he", "xyz", ""):
        want = [tid for tid, _ in py.encode_piece(word)]
        got = nat.encode_piece(word)
        assert got == want, word


def test_native_wordpiece_matches_python(lib):
    from rten_tpu.text.tokenizer import WordPieceModel

    vocab = {"[UNK]": 0, "play": 1, "##ing": 2, "##ed": 3, "walk": 4, "##s": 5}
    py = WordPieceModel(vocab, "[UNK]", "##", 100)
    nat = native.NativeWordPiece(vocab, "##", 0, 100)
    for word in ("playing", "played", "walks", "walk", "jump", "playinged"):
        want = [tid for tid, _ in py.encode_piece(word)]
        got = nat.encode_piece(word)
        assert got == want, word


def test_tokenizer_uses_native_and_matches(lib):
    """Full pipeline with the native core enabled == HF golden."""
    from tokenizers import Tokenizer as HFTokenizer
    from tokenizers import decoders, models, pre_tokenizers, trainers

    from rten_tpu.text import Tokenizer

    tok = HFTokenizer(models.BPE())
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=300, initial_alphabet=pre_tokenizers.ByteLevel.alphabet()
    )
    tok.train_from_iterator(["the quick brown fox jumps over the lazy dog"] * 5, trainer)
    import json

    ours = Tokenizer.from_json(tok.to_str())
    assert ours._native is not None, "native core should be active"
    for s in ("the quick fox", "hello unseen words", "dog dog dog"):
        assert ours.encode(s).ids == tok.encode(s).ids
