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


def test_native_contours_match_python():
    """C++ contour tracer == Python fallback on random masks."""
    import rten_tpu.imageproc as ip
    from rten_tpu.native import get_lib

    if get_lib() is None:
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(0)
    for trial in range(5):
        mask = (rng.random((40, 50)) > 0.6).astype(np.uint8)
        native = ip._native_find_contours(mask)
        assert native is not None
        # Python implementation, forced:
        orig = ip._native_find_contours
        ip._native_find_contours = lambda m: None
        try:
            py = ip.find_contours(mask)
        finally:
            ip._native_find_contours = orig
        assert len(native) == len(py), trial
        for a, b in zip(native, py):
            np.testing.assert_array_equal(a, b)


def test_native_nms_matches_python():
    import rten_tpu.imageproc as ip
    from rten_tpu.native import get_lib

    if get_lib() is None:
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(1)
    for trial in range(5):
        n = 60
        tl = rng.random((n, 2)) * 80
        wh = rng.random((n, 2)) * 30 + 1
        boxes = np.concatenate([tl, tl + wh], 1).astype(np.float32)
        scores = rng.random(n).astype(np.float32)
        native = ip._native_nms(boxes, scores, 0.45, 0.2, 300)
        orig = ip._native_nms
        ip._native_nms = lambda *a: None
        try:
            py = ip.nms_boxes(boxes, scores, 0.45, 0.2, 300)
        finally:
            ip._native_nms = orig
        assert native == py, trial
