"""CTC decoding: greedy and (n-best) beam search.

Analog of rten src/ctc.rs (:27 CtcDecoder, :153 greedy, :184 beam,
:212 n-best) — post-processing for wav2vec2/TrOCR-style models over a
[sequence, class] probability matrix, with class 0 = blank.
"""

from __future__ import annotations

import dataclasses
import math
from typing import List

import numpy as np


@dataclasses.dataclass
class CtcHypothesis:
    labels: List[int]
    score: float  # log-probability


def ctc_greedy_decode(probs: np.ndarray, blank: int = 0) -> CtcHypothesis:
    """probs [T, C] (linear or log); collapse repeats, drop blanks."""
    probs = np.asarray(probs)
    best = np.argmax(probs, axis=-1)
    logp = probs if np.min(probs) < 0 else np.log(np.maximum(probs, 1e-30))
    score = float(np.sum(np.max(logp, axis=-1)))
    labels: List[int] = []
    prev = -1
    for t, c in enumerate(best):
        c = int(c)
        if c != blank and c != prev:
            labels.append(c)
        prev = c
    return CtcHypothesis(labels=labels, score=score)


def ctc_beam_search_decode(
    probs: np.ndarray, beam_width: int = 10, n_best: int = 1, blank: int = 0
) -> List[CtcHypothesis]:
    """Prefix beam search (log domain). Returns n_best hypotheses."""
    probs = np.asarray(probs, np.float64)
    logp = probs if np.min(probs) < 0 else np.log(np.maximum(probs, 1e-30))
    T, C = logp.shape
    NEG = -math.inf

    def logaddexp(a, b):
        if a == NEG:
            return b
        if b == NEG:
            return a
        return np.logaddexp(a, b)

    # prefix -> (log P ending in blank, log P ending in non-blank)
    beams = {(): (0.0, NEG)}
    for t in range(T):
        # Prune classes: only top candidates matter.
        order = np.argsort(-logp[t])[: max(beam_width * 2, 8)]
        nxt: dict = {}
        for prefix, (pb, pnb) in beams.items():
            total = logaddexp(pb, pnb)
            for c in order:
                c = int(c)
                p = logp[t, c]
                if c == blank:
                    entry = nxt.setdefault(prefix, [NEG, NEG])
                    entry[0] = logaddexp(entry[0], total + p)
                elif prefix and c == prefix[-1]:
                    # Same as last label: extends non-blank path only after a
                    # blank; repeating without blank stays the same prefix.
                    entry = nxt.setdefault(prefix, [NEG, NEG])
                    entry[1] = logaddexp(entry[1], pnb + p)
                    ext = prefix + (c,)
                    entry2 = nxt.setdefault(ext, [NEG, NEG])
                    entry2[1] = logaddexp(entry2[1], pb + p)
                else:
                    ext = prefix + (c,)
                    entry = nxt.setdefault(ext, [NEG, NEG])
                    entry[1] = logaddexp(entry[1], total + p)
        # Keep top beams by total probability.
        scored = sorted(
            nxt.items(), key=lambda kv: -logaddexp(kv[1][0], kv[1][1])
        )[:beam_width]
        beams = {k: tuple(v) for k, v in scored}

    ranked = sorted(
        beams.items(), key=lambda kv: -logaddexp(kv[1][0], kv[1][1])
    )[:n_best]
    return [
        CtcHypothesis(labels=list(prefix), score=float(logaddexp(pb, pnb)))
        for prefix, (pb, pnb) in ranked
    ]


class CtcDecoder:
    """Interface mirror of rten CtcDecoder (src/ctc.rs:27)."""

    def __init__(self, blank: int = 0):
        self.blank = blank

    def decode_greedy(self, probs) -> CtcHypothesis:
        return ctc_greedy_decode(probs, self.blank)

    def decode_beam(self, probs, beam_width: int = 10) -> CtcHypothesis:
        return ctc_beam_search_decode(probs, beam_width, 1, self.blank)[0]

    def decode_beam_nbest(self, probs, beam_width: int = 10, n: int = 5):
        return ctc_beam_search_decode(probs, beam_width, n, self.blank)
