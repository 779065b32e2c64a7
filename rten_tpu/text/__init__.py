"""Text processing: HF tokenizer.json-compatible tokenizers.

The analog of rten-text (rten-text/src/tokenizer.rs): a from-scratch
implementation of the `tokenizer.json` pipeline (normalizer ->
pre-tokenizer -> model -> post-processor -> decoder), not a binding to the
`tokenizers` library — which is only used in tests as a golden.
"""

from .tokenizer import Encoding, Tokenizer, TokenizerError  # noqa: F401
