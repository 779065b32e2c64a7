"""Autoregressive generation: the rten-generate analog, TPU-native.

Components: Generator (KV-cache loop), samplers, logits filters, metrics,
streaming text decoder. The deliberate architectural upgrade over the
reference (SURVEY.md section 7): static bucketed KV-cache shapes so XLA
compiles a bounded set of step functions, instead of per-length shapes.
"""

from .filter import Chain, Temperature, TopK, TopP, token_id_filter  # noqa: F401
from .generator import Generator, GeneratorConfig  # noqa: F401
from .metrics import Metrics  # noqa: F401
from .sampler import ArgMaxSampler, MultinomialSampler, Sampler  # noqa: F401
from .text_decoder import TextDecoder  # noqa: F401
