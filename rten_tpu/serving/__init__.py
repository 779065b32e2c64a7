"""Serving: continuous-batching scheduler over slot-based KV caches.

The deliberate upgrade over the reference, whose generator is strictly
batch=1 (rten rten-generate/src/generator.rs:762-763); see BASELINE.json's
north star. Iteration-level (Orca-style) scheduling: a fixed pool of decode
slots steps every active sequence one token per model call, new requests
prefill into free slots between steps.
"""

from .engine import ContinuousBatchingEngine, Request  # noqa: F401
from .speculative import SpeculativeEngine  # noqa: F401
