"""Samplers (rten rten-generate/src/sampler.rs:12-95).

Host samplers run numpy over the [B, V] logits row — negligible next to
the model step when dispatch is per-token. The serving engine's fused
k-step decode cannot afford a host round trip per token, so DeviceSampler
puts temperature/top-k/top-p + categorical sampling INSIDE the compiled
scan body, chaining a jax PRNG key through the carry (round-2 verdict #3:
sampling previously forced steps_per_dispatch=1).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np


class Sampler:
    def sample(self, logits: np.ndarray) -> np.ndarray:
        """logits [B, V] -> token ids [B]."""
        raise NotImplementedError


class ArgMaxSampler(Sampler):
    def sample(self, logits):
        return np.argmax(logits, axis=-1).astype(np.int32)


@dataclasses.dataclass
class DeviceSampler:
    """On-device sampling spec for fused multi-step decode.

    ``transform``/``sample`` are jittable and run inside the engine's
    lax.scan body; ``sample_host`` applies identical filtering on numpy for
    the admission (prefill) step, where logits are already on host. Both
    are deterministic for a fixed seed.
    """

    temperature: float = 1.0
    top_k: Optional[int] = None
    top_p: Optional[float] = None
    seed: int = 0

    # -- device (jittable) ---------------------------------------------------

    def transform(self, logits):
        import jax
        import jax.numpy as jnp

        x = jnp.asarray(logits, jnp.float32)
        if self.temperature != 1.0:
            x = x / max(self.temperature, 1e-6)
        neg_inf = jnp.float32(-jnp.inf)
        if self.top_k is not None and 0 < self.top_k < x.shape[-1]:
            # approx_max_k at recall_target=1.0 is EXACT (validated against
            # lax.top_k) and uses the TPU partial-reduction path instead of
            # a full [B, V] sort — the sort measured 1,650us/step at the
            # round-4 hard config (cap-1024 sampled serving), the approx
            # reduction ~110us.
            kth = jax.lax.approx_max_k(
                x, self.top_k, recall_target=1.0
            )[0][..., -1:]
            x = jnp.where(x < kth, neg_inf, x)
        if self.top_p is not None and self.top_p < 1.0:
            sorted_x = -jnp.sort(-x, axis=-1)  # descending
            probs = jax.nn.softmax(sorted_x, axis=-1)
            cum = jnp.cumsum(probs, axis=-1)
            keep_sorted = (cum - probs) < self.top_p  # top-1 always kept
            # Smallest kept logit per row is the nucleus threshold.
            thresh = jnp.min(
                jnp.where(keep_sorted, sorted_x, jnp.inf), axis=-1,
                keepdims=True,
            )
            x = jnp.where(x < thresh, neg_inf, x)
        return x

    def sample(self, logits, key):
        """[B, V] logits + PRNG key -> (tokens [B] i32, next key)."""
        import jax
        import jax.numpy as jnp

        key, sub = jax.random.split(key)
        toks = jax.random.categorical(sub, self.transform(logits), axis=-1)
        return toks.astype(jnp.int32), key

    def init_key(self):
        import jax

        return jax.random.PRNGKey(self.seed)

    # -- host (numpy, for admission steps) -------------------------------------

    def transform_host(self, logits: np.ndarray) -> np.ndarray:
        x = np.asarray(logits, np.float64)
        if self.temperature != 1.0:
            x = x / max(self.temperature, 1e-6)
        if self.top_k is not None and 0 < self.top_k < x.shape[-1]:
            kth = np.partition(x, -self.top_k, axis=-1)[:, -self.top_k][:, None]
            x = np.where(x < kth, -np.inf, x)
        if self.top_p is not None and self.top_p < 1.0:
            order = np.argsort(-x, axis=-1)
            sx = np.take_along_axis(x, order, axis=-1)
            probs = np.exp(sx - sx[:, :1])
            probs /= probs.sum(axis=-1, keepdims=True)
            cum = np.cumsum(probs, axis=-1)
            keep_sorted = cum - probs < self.top_p
            keep = np.zeros_like(keep_sorted)
            np.put_along_axis(keep, order, keep_sorted, axis=-1)
            x = np.where(keep, x, -np.inf)
        return x

    def sample_host(self, logits: np.ndarray, rng: np.random.Generator):
        x = self.transform_host(logits)
        x = x - x.max(axis=-1, keepdims=True)
        probs = np.exp(x)
        probs /= probs.sum(axis=-1, keepdims=True)
        out = np.empty(probs.shape[0], np.int32)
        for b in range(probs.shape[0]):
            out[b] = rng.choice(probs.shape[-1], p=probs[b])
        return out


class MultinomialSampler(Sampler):
    """Softmax sampling, optionally with temperature (applied by a filter
    or here for convenience)."""

    def __init__(self, seed: int = 0, temperature: float = 1.0):
        self.rng = np.random.default_rng(seed)
        self.temperature = temperature

    def sample(self, logits):
        logits = np.asarray(logits, np.float64)
        if self.temperature != 1.0:
            logits = logits / max(self.temperature, 1e-6)
        logits = logits - logits.max(axis=-1, keepdims=True)
        probs = np.exp(logits)
        probs /= probs.sum(axis=-1, keepdims=True)
        out = np.empty(probs.shape[0], np.int32)
        for b in range(probs.shape[0]):
            out[b] = self.rng.choice(probs.shape[-1], p=probs[b])
        return out
