"""Autoregressive Generator (rten rten-generate/src/generator.rs:398).

Drives any causal-LM graph that follows the Optimum KV-cache naming
conventions (`past_key_values.N.key` -> `present.N.key`, discovered by
pattern like rten generator.rs:267-322).

TPU-native shape policy (the deep divergence from the reference, SURVEY.md
section 7 "hard parts"): XLA compiles one executable per shape, so the
per-step KV length must not grow by 1 each token. Instead:

* prompts are LEFT-padded to a bucket multiple (padding masked out, so
  the cache stays right-aligned and contiguous),
* the past KV fed to the model is padded to the next capacity bucket,
* the executor therefore compiles O(max_len / bucket) step functions,
  the analog of the reference's CachedPlan + capacity-doubling KV growth
  (generator.rs:874-882).

Cache tensors live on device (jax arrays); per-step host work is only the
[B, V] logits row for filtering/sampling.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from .filter import LogitsFilter
from .metrics import Metrics
from .sampler import ArgMaxSampler, Sampler

# (pattern, present-name template, is_encoder) triples;
# rten generator.rs:267-322 KVCachePair table. `encoder` entries are
# cross-attention caches of merged encoder-decoder exports: computed once
# on the first run, frozen afterwards (generator.rs:891-915).
_KV_PATTERNS = [
    (
        re.compile(r"^past_key_values\.(\d+)\.(decoder|encoder)\.(key|value)$"),
        lambda m: f"present.{m.group(1)}.{m.group(2)}.{m.group(3)}",
        lambda m: m.group(2) == "encoder",
    ),
    (
        re.compile(r"^past_key_values\.(\d+)\.(key|value)$"),
        lambda m: f"present.{m.group(1)}.{m.group(2)}",
        lambda m: False,
    ),
    (
        re.compile(r"^past_(\d+)_(key|value)$"),
        lambda m: f"present_{m.group(1)}_{m.group(2)}",
        lambda m: False,
    ),
]


class GeneratorError(Exception):
    pass


@dataclasses.dataclass
class GeneratorConfig:
    """rten GeneratorConfig + ModelInputsConfig analog
    (rten-generate/src/generator.rs:219-265)."""

    max_seq_len: int = 1024
    bucket_size: int = 128
    sampler: Sampler = dataclasses.field(default_factory=ArgMaxSampler)
    logits_filters: List[LogitsFilter] = dataclasses.field(default_factory=list)
    eos_ids: Optional[Sequence[int]] = None
    # Input/output names (overridable like rten ModelInputsConfig).
    input_ids_name: str = "input_ids"
    attention_mask_name: str = "attention_mask"
    position_ids_name: str = "position_ids"
    logits_name: str = "logits"
    cache_position_name: str = "cache_position"
    use_cache_flag_name: str = "use_cache_branch"
    # Extra constant inputs fed every step (e.g. encoder_hidden_states).
    constant_inputs: Dict[str, Any] = dataclasses.field(default_factory=dict)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m if x else m


class KvEntry:
    def __init__(self, input_name: str, output_name: str, shape):
        self.input_name = input_name
        self.output_name = output_name
        self.shape = shape  # declared (may contain symbolic dims)


class Generator:
    """Iterator over generated token ids (batch-aware: yields [B] arrays,
    or python ints when B == 1)."""

    def __init__(self, model, prompt_ids, config: Optional[GeneratorConfig] = None):
        self.model = model
        self.config = config or GeneratorConfig()
        self.metrics = Metrics()

        prompt = np.asarray(prompt_ids, np.int32)
        if prompt.ndim == 1:
            prompt = prompt[None]
        self.batch = prompt.shape[0]

        self._discover_io()
        self._jit_helpers: Dict = {}  # shape-keyed padded/append helpers
        self._cache: List[Any] = []  # device arrays [B, H, t, D]
        self._cross: Dict[str, Any] = {}  # frozen cross-attention KV by name
        self._cache_len = 0
        self._mask: Optional[np.ndarray] = None  # host [B, t] int32
        self._last_tokens: Optional[np.ndarray] = None
        self._generated: List[np.ndarray] = []
        self._finished = np.zeros(self.batch, bool)
        self._pending_logits: Optional[np.ndarray] = None

        self.metrics.start_step()
        self._prefill(prompt)
        self.metrics.end_prefill(int(prompt.shape[1]))

    # -- model IO discovery --------------------------------------------------

    def _discover_io(self):
        g = self.model.graph
        self.kv: List[KvEntry] = []         # self-attention (growing)
        self.cross_kv: List[KvEntry] = []   # cross-attention (frozen)
        self.input_names = set(self.model.input_names())
        out_names = set(self.model.output_names())
        for nid in g.input_ids:
            name = g.node_name(nid)
            for pat, present, is_encoder in _KV_PATTERNS:
                m = pat.match(name)
                if m:
                    out_name = present(m)
                    if out_name not in out_names:
                        raise GeneratorError(
                            f"KV input {name} has no matching output {out_name}"
                        )
                    node = g.nodes[nid]
                    entry = KvEntry(name, out_name, getattr(node, "shape", None))
                    (self.cross_kv if is_encoder(m) else self.kv).append(entry)
                    break
        if self.config.input_ids_name not in self.input_names:
            raise GeneratorError(
                f"model has no '{self.config.input_ids_name}' input; "
                f"inputs: {sorted(self.input_names)}"
            )
        self.has_mask = self.config.attention_mask_name in self.input_names
        self.has_positions = self.config.position_ids_name in self.input_names
        self.has_cache_position = self.config.cache_position_name in self.input_names
        # Merged Optimum decoders: use_cache_branch = 0 on the first run,
        # 1 after (rten generator.rs:645-650). Fed as a STATIC input: the
        # no-past branch of the ONNX If returns different KV shapes, so the
        # predicate must be concrete at trace time on XLA.
        self.has_use_cache_flag = self.config.use_cache_flag_name in self.input_names
        if not self.has_mask and self.config.bucket_size != 1:
            # Without an attention_mask input there is no way to neutralize
            # bucket padding in the KV cache — fall back to exact shapes
            # (one executable per sequence length, the reference's shape
            # behavior).
            self.config = dataclasses.replace(self.config, bucket_size=1)
        if self.config.logits_name in out_names:
            self.logits_name = self.config.logits_name
        else:
            non_present = [
                n for n in self.model.output_names()
                if not any(n == e.output_name for e in self.kv)
            ]
            if not non_present:
                raise GeneratorError("model has no logits output")
            self.logits_name = non_present[0]

    def _kv_dims(self, entry: KvEntry) -> Tuple[int, int]:
        shape = entry.shape
        if shape is None or len(shape) != 4:
            raise GeneratorError(
                f"KV input {entry.input_name} needs a declared [B,H,S,D] shape"
            )
        H, D = shape[1], shape[3]
        if not isinstance(H, int) or not isinstance(D, int):
            raise GeneratorError(
                f"KV input {entry.input_name}: head/dim sizes must be concrete "
                f"(got {shape})"
            )
        return H, D

    # -- steps ---------------------------------------------------------------

    def _run(self, input_ids, mask, positions, past: List[Any],
             first_run: bool):
        feed: Dict[str, Any] = {self.config.input_ids_name: input_ids}
        static_names: List[str] = []
        if self.has_mask:
            feed[self.config.attention_mask_name] = mask
        if self.has_positions:
            feed[self.config.position_ids_name] = positions
        if self.has_cache_position:
            # 1-D absolute positions of the current tokens
            # (rten generator.rs varying_inputs for cache_position).
            feed[self.config.cache_position_name] = np.asarray(
                positions, np.int32
            ).reshape(-1)[-input_ids.shape[1]:]
        if self.has_use_cache_flag:
            feed[self.config.use_cache_flag_name] = np.bool_(not first_run)
            static_names.append(self.config.use_cache_flag_name)
        for e, p in zip(self.kv, past):
            feed[e.input_name] = p
        for e in self.cross_kv:
            if first_run:
                H, D = self._kv_dims(e)
                feed[e.input_name] = jnp.zeros((self.batch, H, 0, D), jnp.float32)
            else:
                feed[e.input_name] = self._cross[e.input_name]
        feed.update(self.config.constant_inputs)
        # Cross-attention presents are only fetched on the first run; later
        # runs return dummy empty tensors in Optimum exports, which the
        # reference ignores (generator.rs:891-915) and we simply never ask
        # for (saves the transfer).
        want = [self.logits_name] + [e.output_name for e in self.kv]
        if first_run:
            want += [e.output_name for e in self.cross_kv]
        outs = self.model.run(feed, want, static_inputs=static_names)
        n_kv = len(self.kv)
        if first_run and self.cross_kv:
            self._cross = {
                e.input_name: cross_out
                for e, cross_out in zip(self.cross_kv, outs[1 + n_kv:])
            }
        return outs[0], outs[1 : 1 + n_kv]

    def _prefill(self, prompt: np.ndarray):
        B, T = prompt.shape
        cap = _round_up(T, self.config.bucket_size)
        pad = cap - T
        ids = np.pad(prompt, ((0, 0), (pad, 0)))  # left pad
        mask = np.pad(np.ones((B, T), np.int32), ((0, 0), (pad, 0)))
        positions = np.maximum(np.cumsum(mask, axis=1) - 1, 0).astype(np.int32)
        past = [
            jnp.zeros((B, *self._kv_dims(e)[:1], 0, self._kv_dims(e)[1]),
                      jnp.float32)
            for e in self.kv
        ]
        logits, presents = self._run(ids, mask, positions, past, first_run=True)
        self._cache = list(presents)
        self._cache_len = cap
        self._mask = mask
        self._pending_logits = np.asarray(logits[:, -1]).astype(np.float32)

    def _sample(self) -> np.ndarray:
        logits = self._pending_logits
        prev = (
            np.stack(self._generated, 1) if self._generated else np.zeros((self.batch, 0))
        )
        for f in self.config.logits_filters:
            logits = f.apply(logits, prev)
        tokens = self.config.sampler.sample(logits)
        return tokens.astype(np.int32)

    def _decode_step(self, tokens: np.ndarray):
        B = self.batch
        t = self._cache_len
        cap = _round_up(t + 1, self.config.bucket_size) - 1
        if t + 1 > self.config.max_seq_len:
            raise GeneratorError(f"exceeded max_seq_len={self.config.max_seq_len}")
        kv_pad = cap - t
        past = self._cache
        if kv_pad:
            # One jitted call pads every layer's cache (per-layer jnp.pad
            # from Python would be 2L separate device dispatches — ruinous
            # through a remote-dispatch tunnel).
            key = ("pad", kv_pad)
            fn = self._jit_helpers.get(key)
            if fn is None:
                import jax

                fn = jax.jit(
                    lambda cs, _p=kv_pad: [
                        jnp.pad(c, ((0, 0), (0, 0), (0, _p), (0, 0))) for c in cs
                    ]
                )
                self._jit_helpers[key] = fn
            past = fn(past)
        mask = np.pad(self._mask, ((0, 0), (0, kv_pad)))
        mask = np.concatenate([mask, np.ones((B, 1), np.int32)], 1)
        positions = self._mask.sum(axis=1, dtype=np.int32)[:, None]
        logits, presents = self._run(
            tokens[:, None], mask, positions, past, first_run=False
        )
        # New token's KV lives at index cap of each present; keep the cache
        # contiguous at logical length t+1 (single jitted call, see above).
        key = ("append", cap, t)
        fn = self._jit_helpers.get(key)
        if fn is None:
            import jax

            fn = jax.jit(
                lambda cs, ps, _c=cap: [
                    jnp.concatenate([c, p[:, :, _c : _c + 1]], axis=2)
                    for c, p in zip(cs, ps)
                ]
            )
            self._jit_helpers[key] = fn
        self._cache = fn(self._cache, presents)
        self._cache_len = t + 1
        self._mask = np.concatenate([self._mask, np.ones((B, 1), np.int32)], 1)
        self._pending_logits = np.asarray(logits[:, -1]).astype(np.float32)

    # -- iterator ------------------------------------------------------------

    def __iter__(self):
        return self

    def __next__(self):
        if self._finished.all():
            raise StopIteration
        self.metrics.start_step()
        tokens = self._sample()
        eos = self.config.eos_ids
        if eos is not None:
            self._finished |= np.isin(tokens, np.asarray(list(eos)))
        self._generated.append(tokens)
        if not self._finished.all():
            self._decode_step(tokens)
        self.metrics.end_step()
        return int(tokens[0]) if self.batch == 1 else tokens

    # -- session checkpoint --------------------------------------------------

    def save_session(self, path) -> None:
        """Serialize the generation state (KV cache + bookkeeping) so a
        conversation can resume later without re-prefilling (SURVEY.md
        section 5: the KV cache is the engine's only runtime state)."""
        from ..serialize import write_safetensors

        tensors = {
            f"cache.{i}": np.asarray(c) for i, c in enumerate(self._cache)
        }
        for i, e in enumerate(self.cross_kv):
            tensors[f"cross.{i}"] = np.asarray(self._cross[e.input_name])
        tensors["mask"] = self._mask
        tensors["generated"] = (
            np.stack(self._generated, 1)
            if self._generated
            else np.zeros((self.batch, 0), np.int32)
        )
        tensors["pending_logits"] = self._pending_logits
        tensors["finished"] = self._finished
        write_safetensors(
            path, tensors, metadata={"cache_len": str(self._cache_len)}
        )

    def restore_session(self, path) -> None:
        from ..serialize import read_safetensors

        data = read_safetensors(path)
        self._cache = [
            jnp.asarray(data[f"cache.{i}"]) for i in range(len(self.kv))
        ]
        self._cross = {
            e.input_name: jnp.asarray(data[f"cross.{i}"])
            for i, e in enumerate(self.cross_kv)
        }
        self._cache_len = self._cache[0].shape[2] if self.kv else 0
        self._mask = np.array(data["mask"])
        gen = np.array(data["generated"])
        self._generated = [gen[:, i] for i in range(gen.shape[1])]
        self._pending_logits = np.array(data["pending_logits"])
        self._finished = np.array(data["finished"])

    # -- conveniences --------------------------------------------------------

    def generate(self, max_tokens: int) -> np.ndarray:
        """Collect up to max_tokens; returns [B, n] token ids."""
        out = []
        for i, tok in enumerate(self):
            out.append(np.atleast_1d(tok))
            if i + 1 >= max_tokens:
                break
        return np.stack(out, axis=1) if out else np.zeros((self.batch, 0), np.int32)
