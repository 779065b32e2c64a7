"""Continuous-batching engine.

Design (SURVEY.md section 7 / BASELINE north star):

* KV cache: preallocated slot-major device buffers [slots, H, cap, D] per
  layer (the HBM pool). The model graph (gpt2.build_graph_static_cache)
  writes new KV at each slot's offset in-graph; decode calls donate the
  buffers so XLA updates them in place — no per-token reallocation, one
  compiled decode executable for the whole serving run.
* Scheduling: iteration-level. Each step() first admits queued requests
  into free slots (single-slot prefill at a bucketed prompt length, then a
  device scatter of the prefilled rows into the slot buffers), then decodes
  ONE token for every active slot in a single batched model call.
* Shapes: decode is always [slots, 1]; prefill compiles one executable per
  prompt bucket. Total executables = O(prompt buckets) + 1.
"""

from __future__ import annotations

import dataclasses
import itertools
import time
from collections import deque
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..generate.sampler import ArgMaxSampler, Sampler


@dataclasses.dataclass
class Request:
    prompt: List[int]
    max_new_tokens: int = 64
    eos_id: Optional[int] = None
    request_id: int = 0
    # Filled by the engine:
    generated: List[int] = dataclasses.field(default_factory=list)
    done: bool = False
    submitted_at: float = 0.0
    first_token_at: Optional[float] = None
    finished_at: Optional[float] = None

    @property
    def ttft_s(self) -> Optional[float]:
        if self.first_token_at is None:
            return None
        return self.first_token_at - self.submitted_at


class ContinuousBatchingEngine:
    def __init__(
        self,
        model,
        *,
        n_layer: int,
        n_head: int,
        head_dim: int,
        slots: int = 4,
        capacity: int = 512,
        prefill_bucket: int = 64,
        sampler: Optional[Sampler] = None,
        greedy_on_device: bool = False,
        steps_per_dispatch: int = 1,
        params: Optional[Dict[int, object]] = None,
    ):
        """``params``: optional {node_id: device array} weight overrides —
        e.g. mesh-sharded copies from parallel.shard_constants, making the
        whole serving engine tensor-parallel (GSPMD propagates from the
        committed weight shardings through decode and cache updates)."""
        self.model = model
        self.executor = model.executor
        self.g = model.graph
        self.n_layer = n_layer
        self.slots = slots
        self.capacity = capacity
        self.prefill_bucket = prefill_bucket
        self.sampler = sampler or ArgMaxSampler()
        self.params = dict(params) if params else None

        # Discover cache buffers from graph IO: every input named
        # past_key_values.* is an engine-managed per-slot buffer whose
        # declared [slots, ...] shape/dtype drives allocation (supports
        # f32 KV, int8 KV + scale buffers, etc. without hardcoding).
        self.cache_names = []
        self._cache_alloc = []  # (shape-tail, dtype)
        for nid in self.g.input_ids:
            name = self.g.node_name(nid)
            if not name.startswith("past_key_values."):
                continue
            node = self.g.nodes[nid]
            tail = tuple(node.shape[1:]) if node.shape else None
            if tail is None or any(not isinstance(d, int) for d in tail):
                raise ValueError(
                    f"cache input {name} needs concrete trailing dims, got "
                    f"{node.shape}"
                )
            dtype = node.dtype.np_dtype if node.dtype else np.float32
            self.cache_names.append(name)
            self._cache_alloc.append((tail, dtype))
        self.present_names = [
            "present." + n[len("past_key_values."):] for n in self.cache_names
        ]
        self.cache_ids = [self.g.find_node(n) for n in self.cache_names]
        self.in_ids = {
            n: self.g.find_node(n)
            for n in ("input_ids", "past_lens", "position_ids")
        }
        # Greedy-on-device: fetch the tiny argmax output instead of the full
        # [slots, T, V] logits (XLA prunes the logits transfer entirely).
        self.greedy_on_device = (
            greedy_on_device and self.g.find_node("next_token") is not None
            and sampler is None
        )
        tok_out = "next_token" if self.greedy_on_device else "logits"
        self.out_ids = [self.g.find_node(tok_out)] + [
            self.g.find_node(n) for n in self.present_names
        ]

        self.caches = [
            jnp.zeros((slots,) + tail, dtype)
            for tail, dtype in self._cache_alloc
        ]
        self.slot_req: List[Optional[Request]] = [None] * slots
        self.slot_len = np.zeros(slots, np.int32)
        self.slot_last_tok = np.zeros(slots, np.int32)
        self.queue: deque[Request] = deque()
        self._req_counter = itertools.count()
        self.finished: List[Request] = []
        self.steps = 0
        self.decode_tokens = 0

        def _insert_row(cache, row, slot):
            return jax.lax.dynamic_update_slice(cache, row, (slot, 0, 0, 0))

        # Donate the cache: the scatter happens in place on device.
        self._insert_row = jax.jit(_insert_row, donate_argnums=0)

        # Fused multi-step decode: k greedy steps chained on device via
        # lax.scan, one dispatch per k*slots tokens (amortizes host/tunnel
        # round-trip latency — the dominant cost of per-token dispatch).
        self.steps_per_dispatch = (
            steps_per_dispatch if self.greedy_on_device else 1
        )
        self._multi_step = None
        if self.steps_per_dispatch > 1:
            self._multi_step = self._build_multi_step(self.steps_per_dispatch)

    def _build_multi_step(self, k: int):
        executor = self.executor
        in_ids = self.in_ids
        cache_ids = self.cache_ids
        out_ids = self.out_ids  # [next_token, presents...]
        n_caches = len(cache_ids)

        def fn(weights: Dict, caches, toks, lens):
            def body(carry, _):
                caches, toks, lens = carry
                env = dict(weights)
                env[in_ids["input_ids"]] = toks[:, None]
                env[in_ids["past_lens"]] = lens
                env[in_ids["position_ids"]] = lens[:, None]
                for nid, c in zip(cache_ids, caches):
                    env[nid] = c
                outs = executor.trace(env, out_ids)
                new_toks = outs[0][:, 0].astype(jnp.int32)
                return (tuple(outs[1:]), new_toks, lens + 1), new_toks

            (caches, toks, lens), tok_seq = jax.lax.scan(
                body, (tuple(caches), toks, lens), None, length=k
            )
            return caches, tok_seq.T  # [slots, k]

        # Donate the caches (arg 1) so updates stay in place.
        return jax.jit(fn, donate_argnums=(1,))

    # -- public API ----------------------------------------------------------

    def submit(self, prompt: Sequence[int], max_new_tokens: int = 64,
               eos_id: Optional[int] = None) -> Request:
        # Validate here, not in _prefill: a bad request must fail at submit
        # time instead of crashing the serving loop mid-step (losing every
        # in-flight request).
        if len(prompt) > self.capacity - max_new_tokens:
            raise ValueError(
                f"prompt ({len(prompt)} tokens) + max_new_tokens "
                f"({max_new_tokens}) exceeds KV capacity {self.capacity}"
            )
        req = Request(
            prompt=list(prompt),
            max_new_tokens=max_new_tokens,
            eos_id=eos_id,
            request_id=next(self._req_counter),
            submitted_at=time.perf_counter(),
        )
        self.queue.append(req)
        return req

    def has_work(self) -> bool:
        return bool(self.queue) or any(r is not None for r in self.slot_req)

    def stats(self) -> Dict:
        """Aggregate serving metrics (rten Metrics analog, per-engine)."""
        import statistics

        ttfts = [r.ttft_s for r in self.finished if r.ttft_s is not None]
        lat = [
            r.finished_at - r.submitted_at
            for r in self.finished
            if r.finished_at is not None
        ]
        return {
            "finished_requests": len(self.finished),
            "decode_tokens": self.decode_tokens,
            "decode_steps": self.steps,
            "ttft_p50_s": statistics.median(ttfts) if ttfts else None,
            "latency_p50_s": statistics.median(lat) if lat else None,
            "active_slots": sum(r is not None for r in self.slot_req),
            "queued": len(self.queue),
        }

    def run(self) -> List[Request]:
        """Drain the queue; returns finished requests in completion order."""
        while self.has_work():
            self.step()
        return self.finished

    # -- internals -----------------------------------------------------------

    def _round_up(self, x: int) -> int:
        m = self.prefill_bucket
        return ((x + m - 1) // m) * m if x else m

    def _prefill(self, req: Request, slot: int):
        T = self._round_up(len(req.prompt))
        ids = np.zeros((1, T), np.int32)
        ids[0, : len(req.prompt)] = req.prompt
        feed = {
            self.in_ids["input_ids"]: ids,
            self.in_ids["past_lens"]: np.zeros(1, np.int32),
            self.in_ids["position_ids"]: np.arange(T, dtype=np.int32)[None],
        }
        for nid, cache in zip(self.cache_ids, self.caches):
            feed[nid] = jnp.zeros((1,) + cache.shape[1:], cache.dtype)
        if self.params:
            feed.update(self.params)
        outs = self.executor.run(feed, self.out_ids, donate=self.cache_ids)
        for li, present in enumerate(outs[1:]):
            self.caches[li] = self._insert_row(
                self.caches[li], present, jnp.int32(slot)
            )
        if self.greedy_on_device:
            tok = int(np.asarray(outs[0])[0, len(req.prompt) - 1])
        else:
            logits = np.asarray(outs[0])[0, len(req.prompt) - 1]
            tok = int(self.sampler.sample(logits[None])[0])
        now = time.perf_counter()
        req.first_token_at = now
        req.generated.append(tok)
        self.slot_req[slot] = req
        self.slot_len[slot] = len(req.prompt)
        self.slot_last_tok[slot] = tok
        self._maybe_finish(slot, tok)

    def _maybe_finish(self, slot: int, tok: int):
        req = self.slot_req[slot]
        if req is None:
            return
        if (req.eos_id is not None and tok == req.eos_id) or len(
            req.generated
        ) >= req.max_new_tokens:
            req.done = True
            req.finished_at = time.perf_counter()
            self.finished.append(req)
            self.slot_req[slot] = None
            self.slot_len[slot] = 0

    def step(self):
        # 1. Admit queued requests into free slots.
        for slot in range(self.slots):
            if self.slot_req[slot] is None and self.queue:
                self._prefill(self.queue.popleft(), slot)
        active = [s for s in range(self.slots) if self.slot_req[s] is not None]
        if not active:
            return
        # 2a. Fused multi-step decode when enabled and there is KV room.
        k = self.steps_per_dispatch
        if (
            self._multi_step is not None
            and k > 1
            and all(self.slot_len[s] + k < self.capacity - 1 for s in active)
        ):
            caches, tok_seq = self._multi_step(
                {**self.executor._weight_args(), **(self.params or {})},
                self.caches,
                jnp.asarray(self.slot_last_tok),
                jnp.asarray(self.slot_len),
            )
            self.caches = list(caches)
            tok_seq = np.asarray(tok_seq)  # [slots, k]
            self.steps += k
            for slot in active:
                req = self.slot_req[slot]
                toks = tok_seq[slot]
                # Accept up to the request budget, cut at the first eos.
                cut = min(k, req.max_new_tokens - len(req.generated))
                if req.eos_id is not None:
                    hits = np.nonzero(toks[:cut] == req.eos_id)[0]
                    if hits.size:
                        cut = int(hits[0]) + 1
                accepted = toks[:cut]
                req.generated.extend(int(t) for t in accepted)
                self.slot_len[slot] += cut
                self.slot_last_tok[slot] = int(accepted[-1]) if cut else self.slot_last_tok[slot]
                self.decode_tokens += cut
                if cut:
                    self._maybe_finish(slot, int(accepted[-1]))
            return
        # 2b. One decode step for every slot (inactive slots compute garbage
        #    into their own cache rows, overwritten at next admission).
        feed = {
            self.in_ids["input_ids"]: self.slot_last_tok[:, None].copy(),
            self.in_ids["past_lens"]: self.slot_len.copy(),
            self.in_ids["position_ids"]: self.slot_len[:, None].copy(),
        }
        for nid, cache in zip(self.cache_ids, self.caches):
            feed[nid] = cache
        if self.params:
            feed.update(self.params)
        outs = self.executor.run(feed, self.out_ids, donate=self.cache_ids)
        self.caches = list(outs[1:])
        if self.greedy_on_device:
            toks = np.asarray(outs[0])[active, 0]
        else:
            logits = np.asarray(outs[0])[:, 0]  # [slots, V]
            toks = self.sampler.sample(logits[active])
        self.steps += 1
        for tok, slot in zip(toks, active):
            req = self.slot_req[slot]
            req.generated.append(int(tok))
            self.slot_len[slot] += 1
            self.slot_last_tok[slot] = int(tok)
            self.decode_tokens += 1
            if self.slot_len[slot] >= self.capacity - 1:
                req.done = True  # out of KV room
            self._maybe_finish(slot, int(tok))
