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

from ..generate.sampler import ArgMaxSampler, DeviceSampler, Sampler


class QueueFull(Exception):
    """Backpressure: the admission queue is at max_queue capacity."""


@dataclasses.dataclass(eq=False)  # identity semantics: queue membership &
class Request:                    # cancellation must not match look-alikes
    prompt: List[int]
    max_new_tokens: int = 64
    eos_id: Optional[int] = None
    request_id: int = 0
    timeout_s: Optional[float] = None
    adapter_id: int = 0
    # Filled by the engine:
    generated: List[int] = dataclasses.field(default_factory=list)
    done: bool = False
    cancelled: bool = False
    timed_out: bool = False
    error: Optional[str] = None
    submitted_at: float = 0.0
    first_token_at: Optional[float] = None
    finished_at: Optional[float] = None

    @property
    def ttft_s(self) -> Optional[float]:
        if self.first_token_at is None:
            return None
        return self.first_token_at - self.submitted_at


class ContinuousBatchingEngine:
    # Class-level fallbacks for submit()'s validation state, so partially
    # constructed engines (tests exercising validation in isolation) and
    # subclasses stay safe before __init__ assigns instance copies.
    prefix_tokens: Optional[List[int]] = None
    prefix_len = 0
    _adapter_nid: Optional[int] = None
    lora_input_ids: Dict[str, int] = {}
    paged = False
    _bt_dirty = False
    # Immutable class-level fallback (a list default would be shared and
    # mutable across instances); instances rebind to fresh lists.
    _prefix_shared: tuple = ()       # full prefix blocks, shared read-only
    _prefix_tmpl: Optional[int] = None  # partial-boundary template block
    _prefix_nblocks = 0

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
        device_sampler: Optional[DeviceSampler] = None,
        greedy_on_device: bool = False,
        steps_per_dispatch: int = 1,
        dispatches_per_drain: int = 1,
        pipeline_dispatch: bool = False,
        chunked_prefill: bool = False,
        max_queue: Optional[int] = None,
        params: Optional[Dict[int, object]] = None,
        scan_unroll: int = 1,
    ):
        """``params``: optional {node_id: device array} weight overrides —
        e.g. mesh-sharded copies from parallel.shard_constants, making the
        whole serving engine tensor-parallel (GSPMD propagates from the
        committed weight shardings through decode and cache updates)."""
        self.model = model
        self.executor = model.executor
        # Unroll factor for the fused k-step decode scan: XLA while-loop
        # iteration boundaries cost ~23us per attention kernel at slots=96
        # (round-4 microbench: 12-layer loop 1.93 -> 1.61 ms/step at
        # unroll=4); unrolling trades compile time for fewer boundaries.
        self.scan_unroll = max(1, int(scan_unroll))
        self.g = model.graph
        self.n_layer = n_layer
        self.slots = slots
        self.capacity = capacity
        self.prefill_bucket = prefill_bucket
        self.sampler = sampler or ArgMaxSampler()
        # On-device sampling (temperature/top-k/top-p + categorical) inside
        # the fused k-step scan; host-side mirror for admission steps.
        self.device_sampler = device_sampler
        self._host_rng = (
            np.random.default_rng(device_sampler.seed)
            if device_sampler is not None else None
        )
        self.params = dict(params) if params else None

        # Paged KV cache (graphs built with paged_blocks > 0): caches are
        # shared block POOLS [n_blocks, H, block_size, D] plus a per-slot
        # block_table input; the engine owns a free-list allocator (block 0
        # reserved as the garbage sink for unallocated table entries).
        self._bt_nid = self.g.find_node("block_table")
        self.paged = self._bt_nid is not None
        if self.paged and chunked_prefill:
            raise ValueError(
                "chunked_prefill is not supported on paged-KV graphs"
            )

        # Discover cache buffers from graph IO: every input named
        # past_key_values.* is an engine-managed buffer whose declared
        # shape/dtype drives allocation (supports f32 KV, int8 KV + scale
        # buffers, paged pools, etc. without hardcoding).
        self.cache_names = []
        self._cache_alloc = []  # (full allocation shape, dtype)
        for nid in self.g.input_ids:
            name = self.g.node_name(nid)
            if not name.startswith("past_key_values."):
                continue
            node = self.g.nodes[nid]
            if self.paged:
                shape = tuple(node.shape) if node.shape else None
                if shape is None or any(
                    not isinstance(d, int) for d in shape
                ):
                    raise ValueError(
                        f"paged cache input {name} needs a concrete shape, "
                        f"got {node.shape}"
                    )
            else:
                tail = tuple(node.shape[1:]) if node.shape else None
                if tail is None or any(not isinstance(d, int) for d in tail):
                    raise ValueError(
                        f"cache input {name} needs concrete trailing dims, "
                        f"got {node.shape}"
                    )
                shape = (slots,) + tail
            dtype = node.dtype.np_dtype if node.dtype else np.float32
            self.cache_names.append(name)
            self._cache_alloc.append((shape, dtype))
        self.present_names = [
            "present." + n[len("past_key_values."):] for n in self.cache_names
        ]
        self.cache_ids = [self.g.find_node(n) for n in self.cache_names]
        self.in_ids = {
            n: self.g.find_node(n)
            for n in ("input_ids", "past_lens", "position_ids")
        }
        # gather_last graphs take per-slot prompt-final indices and emit
        # [slots, 1, V] logits (the lm_head runs on ONE row per slot);
        # decode steps feed zeros (S == 1).
        self.last_pos_id = self.g.find_node("last_pos")
        # Greedy-on-device: fetch the tiny argmax output instead of the full
        # [slots, T, V] logits (XLA prunes the logits transfer entirely).
        self.greedy_on_device = (
            greedy_on_device and self.g.find_node("next_token") is not None
            and sampler is None and device_sampler is None
        )
        tok_out = "next_token" if self.greedy_on_device else "logits"
        self.out_ids = [self.g.find_node(tok_out)] + [
            self.g.find_node(n) for n in self.present_names
        ]

        # Deferred-KV graphs (build_graph_static_cache(deferred_kv=True)):
        # decode steps buffer new rows in per-layer recent.{i}.key/value
        # windows with one uniform-index write; _commit_recent writes them
        # into the big caches once per fused dispatch (the per-slot dus
        # chain cost 558us/step at slots=32 in the round-3 device trace).
        self.recent_names = [
            self.g.node_name(nid)
            for nid in self.g.input_ids
            if self.g.node_name(nid).startswith("recent.")
        ]
        self.deferred_kv = bool(self.recent_names)
        if self.deferred_kv and prefill_bucket < 2:
            # The deferred attention op distinguishes prefill from decode
            # by S>1: a 1-token prefill would trace as a decode step and
            # route the prompt's KV into window outputs prefill discards.
            raise ValueError(
                "deferred-KV graphs need prefill_bucket >= 2 (a 1-token "
                "prefill is indistinguishable from a decode step)"
            )
        self.recent_ids = [self.g.find_node(n) for n in self.recent_names]
        self.step_t_id = self.g.find_node("step_t") if self.deferred_kv else None
        self.recent_out_ids = [
            self.g.find_node("recent_present." + n[len("recent."):])
            for n in self.recent_names
        ]
        self._recent_alloc = []     # (heads, head_dim, dtype) per window
        self._commit_plan = []      # (recent_idx, cache_idx, scale_idx|None)
        for ri, rname in enumerate(self.recent_names):
            node = self.g.nodes[self.recent_ids[ri]]
            rdt = node.dtype.np_dtype if node.dtype else np.float32
            self._recent_alloc.append((node.shape[1], node.shape[3], rdt))
            base = "past_key_values." + rname[len("recent."):]
            ci = self.cache_names.index(base)
            sname = base + "_scale"
            si = (
                self.cache_names.index(sname)
                if sname in self.cache_names else None
            )
            self._commit_plan.append((ri, ci, si))

        # Multi-LoRA serving: graphs built with lora_rank>0 declare a
        # slot_adapter input plus stacked lora.* adapter inputs. Both ride
        # the params override channel (merged into every dispatch's weight
        # args), so no dispatch path needs to know about them: per-slot
        # adapter ids refresh at admission, adapter stacks via
        # set_lora_adapters().
        self._adapter_nid = self.g.find_node("slot_adapter")
        self.lora_input_ids = {
            self.g.node_name(n): n
            for n in self.g.input_ids
            if self.g.node_name(n).startswith("lora.")
        }
        self.slot_adapter = np.zeros(slots, np.int32)
        if self._adapter_nid is not None:
            if self.params is None:
                self.params = {}
            self.params[self._adapter_nid] = jnp.asarray(self.slot_adapter)

        # Paged-KV allocator state. max_blocks comes from the block_table
        # input's declared width; logical per-slot capacity = max_blocks *
        # block_size and must match the ``capacity`` the caller dispatches
        # against.
        if self.paged:
            bt_node = self.g.nodes[self._bt_nid]
            self.max_blocks = int(bt_node.shape[1])
            shape0 = self._cache_alloc[0][0]
            self.n_blocks = int(shape0[0])
            # Head-major pools are [NB, H, BS, D]; cat-layout pools
            # (paged kernel-append graphs) are [NB, BS, H*D].
            self.block_size = int(shape0[1] if len(shape0) == 3 else shape0[2])
            if capacity != self.max_blocks * self.block_size:
                raise ValueError(
                    f"capacity {capacity} != block_table width "
                    f"{self.max_blocks} * block_size {self.block_size}"
                )
            self._free_blocks = list(range(self.n_blocks - 1, 0, -1))
            self._slot_blocks: List[List[int]] = [[] for _ in range(slots)]
            self.block_table = np.zeros(
                (slots, self.max_blocks), np.int32
            )
            self._bt_dirty = True
            if self.params is None:
                self.params = {}

        self.caches = [
            jnp.zeros(shape, dtype) for shape, dtype in self._cache_alloc
        ]
        self.slot_req: List[Optional[Request]] = [None] * slots
        self.slot_len = np.zeros(slots, np.int32)
        self.slot_last_tok = np.zeros(slots, np.int32)
        self.queue: deque[Request] = deque()
        self.max_queue = max_queue
        self._req_counter = itertools.count()
        self._last_step_s: Optional[float] = None
        # Completed requests awaiting collection. Batch callers read this
        # via run(); long-running servers must drain_finished() so it can't
        # grow without bound. stats() percentiles come from the bounded
        # windows below, so draining doesn't lose observability.
        self.finished: List[Request] = []
        self.finished_count = 0
        self._ttft_window: deque = deque(maxlen=2048)
        self._latency_window: deque = deque(maxlen=2048)
        self.steps = 0
        self.decode_tokens = 0

        def _insert_row(cache, row, slot):
            return jax.lax.dynamic_update_slice(cache, row, (slot, 0, 0, 0))

        # Donate the cache: the scatter happens in place on device.
        # (Legacy single-cache path; admissions use the fused batch prefill.)
        self._insert_row = jax.jit(_insert_row, donate_argnums=0)
        # One executable per prompt bucket for fused batch prefill+merge:
        # through a remote-dispatch runtime every execute pays a round trip,
        # so admission must be ONE call — not one prefill per slot plus one
        # insert per cache buffer (24 executes/slot was the round-1 TTFT
        # bottleneck).
        self._batch_prefill: Dict[int, object] = {}
        # Shared-prefix (system-prompt) caching: set_shared_prefix()
        # prefills the common prefix ONCE; admissions broadcast the cached
        # rows and prefill only each prompt's suffix.
        self.prefix_tokens: Optional[List[int]] = None
        self.prefix_len = 0
        self._prefix_rows = None           # per cache: [1, H, P, D|1]
        self._prefix_prefill: Dict[int, object] = {}
        # Chunked prefill (SURVEY section 5 long-context plan): prompts run
        # through ONE fixed [slots, prefill_bucket] executable in
        # prefill_bucket-sized chunks at per-slot offsets, instead of one
        # executable per prompt-length bucket. Bounds executable count to
        # O(1) and peak activation memory to the chunk; costs
        # ceil(len/chunk) executes per admission, so it's off by default on
        # remote runtimes where executes are expensive.
        self.chunked_prefill = chunked_prefill
        self._chunk_prefill_fn = None

        # Fused multi-step decode: k greedy steps chained on device via
        # lax.scan, one dispatch per k*slots tokens (amortizes host/tunnel
        # round-trip latency — the dominant cost of per-token dispatch).
        self.steps_per_dispatch = (
            steps_per_dispatch
            if (self.greedy_on_device or self.device_sampler is not None)
            else 1
        )
        self._dev_key = (
            self.device_sampler.init_key()
            if self.device_sampler is not None else None
        )
        # Issue up to D device-chained dispatches between host reads: each
        # extra dispatch costs one execute but ZERO host<->device syncs (the
        # dominant per-dispatch cost on remote runtimes is the sync, not the
        # execute — BASELINE.md round-2 probe: executes 0.02-0.12ms, syncs
        # ~15-40ms). Tokens past a request's eos/max_new are computed and
        # discarded (eos-lagged reads), so D is capped by the minimum
        # remaining budget across active slots to bound waste.
        self.dispatches_per_drain = max(1, dispatches_per_drain)
        self._commit_jit = None        # deferred-KV single-step commit
        self._multi_step = None
        if self.steps_per_dispatch > 1:
            self._multi_step = self._build_multi_step(self.steps_per_dispatch)
        # Dispatch pipelining: issue dispatch N+1 (chained on device state)
        # BEFORE reading dispatch N's tokens, hiding the host round trip
        # behind device compute. Host bookkeeping lags one dispatch.
        # DEFAULT OFF: through the remote-dispatch tunnel (which serializes
        # executes) an interleaved A/B measured it 15% SLOWER (2.9k vs 3.5k
        # tok/s); enable on locally-attached accelerators.
        self.pipeline_dispatch = pipeline_dispatch and self._multi_step is not None
        self._inflight = None          # (tok_seq future, active slots, k)
        self._dev_state = None         # (toks, lens) device arrays to chain

    # -- paged-KV block allocator ----------------------------------------

    def _blocks_needed(self, prompt_len: int, max_new: int) -> int:
        """Blocks this request must OWN, covering every position it can
        write: prefill rows 0..P-1, decode rows up to P+max_new-2, plus the
        fused dispatch's overrun (discarded tokens past eos/budget still
        write KV; bounded by k per drain group, 2k when pipelining). With a
        shared prefix set, the leading full prefix blocks are shared
        read-only and not owned (the partial boundary block IS owned —
        the slot keeps writing into it)."""
        span = min(
            prompt_len + max_new + 2 * max(self.steps_per_dispatch, 1),
            self.capacity,
        )
        return -(-span // self.block_size) - len(self._prefix_shared)

    def _reserve_blocks(self, slot: int, n: int) -> bool:
        """Assign n pool blocks to ``slot``; False if the pool is short
        (caller re-queues the request — natural admission backpressure).
        The slot's table row = [shared prefix blocks..., own blocks...]."""
        if len(self._free_blocks) < n:
            return False
        blocks = [self._free_blocks.pop() for _ in range(n)]
        self._slot_blocks[slot] = blocks
        row = self.block_table[slot]
        row[:] = 0
        ns = len(self._prefix_shared)
        row[:ns] = self._prefix_shared
        row[ns : ns + len(blocks)] = blocks
        self._bt_dirty = True
        return True

    def _release_blocks(self, slot: int):
        """Return a finished slot's blocks to the pool and point its table
        row at the garbage sink (block 0) BEFORE any block is reused —
        the freed slot keeps writing dummy rows in fused dispatches."""
        if not self.paged or not self._slot_blocks[slot]:
            return
        self._free_blocks.extend(self._slot_blocks[slot])
        self._slot_blocks[slot] = []
        self.block_table[slot, :] = 0
        self._bt_dirty = True

    def _bt_sync(self):
        """Push the host block table to the device params channel (lazily:
        one transfer per change, not per free)."""
        if self.paged and self._bt_dirty:
            self.params[self._bt_nid] = jnp.asarray(self.block_table)
            self._bt_dirty = False

    def _build_multi_step(self, k: int):
        executor = self.executor
        in_ids = self.in_ids
        cache_ids = self.cache_ids
        out_ids = self.out_ids  # [next_token | logits, presents...]
        ds = self.device_sampler
        deferred = self.deferred_kv
        recent_ids = self.recent_ids
        step_t_id = self.step_t_id
        slots = self.slots
        # Decode steps of a deferred graph return the recent windows; the
        # big caches pass through untouched until the commit below.
        dec_out_ids = (
            [out_ids[0]] + self.recent_out_ids if deferred else out_ids
        )

        def fn(weights: Dict, caches, toks, lens, key):
            recents = tuple(
                jnp.zeros((slots, h, k, d), dt)
                for h, d, dt in self._recent_alloc
            )

            def body(carry, t):
                recents, toks, lens, key = carry
                env = dict(weights)
                env[in_ids["input_ids"]] = toks[:, None]
                env[in_ids["past_lens"]] = lens
                env[in_ids["position_ids"]] = lens[:, None]
                self._feed_last_pos(env)
                if deferred:
                    env[step_t_id] = t.reshape(1)
                    for nid, r in zip(recent_ids, recents):
                        env[nid] = r
                    for nid, c in zip(cache_ids, carry_caches):
                        env[nid] = c
                else:
                    for nid, c in zip(cache_ids, recents):
                        env[nid] = c
                outs = executor.trace(env, dec_out_ids)
                if ds is not None:
                    # outs[0] is [slots, 1, V] logits; sample on device so
                    # temperature/top-k/top-p serving keeps the fused k-step
                    # dispatch (PRNG key chained through the scan carry).
                    new_toks, key = ds.sample(outs[0][:, 0], key)
                else:
                    new_toks = outs[0][:, 0].astype(jnp.int32)
                return (tuple(outs[1:]), new_toks, lens + 1, key), new_toks

            if deferred:
                carry_caches = tuple(caches)  # loop-invariant inside scan
                (recents, toks2, lens2, key), tok_seq = jax.lax.scan(
                    body, (recents, toks, lens, key),
                    jnp.arange(k, dtype=jnp.int32),
                )
                caches = self._commit_recent(list(carry_caches), recents, lens)
                toks, lens = toks2, lens2
            else:
                carry_caches = None
                (caches, toks, lens, key), tok_seq = jax.lax.scan(
                    body, (tuple(caches), toks, lens, key),
                    jnp.arange(k, dtype=jnp.int32),
                    unroll=min(self.scan_unroll, k),
                )
            # Return the chained (toks, lens, key) so the NEXT dispatch can
            # be issued without a host round trip (pipeline_dispatch).
            return tuple(caches), toks, lens, key, tok_seq.T  # [slots, k]

        # Donate the caches (arg 1) so updates stay in place.
        return jax.jit(fn, donate_argnums=(1,))

    def _commit_recent(self, caches, recents, lens0):
        """Write each recent window's rows into its big cache at per-slot
        offsets — ONCE per dispatch. int8-KV caches quantize here (the
        window itself stays f32, so in-dispatch rows lose no precision)."""
        from ..ops.attention import _slot_kv_update

        for ri, ci, si in self._commit_plan:
            rows = recents[ri].astype(jnp.float32)  # bf16 windows: quantize
            if si is None:                          # and commit in f32 math
                caches[ci] = _slot_kv_update(
                    caches[ci], rows.astype(caches[ci].dtype), lens0
                )
            elif caches[ci].dtype == jnp.uint8:  # nibble-packed int4 cache
                from ..kernels.flash_attention import pack_int4

                q4, s = pack_int4(rows)
                caches[ci] = _slot_kv_update(caches[ci], q4, lens0)
                caches[si] = _slot_kv_update(caches[si], s, lens0)
            else:
                absmax = jnp.max(jnp.abs(rows), axis=-1, keepdims=True)
                s = jnp.maximum(absmax / 127.0, 1e-8)
                q8 = jnp.clip(jnp.round(rows / s), -127, 127).astype(jnp.int8)
                caches[ci] = _slot_kv_update(caches[ci], q8, lens0)
                caches[si] = _slot_kv_update(
                    caches[si], s.astype(jnp.float32), lens0
                )
        return caches

    # -- pipelined dispatch helpers ------------------------------------------

    def _issue_multi(self, from_host: bool):
        """Launch one fused k-step dispatch; does NOT block."""
        self._bt_sync()
        w = {**self.executor._weight_args(), **(self.params or {})}
        if from_host or self._dev_state is None:
            toks = jnp.asarray(self.slot_last_tok)
            lens = jnp.asarray(self.slot_len)
        else:
            toks, lens = self._dev_state
        key = self._dev_key if self._dev_key is not None else jnp.zeros(
            2, jnp.uint32
        )
        caches, toks2, lens2, key2, tok_seq = self._multi_step(
            w, self.caches, toks, lens, key
        )
        self.caches = list(caches)
        if self._dev_key is not None:
            self._dev_key = key2
        self._dev_state = (toks2, lens2)
        active = [s for s in range(self.slots) if self.slot_req[s] is not None]
        self._inflight = (tok_seq, active, self.steps_per_dispatch)

    def _drain_inflight(self):
        """Consume the in-flight dispatch's tokens into host bookkeeping."""
        rec, self._inflight = self._inflight, None
        self._drain_record(rec)

    def _drain_record(self, rec):
        if rec is None:
            return
        tok_seq, active, k = rec
        tok_seq = np.asarray(tok_seq)  # blocks until the dispatch finishes
        self.steps += k
        for slot in active:
            req = self.slot_req[slot]
            if req is None:
                continue  # finished in an earlier drain; tokens discarded
            toks = tok_seq[slot]
            cut = min(k, req.max_new_tokens - len(req.generated))
            if req.eos_id is not None:
                hits = np.nonzero(toks[:cut] == req.eos_id)[0]
                if hits.size:
                    cut = int(hits[0]) + 1
            accepted = toks[:cut]
            req.generated.extend(int(t) for t in accepted)
            self.slot_len[slot] += cut
            if cut:
                self.slot_last_tok[slot] = int(accepted[-1])
            self.decode_tokens += cut
            if cut:
                self._maybe_finish(slot, int(accepted[-1]))

    # -- public API ----------------------------------------------------------

    def set_lora_adapters(self, by_name: Dict[str, "np.ndarray"]):
        """Install stacked LoRA adapter weights ([n_adapters, ...] arrays
        keyed by the graph's lora.* input names). Must cover every lora
        input; submit(adapter_id=j) then selects stack row j per request."""
        if not self.lora_input_ids:
            raise ValueError("graph was not built with lora_rank > 0")
        missing = sorted(set(self.lora_input_ids) - set(by_name))
        if missing:
            raise ValueError(f"missing adapter arrays for: {missing}")
        if self.params is None:
            self.params = {}
        for name, nid in self.lora_input_ids.items():
            arr = np.asarray(by_name[name], np.float32)
            node = self.g.nodes[nid]
            if tuple(arr.shape) != tuple(node.shape):
                raise ValueError(
                    f"{name}: expected shape {node.shape}, got {arr.shape}"
                )
            self.params[nid] = jnp.asarray(arr)

    def submit(self, prompt: Sequence[int], max_new_tokens: int = 64,
               eos_id: Optional[int] = None,
               timeout_s: Optional[float] = None,
               adapter_id: int = 0) -> Request:
        # Validate here, not in _prefill: a bad request must fail at submit
        # time instead of crashing the serving loop mid-step (losing every
        # in-flight request).
        if len(prompt) == 0:
            raise ValueError("prompt must contain at least one token")
        if self.prefix_tokens is not None and (
            len(prompt) <= self.prefix_len
            or list(prompt[: self.prefix_len]) != self.prefix_tokens
        ):
            # Fail HERE, not in the admission path mid-step: a bad request
            # crashing _admit would drop every co-admitted request.
            raise ValueError(
                "with a shared prefix set, every prompt must start with it "
                "and extend it by >= 1 token"
            )
        if len(prompt) > self.capacity - max_new_tokens:
            raise ValueError(
                f"prompt ({len(prompt)} tokens) + max_new_tokens "
                f"({max_new_tokens}) exceeds KV capacity {self.capacity}"
            )
        if self.paged and (
            self._blocks_needed(len(prompt), max_new_tokens)
            > self.n_blocks - 1 - self._prefix_nblocks
        ):
            # Could NEVER be admitted (needs more blocks than exist even
            # with an empty pool) — fail now instead of queueing forever.
            raise ValueError(
                f"request needs "
                f"{self._blocks_needed(len(prompt), max_new_tokens)} KV "
                f"blocks but the pool has "
                f"{self.n_blocks - 1 - self._prefix_nblocks}"
            )
        if self.max_queue is not None and len(self.queue) >= self.max_queue:
            raise QueueFull(
                f"admission queue at capacity ({self.max_queue}); retry later"
            )
        if adapter_id and self._adapter_nid is None:
            raise ValueError(
                "adapter_id requires a graph built with lora_rank > 0"
            )
        if self.lora_input_ids and not (
            0 <= adapter_id
            < self.g.nodes[next(iter(self.lora_input_ids.values()))].shape[0]
        ):
            # An out-of-range id would CLAMP in the on-device gather and
            # silently serve the wrong adapter — reject at submit time.
            raise ValueError(f"adapter_id {adapter_id} out of range")
        req = Request(
            prompt=list(prompt),
            max_new_tokens=max_new_tokens,
            eos_id=eos_id,
            timeout_s=timeout_s,
            adapter_id=adapter_id,
            request_id=next(self._req_counter),
            submitted_at=time.perf_counter(),
        )
        self.queue.append(req)
        return req

    def _host_sample(self, logits: np.ndarray) -> np.ndarray:
        """Sample [B, V] logits on host: the device sampler's numpy mirror
        when configured (same filters, engine-owned rng), else the plain
        Sampler."""
        if self.device_sampler is not None:
            return self.device_sampler.sample_host(logits, self._host_rng)
        return self.sampler.sample(logits)

    def _finish(self, req: Request):
        self.finished.append(req)
        self.finished_count += 1
        if req.ttft_s is not None:
            self._ttft_window.append(req.ttft_s)
        if req.finished_at is not None:
            self._latency_window.append(req.finished_at - req.submitted_at)

    def cancel(self, req: Request) -> bool:
        """Cancel a queued or running request. Queued requests never run;
        running ones free their slot at the next bookkeeping point."""
        if req.done:
            return False
        req.cancelled = True
        if req in self.queue:
            self.queue.remove(req)
            req.done = True
            req.finished_at = time.perf_counter()
            self._finish(req)
            return True
        return True  # slot freed on next drain (_expire_and_cancel)

    def _expire_and_cancel(self):
        """Free slots whose requests were cancelled or exceeded timeout_s."""
        now = time.perf_counter()
        for slot in range(self.slots):
            req = self.slot_req[slot]
            if req is None:
                continue
            expired = (
                req.timeout_s is not None
                and now - req.submitted_at > req.timeout_s
            )
            if req.cancelled or expired:
                req.timed_out = expired and not req.cancelled
                req.done = True
                req.finished_at = now
                self._finish(req)
                self.slot_req[slot] = None
                self.slot_len[slot] = 0
                self._release_blocks(slot)
        # Expire queued requests too.
        for req in list(self.queue):
            if req.timeout_s is not None and now - req.submitted_at > req.timeout_s:
                self.queue.remove(req)
                req.timed_out = True
                req.done = True
                req.finished_at = now
                self._finish(req)

    def health(self) -> Dict:
        """Liveness probe (SURVEY.md section 5 'failure detection': serving
        needs health checks + deterministic restart). Runs a tiny device
        computation to confirm the accelerator still answers."""
        import jax

        status = "ok"
        err = None
        try:
            jax.block_until_ready(
                jax.jit(lambda x: x + 1)(jnp.zeros((), jnp.int32))
            )
        except Exception as e:  # noqa: BLE001 - any device failure
            status = "device_error"
            err = repr(e)
        return {
            "status": status,
            "error": err,
            "active_slots": sum(r is not None for r in self.slot_req),
            "queued": len(self.queue),
            "inflight_dispatch": self._inflight is not None,
            "last_step_s": self._last_step_s,
        }

    def restart(self) -> List[Request]:
        """Deterministic recovery: drop all device state (KV caches, device
        token chain), re-queue every unfinished request, reallocate the
        cache pool. Weights are reloaded lazily from the executor's host
        copies. Prefill is deterministic, so restarted requests regenerate
        the same tokens. Returns the re-queued requests."""
        requeued = []
        self._inflight = None
        self._dev_state = None
        if self.device_sampler is not None:
            self._dev_key = self.device_sampler.init_key()
            self._host_rng = np.random.default_rng(self.device_sampler.seed)
        for slot in range(self.slots):
            req = self.slot_req[slot]
            if req is not None:
                req.generated.clear()
                req.first_token_at = None
                self.queue.appendleft(req)
                requeued.append(req)
                self.slot_req[slot] = None
            self._release_blocks(slot)
        self.slot_len[:] = 0
        self.slot_last_tok[:] = 0
        self.caches = [
            jnp.zeros(shape, dtype) for shape, dtype in self._cache_alloc
        ]
        self._recompute_prefix_pool()
        return requeued

    def has_work(self) -> bool:
        return (
            bool(self.queue)
            or any(r is not None for r in self.slot_req)
            or self._inflight is not None
        )

    def stats(self) -> Dict:
        """Aggregate serving metrics (rten Metrics analog, per-engine)."""
        import statistics

        ttfts = list(self._ttft_window)
        lat = list(self._latency_window)
        return {
            "finished_requests": self.finished_count,
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

    def drain_finished(self) -> List[Request]:
        """Pop and return all completed requests. Long-running callers (the
        HTTP serving loop) use this instead of reading ``finished`` so the
        list — and the per-step completion rescan — stay bounded."""
        out, self.finished = self.finished, []
        return out

    def fail_inflight(self, error: str) -> List[Request]:
        """Fail every queued and running request with ``error`` (used when a
        step raises: in-flight state is unrecoverable, but waiters must be
        released instead of hanging). Device caches are reset like restart().
        Returns the failed requests."""
        failed = []
        now = time.perf_counter()
        for slot in range(self.slots):
            req = self.slot_req[slot]
            if req is not None:
                req.error = error
                req.done = True
                req.finished_at = now
                self._finish(req)
                failed.append(req)
                self.slot_req[slot] = None
        while self.queue:
            req = self.queue.popleft()
            req.error = error
            req.done = True
            req.finished_at = now
            self._finish(req)
            failed.append(req)
        for slot in range(self.slots):
            self._release_blocks(slot)
        self.slot_len[:] = 0
        self.slot_last_tok[:] = 0
        self._inflight = None
        self._dev_state = None
        if self.device_sampler is not None:
            # Same PRNG reset as restart(): post-failure sampling must draw
            # from the seed's stream, or seed-determinism silently breaks.
            self._dev_key = self.device_sampler.init_key()
            self._host_rng = np.random.default_rng(self.device_sampler.seed)
        self.caches = [
            jnp.zeros(shape, dtype) for shape, dtype in self._cache_alloc
        ]
        self._recompute_prefix_pool()
        return failed

    # -- internals -----------------------------------------------------------

    def _round_up(self, x: int) -> int:
        m = self.prefill_bucket
        return ((x + m - 1) // m) * m if x else m

    def _feed_recent_dummies(self, env):
        """Deferred-KV graphs declare recent-window inputs; prefill and
        single-step paths feed 1-row dummies (prefill writes the big cache
        directly, so the windows are unused there)."""
        if not self.deferred_kv:
            return
        env[self.step_t_id] = jnp.zeros(1, jnp.int32)
        for nid, (h, d, dt) in zip(self.recent_ids, self._recent_alloc):
            env[nid] = jnp.zeros((self.slots, h, 1, d), dt)

    def _feed_last_pos(self, env, val=None):
        """gather_last graphs: per-slot prompt-final index (prefill) or
        zeros (decode, S == 1)."""
        if self.last_pos_id is not None:
            env[self.last_pos_id] = (
                jnp.zeros((self.slots,), jnp.int32) if val is None
                else jnp.asarray(val, jnp.int32)
            )

    def _build_batch_prefill(self, T: int, prefixed: bool = False):
        """Fused admission executable for prompt bucket T: forward ALL slot
        rows (non-admitted rows carry dummy prompts whose results are
        discarded), then merge admitted rows into the donated caches —
        one device execute for any number of simultaneous admissions.

        ``prefixed``: the shared-prefix variant — every slot's cache gets
        the cached prefix rows stamped in and the (suffix) prompt forwards
        at past_lens = P instead of 0."""
        executor = self.executor
        in_ids = self.in_ids
        cache_ids = self.cache_ids
        out_ids = self.out_ids
        slots = self.slots
        P = self.prefix_len if prefixed else 0
        # Paged + prefixed: the partial-boundary template block id is baked
        # into the executable (executables are dropped when the prefix
        # changes). ``prefix_rows`` then carries first_own [slots] instead
        # of stamped rows.
        tmpl = self._prefix_tmpl if (self.paged and prefixed) else None

        def body(weights: Dict, caches, packed, prefix_rows):
            # packed [slots, T+2] int32: prompt ids | admit flag | last idx.
            # One host->device transfer per admission instead of three
            # (each transfer pays a round trip on remote runtimes).
            ids = packed[:, :T]
            admit_mask = packed[:, T] != 0
            last_idx = packed[:, T + 1]
            env = dict(weights)
            env[in_ids["input_ids"]] = ids
            env[in_ids["past_lens"]] = jnp.full((slots,), P, jnp.int32)
            env[in_ids["position_ids"]] = jnp.broadcast_to(
                P + jnp.arange(T, dtype=jnp.int32)[None], (slots, T)
            )
            self._feed_last_pos(env, last_idx)
            for i, (nid, c) in enumerate(zip(cache_ids, caches)):
                if self.paged:
                    # Shared pool: feed it LIVE (admitted writes land in
                    # freshly reserved blocks; non-admitted garbage goes to
                    # block 0 via the admission table) — no zero/merge.
                    if tmpl is not None:
                        # Copy the prefix's partial boundary block into
                        # each admitted slot's first own block (prefix_rows
                        # = first_own; non-admitted entries are 0, the
                        # garbage sink). The suffix prefill then writes on
                        # top from offset P % block_size.
                        c = c.at[prefix_rows].set(c[tmpl])
                    env[nid] = c
                    continue
                base = jnp.zeros_like(c)
                if prefix_rows is not None:
                    # Cache-position axis: ndim-2 (4D head-major and scale
                    # buffers keep cap at dim 2; 3D cat caches at dim 1).
                    ax = c.ndim - 2
                    idx = (slice(None),) * ax + (slice(0, P),)
                    base = base.at[idx].set(
                        jnp.broadcast_to(
                            prefix_rows[i],
                            (slots,) + prefix_rows[i].shape[1:],
                        )
                    )
                env[nid] = base
            self._feed_recent_dummies(env)
            outs = executor.trace(env, out_ids)
            if self.paged:
                merged = list(outs[1:])
            else:
                merged = [
                    jnp.where(
                        admit_mask.reshape((slots,) + (1,) * (c.ndim - 1)),
                        p, c,
                    )
                    for c, p in zip(caches, outs[1:])
                ]
            # Only the prompt-final position matters; gather it on device
            # ([slots] tokens or [slots, V] logits instead of [slots, T, V]).
            sel = (
                outs[0][:, 0] if self.last_pos_id is not None
                else outs[0][jnp.arange(slots), last_idx]
            )
            return sel, merged

        if prefixed:
            return jax.jit(body, donate_argnums=(1,))
        return jax.jit(
            lambda w, c, p: body(w, c, p, None), donate_argnums=(1,)
        )

    def set_shared_prefix(self, tokens: Sequence[int]):
        """Prefill a shared prompt prefix (system prompt) ONCE and cache
        its KV rows; subsequent submissions whose prompts start with it
        skip recomputing those positions (vLLM-style prefix caching,
        specialized to the slot-cache design: rows broadcast into each
        admitted slot — compute is saved, HBM copies are per-slot).

        Must be set while no requests are queued/running; all later
        prompts MUST extend the prefix by >= 1 token (one admission
        executable serves the whole engine)."""
        if self.has_work():
            raise ValueError("set_shared_prefix requires an idle engine")
        # The admission executables bake in the prefix length — changing
        # the prefix must drop them or a stale P would be reused.
        self._prefix_prefill = {}
        tokens = list(tokens)

        def _drop_paged_prefix():
            # Return the previous prefix's permanently reserved blocks.
            # Deferred until the NEW prefix has passed every validation: a
            # failed set_shared_prefix must leave the old prefix usable,
            # not point prefix_tokens at KV whose blocks were freed.
            if not self.paged:
                return
            self._free_blocks.extend(self._prefix_shared)
            if self._prefix_tmpl is not None:
                self._free_blocks.append(self._prefix_tmpl)
            self._prefix_shared, self._prefix_tmpl = [], None
            self._prefix_nblocks = 0
            self._bt_dirty = True

        if not tokens:
            _drop_paged_prefix()
            self.prefix_tokens, self._prefix_rows, self.prefix_len = None, None, 0
            return
        if len(tokens) >= self.capacity:
            raise ValueError("prefix exceeds KV capacity")
        if self.deferred_kv and len(tokens) < 2:
            # An S==1 forward traces as a decode step on deferred graphs
            # (KV routed to the discarded recent-window outputs) — the
            # prefix rows would silently come back as zeros.
            raise ValueError(
                "deferred-KV graphs need a shared prefix of >= 2 tokens"
            )
        if self.lora_input_ids:
            # Prefix rows would be computed under ONE adapter but stamped
            # into every slot regardless of its adapter_id — silently
            # diverging from the per-adapter merged model.
            raise ValueError(
                "shared-prefix caching is not supported on LoRA graphs "
                "(prefix KV is adapter-dependent)"
            )
        P = len(tokens)
        if self.paged:
            # TRUE prefix sharing (the paged design's payoff): the prefix's
            # full blocks are reserved once and referenced read-only by
            # every slot's table row — no per-slot HBM copies of P rows
            # like the slot-major path below. Only the partial boundary
            # block (positions nfull*BS..P-1, which slots keep writing
            # into) is copied per admission from a template block.
            nfull, rem = divmod(P, self.block_size)
            need = nfull + (1 if rem else 0)
            # The old prefix's blocks count as available (they're about to
            # be dropped), but only free them once the new one fits.
            if len(self._free_blocks) + self._prefix_nblocks < need + 1:
                raise ValueError(
                    f"prefix needs {need} KV blocks; pool has only "
                    f"{len(self._free_blocks) + self._prefix_nblocks} "
                    "reclaimable (>= 1 must remain for requests)"
                )
            _drop_paged_prefix()
            blocks = [self._free_blocks.pop() for _ in range(need)]
            self._prefix_shared = blocks[:nfull]
            self._prefix_tmpl = blocks[nfull] if rem else None
            self._prefix_nblocks = need
            self._bt_dirty = True
            self.prefix_tokens = tokens
            self.prefix_len = P
            self._prefix_rows = None
            self._recompute_prefix_pool()
            return
        w = {**self.executor._weight_args(), **(self.params or {})}
        ids = np.zeros((self.slots, P), np.int32)
        ids[0] = tokens
        env = dict(w)
        env[self.in_ids["input_ids"]] = jnp.asarray(ids)
        env[self.in_ids["past_lens"]] = jnp.zeros((self.slots,), jnp.int32)
        env[self.in_ids["position_ids"]] = jnp.broadcast_to(
            jnp.arange(P, dtype=jnp.int32)[None], (self.slots, P)
        )
        for nid, c in zip(self.cache_ids, self.caches):
            env[nid] = jnp.zeros_like(c)
        self._feed_recent_dummies(env)
        self._feed_last_pos(env, np.full(self.slots, P - 1, np.int32))

        def prefill(e):
            outs = self.executor.trace(e, self.out_ids)
            # Slot 0's first P cache rows are the prefix KV. The cache
            # position axis is rank-dependent: ndim-2 (4D head-major and
            # scale buffers keep cap at dim 2; 3D cat caches at dim 1).
            return [
                p[(slice(0, 1),) + (slice(None),) * (p.ndim - 3)
                  + (slice(0, P),)]
                for p in outs[1:]
            ]

        self._prefix_rows = jax.jit(prefill)(env)
        self.prefix_tokens = tokens
        self.prefix_len = P

    def _recompute_prefix_pool(self):
        """Write the prefix KV rows into the reserved prefix blocks: at
        set_shared_prefix time, and again after restart()/fail_inflight()
        zero the pool (the flat path keeps prefix rows in a separate
        device buffer; the paged prefix LIVES in the pool)."""
        if not (self.paged and self.prefix_tokens):
            return
        tokens = self.prefix_tokens
        P = len(tokens)
        blocks = list(self._prefix_shared)
        if self._prefix_tmpl is not None:
            blocks.append(self._prefix_tmpl)
        bt = np.zeros_like(self.block_table)
        bt[0, : len(blocks)] = blocks
        ids = np.zeros((self.slots, P), np.int32)
        ids[0] = tokens
        w = {**self.executor._weight_args(), **(self.params or {})}
        env = dict(w)
        env[self._bt_nid] = jnp.asarray(bt)
        env[self.in_ids["input_ids"]] = jnp.asarray(ids)
        env[self.in_ids["past_lens"]] = jnp.zeros((self.slots,), jnp.int32)
        env[self.in_ids["position_ids"]] = jnp.broadcast_to(
            jnp.arange(P, dtype=jnp.int32)[None], (self.slots, P)
        )
        for nid, c in zip(self.cache_ids, self.caches):
            env[nid] = c
        self._feed_last_pos(env, np.full(self.slots, P - 1, np.int32))
        outs = self.executor.run(env, self.out_ids, donate=self.cache_ids)
        self.caches = list(outs[1:])

    def _admit_with_prefix(self, admissions):
        P = self.prefix_len
        # Validated at submit(); keep a defensive re-check so a prefix
        # change between submit and admission can't mis-stamp rows.
        suffixes = []
        for slot, req in admissions:
            if (len(req.prompt) <= P
                    or req.prompt[:P] != self.prefix_tokens):
                raise ValueError(
                    "with a shared prefix set, every prompt must extend it "
                    f"by >= 1 token (request {req.request_id})"
                )
            suffixes.append((slot, req, req.prompt[P:]))
        T = self._round_up(max(len(s) for _, _, s in suffixes))
        fn = self._prefix_prefill.get(T)
        if fn is None:
            fn = self._build_batch_prefill(T, prefixed=True)
            self._prefix_prefill[T] = fn
        packed = np.zeros((self.slots, T + 2), np.int32)
        for slot, req, suf in suffixes:
            packed[slot, : len(suf)] = suf
            packed[slot, T] = 1
            packed[slot, T + 1] = len(suf) - 1
        self._bt_sync()
        w = {**self.executor._weight_args(), **(self.params or {})}
        if self.paged:
            # Admission table (non-admitted rows -> garbage block 0) plus
            # each admitted slot's first OWN block — the target of the
            # partial-boundary template copy inside the prefill body.
            abt = np.zeros_like(self.block_table)
            first_own = np.zeros(self.slots, np.int32)
            ns = len(self._prefix_shared)
            for slot, _req in admissions:
                abt[slot] = self.block_table[slot]
                first_own[slot] = self.block_table[slot, ns]
            w[self._bt_nid] = jnp.asarray(abt)
            sel, self.caches = fn(
                w, self.caches, packed, jnp.asarray(first_own)
            )
        else:
            sel, self.caches = fn(w, self.caches, packed, self._prefix_rows)
        self.caches = list(self.caches)
        sel = np.asarray(sel)
        now = time.perf_counter()
        for slot, req in admissions:
            if self.greedy_on_device:
                tok = int(sel[slot])
            else:
                tok = int(self._host_sample(sel[slot][None])[0])
            req.first_token_at = now
            req.generated.append(tok)
            self.slot_req[slot] = req
            self.slot_len[slot] = len(req.prompt)
            self.slot_last_tok[slot] = tok
            self._maybe_finish(slot, tok)

    def _build_chunk_prefill(self):
        """One fixed-shape executable processing a [slots, bucket] prompt
        chunk at per-slot offsets against the LIVE caches (non-admitted
        rows merged back untouched, so chunked admission interleaves with
        active decode slots)."""
        executor = self.executor
        in_ids = self.in_ids
        cache_ids = self.cache_ids
        out_ids = self.out_ids
        slots = self.slots
        T = self.prefill_bucket

        def fn(weights: Dict, caches, ids, lens, admit_mask, last_idx):
            env = dict(weights)
            env[in_ids["input_ids"]] = ids
            env[in_ids["past_lens"]] = lens
            env[in_ids["position_ids"]] = (
                lens[:, None] + jnp.arange(T, dtype=jnp.int32)[None]
            )
            self._feed_last_pos(env, last_idx)
            for nid, c in zip(cache_ids, caches):
                env[nid] = c
            self._feed_recent_dummies(env)
            outs = executor.trace(env, out_ids)
            merged = [
                jnp.where(
                    admit_mask.reshape((slots,) + (1,) * (c.ndim - 1)), p, c
                )
                for c, p in zip(caches, outs[1:])
            ]
            sel = (
                outs[0][:, 0] if self.last_pos_id is not None
                else outs[0][jnp.arange(slots), last_idx]
            )
            return sel, merged

        return jax.jit(fn, donate_argnums=(1,))

    def _admit_chunked(self, admissions):
        chunk = self.prefill_bucket
        if self._chunk_prefill_fn is None:
            self._chunk_prefill_fn = self._build_chunk_prefill()
        fn = self._chunk_prefill_fn
        w = {**self.executor._weight_args(), **(self.params or {})}
        n_chunks = -(-max(len(r.prompt) for _, r in admissions) // chunk)
        final_sel = {}
        for c in range(n_chunks):
            ids = np.zeros((self.slots, chunk), np.int32)
            lens = np.zeros(self.slots, np.int32)
            admit = np.zeros(self.slots, bool)
            last_idx = np.zeros(self.slots, np.int32)
            finals = []
            for slot, req in admissions:
                seg = req.prompt[c * chunk : (c + 1) * chunk]
                if not seg:
                    continue
                ids[slot, : len(seg)] = seg
                lens[slot] = c * chunk
                admit[slot] = True
                if (c + 1) * chunk >= len(req.prompt):
                    last_idx[slot] = len(seg) - 1
                    finals.append(slot)
            sel, self.caches = fn(w, self.caches, ids, lens, admit, last_idx)
            self.caches = list(self.caches)
            if finals:
                sel = np.asarray(sel)
                for slot in finals:
                    final_sel[slot] = sel[slot]
        now = time.perf_counter()
        for slot, req in admissions:
            s = final_sel[slot]
            if self.greedy_on_device:
                tok = int(s)
            else:
                tok = int(self._host_sample(s[None])[0])
            req.first_token_at = now
            req.generated.append(tok)
            self.slot_req[slot] = req
            self.slot_len[slot] = len(req.prompt)
            self.slot_last_tok[slot] = tok
            self._maybe_finish(slot, tok)

    def _admit(self, admissions):
        """Prefill + insert a batch of (slot, request) pairs in ONE execute."""
        # Admission changes slot state: host bookkeeping becomes
        # authoritative, so the device-side token/length chain resets.
        self._dev_state = None
        if self.paged:
            # Reserve each admission's full block budget up front; a short
            # pool re-queues the request (FIFO-fair: once one admission
            # can't be served, everything behind it waits too).
            kept = []
            for idx, (slot, req) in enumerate(admissions):
                need = self._blocks_needed(len(req.prompt), req.max_new_tokens)
                if not self._reserve_blocks(slot, need):
                    for _, r2 in reversed(admissions[idx:]):
                        self.queue.appendleft(r2)
                    break
                kept.append((slot, req))
            admissions = kept
            if not admissions:
                return
        if self._adapter_nid is not None:
            # Per-slot adapter selection must be current BEFORE the prefill
            # executes (the admitted prompt runs under its adapter).
            for slot, req in admissions:
                self.slot_adapter[slot] = req.adapter_id
            self.params[self._adapter_nid] = jnp.asarray(self.slot_adapter)
        if self.prefix_tokens is not None:
            self._admit_with_prefix(admissions)
            return
        if self.chunked_prefill:
            self._admit_chunked(admissions)
            return
        T = self._round_up(max(len(r.prompt) for _, r in admissions))
        fn = self._batch_prefill.get(T)
        if fn is None:
            fn = self._build_batch_prefill(T)
            self._batch_prefill[T] = fn
        packed = np.zeros((self.slots, T + 2), np.int32)
        for slot, req in admissions:
            packed[slot, : len(req.prompt)] = req.prompt
            packed[slot, T] = 1
            packed[slot, T + 1] = len(req.prompt) - 1
        self._bt_sync()
        w = {**self.executor._weight_args(), **(self.params or {})}
        if self.paged:
            # The admission forward runs EVERY slot row (non-admitted rows
            # carry dummy prompts at past_lens=0). In slot-major caches a
            # post-hoc merge discards their garbage writes; with a shared
            # pool the garbage must be steered away up front — the
            # admission executes with a table whose non-admitted rows all
            # point at the reserved garbage block 0.
            abt = np.zeros_like(self.block_table)
            for slot, _ in admissions:
                abt[slot] = self.block_table[slot]
            w[self._bt_nid] = jnp.asarray(abt)
        sel, self.caches = fn(w, self.caches, packed)
        self.caches = list(self.caches)
        sel = np.asarray(sel)
        now = time.perf_counter()
        for slot, req in admissions:
            if self.greedy_on_device:
                tok = int(sel[slot])
            else:
                tok = int(self._host_sample(sel[slot][None])[0])
            req.first_token_at = now
            req.generated.append(tok)
            self.slot_req[slot] = req
            self.slot_len[slot] = len(req.prompt)
            self.slot_last_tok[slot] = tok
            self._maybe_finish(slot, tok)

    def _prefill(self, req: Request, slot: int):
        self._admit([(slot, req)])

    def _maybe_finish(self, slot: int, tok: int):
        req = self.slot_req[slot]
        if req is None:
            return
        if (req.eos_id is not None and tok == req.eos_id) or len(
            req.generated
        ) >= req.max_new_tokens:
            req.done = True
            req.finished_at = time.perf_counter()
            self._finish(req)
            self.slot_req[slot] = None
            self.slot_len[slot] = 0
            self._release_blocks(slot)

    def has_pending_results(self) -> bool:
        return self._inflight is not None

    def step(self):
        t_step = time.perf_counter()
        self._expire_and_cancel()
        try:
            self._step_inner()
        finally:
            self._last_step_s = time.perf_counter() - t_step

    def _step_inner(self):
        # 1. Admit queued requests into free slots — ALL of them in one
        #    fused prefill+merge execute (see _build_batch_prefill). Slot
        #    state must be current, so any in-flight dispatch drains first.
        if self.queue and (
            any(r is None for r in self.slot_req) or self._inflight is not None
        ):
            self._drain_inflight()
            admissions = []
            for slot in range(self.slots):
                if self.slot_req[slot] is None and self.queue:
                    admissions.append((slot, self.queue.popleft()))
            if admissions:
                self._admit(admissions)
                self._dev_state = None  # host state is now authoritative
        active = [s for s in range(self.slots) if self.slot_req[s] is not None]
        if not active:
            self._drain_inflight()
            return
        # 2a. Fused multi-step decode when enabled and there is KV room.
        #     Margin 2k when pipelining: host lens lag one dispatch.
        k = self.steps_per_dispatch
        margin = 2 * k if self.pipeline_dispatch else k
        if (
            self._multi_step is not None
            and k > 1
            and all(self.slot_len[s] + margin < self.capacity - 1 for s in active)
        ):
            if self.pipeline_dispatch and any(
                req.max_new_tokens - len(req.generated) > k
                for req in (self.slot_req[s] for s in active)
                if req is not None
            ):
                # Double-buffer: launch the next dispatch first, then consume
                # the previous one while the device works on the new one.
                prev, self._inflight = self._inflight, None
                self._issue_multi(from_host=self._dev_state is None)
                self._drain_record(prev)
                return
            # Serial fused dispatch (tail of a request, or pipelining off).
            # Chain token/length state on device even here: a host->device
            # transfer costs a tunnel round trip (~15-20ms each on remote
            # runtimes); host state is only re-materialized after admissions
            # (which reset _dev_state).
            self._drain_inflight()
            # The drain may have finished requests (host bookkeeping lags
            # the device by one dispatch when one was in flight) — the
            # active set computed before it can hold freed slots.
            active = [
                s for s in range(self.slots) if self.slot_req[s] is not None
            ]
            if not active:
                return
            d = 1
            if self.dispatches_per_drain > 1:
                remaining = min(
                    self.slot_req[s].max_new_tokens
                    - len(self.slot_req[s].generated)
                    for s in active
                )
                room = min(
                    (self.capacity - 2 - int(self.slot_len[s])) // k
                    for s in active
                )
                d = max(1, min(self.dispatches_per_drain,
                               -(-remaining // k), room))
            recs = []
            for _ in range(d):
                self._issue_multi(from_host=self._dev_state is None)
                recs.append(self._inflight)
                self._inflight = None
            for rec in recs:
                self._drain_record(rec)
            return
        # 2b. One decode step for every slot (inactive slots compute garbage
        #    into their own cache rows, overwritten at next admission).
        self._drain_inflight()
        feed = {
            self.in_ids["input_ids"]: self.slot_last_tok[:, None].copy(),
            self.in_ids["past_lens"]: self.slot_len.copy(),
            self.in_ids["position_ids"]: self.slot_len[:, None].copy(),
        }
        for nid, cache in zip(self.cache_ids, self.caches):
            feed[nid] = cache
        self._bt_sync()
        self._feed_last_pos(feed)
        if self.params:
            feed.update(self.params)
        if self.deferred_kv:
            # One-step recent window, committed right away (the legacy
            # per-step path — the fused dispatch is where deferral pays).
            feed[self.step_t_id] = np.zeros(1, np.int32)
            for nid, (h, d, dt) in zip(self.recent_ids, self._recent_alloc):
                feed[nid] = jnp.zeros((self.slots, h, 1, d), dt)
            outs = self.executor.run(
                feed, self.out_ids + self.recent_out_ids,
                donate=self.cache_ids,
            )
            n_c = len(self.cache_ids)
            if self._commit_jit is None:
                self._commit_jit = jax.jit(
                    lambda caches, recents, lens0: tuple(
                        self._commit_recent(list(caches), recents, lens0)
                    ),
                    donate_argnums=(0,),
                )
            self.caches = list(self._commit_jit(
                tuple(outs[1 : 1 + n_c]), tuple(outs[1 + n_c :]),
                jnp.asarray(self.slot_len),
            ))
        else:
            outs = self.executor.run(feed, self.out_ids, donate=self.cache_ids)
            self.caches = list(outs[1:])
        if self.greedy_on_device:
            toks = np.asarray(outs[0])[active, 0]
        else:
            logits = np.asarray(outs[0])[:, 0]  # [slots, V]
            toks = self._host_sample(logits[active])
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
