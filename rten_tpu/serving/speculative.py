"""Speculative decoding for the continuous-batching engine.

A small DRAFT model proposes gamma tokens per slot; the TARGET model
verifies all of them in ONE S=gamma+1 forward against its static cache and
accepts the longest matching prefix (greedy acceptance: target argmax ==
draft token). Output tokens are exactly the target's greedy sequence —
speculation changes latency, never content.

TPU-native fit (no reference analog — rten has no serving stack at all):

* The slot caches are LENS-MASKED (`_slot_kv_update` writes at per-slot
  offsets; attention reads only `past_lens` rows), so REJECTION COSTS
  NOTHING: rows written past the accepted length are simply dead — no
  copy-back, no paged-cache bookkeeping. `lens` not advancing IS the
  rollback.
* One fused dispatch per round: draft catch-up step + gamma-step draft
  scan + target verify + vectorized acceptance all trace into a single
  XLA executable (remote runtimes pay per dispatch, not per op).
* Static shapes throughout: per-slot acceptance counts live in the lens
  vector; token outputs are a fixed [slots, gamma+1] block with a count.

Cache-sync invariant (per slot, before every dispatch):
  target cache holds L rows; `toks` (the pending token) is un-cached;
  draft cache holds L or L-1 rows — the only possibly-missing row is
  `prev` (the token at position L-1, missed when a full round was
  accepted). The dispatch always recomputes prev's row at L-1 first
  (idempotent when present: same token, same prefix, same KV).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .engine import ContinuousBatchingEngine, Request


class SpeculativeEngine(ContinuousBatchingEngine):
    """Greedy continuous batching with draft-model speculation.

    ``draft_model`` must share the target's vocabulary and be a
    static-cache serving graph (same builder family); both graphs must be
    non-deferred (``deferred_kv=False``). ``gamma`` draft tokens are
    verified per dispatch — per-dispatch output is 1..gamma+1 tokens/slot.
    """

    def __init__(self, model, draft_model, *, gamma: int = 4,
                 draft_params: Optional[Dict[int, object]] = None, **kw):
        kw.setdefault("greedy_on_device", True)
        # Refuse conflicting configuration instead of silently discarding
        # it (a user who passed a sampler would otherwise get greedy
        # output with no signal).
        if kw.pop("device_sampler", None) is not None:
            raise ValueError(
                "speculative decoding is greedy-only; device_sampler is "
                "not supported"
            )
        if kw.pop("steps_per_dispatch", 1) != 1:
            raise ValueError(
                "steps_per_dispatch is owned by speculation (use gamma)"
            )
        super().__init__(model, steps_per_dispatch=1, **kw)
        if self.deferred_kv:
            raise ValueError("speculative decoding needs deferred_kv=False")
        if self.last_pos_id is not None:
            # Verify steps need argmax at ALL gamma+1 positions; a
            # gather_last head emits one row per slot.
            raise ValueError(
                "speculative decoding needs gather_last=False graphs "
                "(the verify step consumes every position's logits)"
            )
        if self.paged:
            raise ValueError(
                "speculative decoding does not support paged-KV graphs"
            )
        if not self.greedy_on_device:
            raise ValueError("speculative decoding is greedy-only (needs "
                             "the graph's next_token output)")
        self.draft = draft_model
        self.gamma = int(gamma)
        self.draft_params = dict(draft_params) if draft_params else None
        dg = draft_model.graph
        if any(dg.node_name(n).startswith("recent.") for n in dg.input_ids):
            raise ValueError("draft graph must be built with deferred_kv=False")

        # Draft cache pool, discovered from the draft graph's IO exactly
        # like the target's.
        self.d_cache_names = [
            dg.node_name(n) for n in dg.input_ids
            if dg.node_name(n).startswith("past_key_values.")
        ]
        self.d_cache_ids = [dg.find_node(n) for n in self.d_cache_names]
        self._d_cache_alloc = []
        for nid in self.d_cache_ids:
            node = dg.nodes[nid]
            self._d_cache_alloc.append(
                (tuple(node.shape[1:]), node.dtype.np_dtype)
            )
        self.d_in_ids = {
            n: dg.find_node(n)
            for n in ("input_ids", "past_lens", "position_ids")
        }
        self.d_out_ids = [dg.find_node("next_token")] + [
            dg.find_node("present." + n[len("past_key_values."):])
            for n in self.d_cache_names
        ]
        if self.d_out_ids[0] is None:
            raise ValueError("draft graph lacks a next_token output")
        self.draft_caches = [
            jnp.zeros((self.slots,) + tail, dt)
            for tail, dt in self._d_cache_alloc
        ]
        # Last ACCEPTED token per slot (the catch-up row's token).
        self.slot_prev_tok = np.zeros(self.slots, np.int32)
        self._spec_fn = self._build_spec_step()
        self._draft_prefill: Dict[int, object] = {}
        # Speculation telemetry.
        self.spec_rounds = 0
        self.spec_accepted = 0

    # -- fused speculate+verify dispatch -----------------------------------

    def _build_spec_step(self):
        t_exec = self.executor
        d_exec = self.draft.executor
        t_in, d_in = self.in_ids, self.d_in_ids
        t_cache_ids, d_cache_ids = self.cache_ids, self.d_cache_ids
        t_out_ids, d_out_ids = self.out_ids, self.d_out_ids
        g = self.gamma
        slots = self.slots

        def draft_step(w_d, caches_d, toks, lens):
            env = dict(w_d)
            env[d_in["input_ids"]] = toks[:, None]
            env[d_in["past_lens"]] = lens
            env[d_in["position_ids"]] = lens[:, None]
            for nid, c in zip(d_cache_ids, caches_d):
                env[nid] = c
            outs = d_exec.trace(env, d_out_ids)
            return outs[0][:, 0].astype(jnp.int32), tuple(outs[1:])

        def fn(w_t, w_d, caches_t, caches_d, toks, prevs, lens):
            # 1) Draft catch-up: (re)write prev's KV row at lens-1.
            #    Idempotent when the row exists; fills the one row the
            #    draft misses after a fully-accepted round.
            _, caches_d = draft_step(
                w_d, caches_d, prevs, jnp.maximum(lens - 1, 0)
            )
            # 2) gamma-step draft scan from the pending token.
            def body(carry, _):
                tok, ln, cd = carry
                nxt, cd = draft_step(w_d, cd, tok, ln)
                return (nxt, ln + 1, cd), nxt

            (_, _, caches_d), d_seq = jax.lax.scan(
                body, (toks, lens, tuple(caches_d)), None, length=g
            )
            d = d_seq.T  # [slots, gamma]

            # 3) Target verify: ONE S=gamma+1 forward over
            #    [pending | draft tokens]; writes gamma+1 rows per slot.
            ids = jnp.concatenate([toks[:, None], d], axis=1)
            env = dict(w_t)
            env[t_in["input_ids"]] = ids
            env[t_in["past_lens"]] = lens
            env[t_in["position_ids"]] = (
                lens[:, None] + jnp.arange(g + 1, dtype=jnp.int32)[None]
            )
            for nid, c in zip(t_cache_ids, caches_t):
                env[nid] = c
            outs = t_exec.trace(env, t_out_ids)
            t = outs[0].astype(jnp.int32)        # [slots, gamma+1] argmax
            caches_t = tuple(outs[1:])

            # 4) Greedy acceptance: longest prefix where target == draft.
            #    Since accepted positions agree, the OUTPUT tokens are just
            #    the target row `t`; count = a+1 per slot.
            match = (t[:, :g] == d).astype(jnp.int32)
            a = jnp.cumprod(match, axis=1).sum(axis=1)      # [slots] 0..g
            new_lens = lens + a + 1
            sl = jnp.arange(slots)
            new_toks = t[sl, a]
            new_prevs = jnp.where(a > 0, t[sl, jnp.maximum(a - 1, 0)], toks)
            return (caches_t, caches_d, new_toks, new_prevs, new_lens,
                    t, a + 1)

        return jax.jit(fn, donate_argnums=(2, 3))

    # -- admission ----------------------------------------------------------

    def _build_draft_prefill(self, T: int):
        """Draft-side batch prefill mirroring the target's: forward all
        slot rows, merge admitted rows into the donated draft caches."""
        d_exec = self.draft.executor
        d_in = self.d_in_ids
        d_cache_ids = self.d_cache_ids
        d_out_ids = self.d_out_ids
        slots = self.slots

        def fn(w_d, caches, packed):
            ids = packed[:, :T]
            admit_mask = packed[:, T] != 0
            env = dict(w_d)
            env[d_in["input_ids"]] = ids
            env[d_in["past_lens"]] = jnp.zeros((slots,), jnp.int32)
            env[d_in["position_ids"]] = jnp.broadcast_to(
                jnp.arange(T, dtype=jnp.int32)[None], (slots, T)
            )
            for nid, c in zip(d_cache_ids, caches):
                env[nid] = jnp.zeros_like(c)
            outs = d_exec.trace(env, d_out_ids)
            m = admit_mask[:, None, None, None]
            return [jnp.where(m, p, c) for c, p in zip(caches, outs[1:])]

        return jax.jit(fn, donate_argnums=(1,))

    def _admit(self, admissions):
        super()._admit(admissions)  # target prefill + first token
        if not admissions:
            return
        T = self._round_up(max(len(r.prompt) for _, r in admissions))
        fn = self._draft_prefill.get(T)
        if fn is None:
            fn = self._build_draft_prefill(T)
            self._draft_prefill[T] = fn
        packed = np.zeros((self.slots, T + 1), np.int32)
        for slot, req in admissions:
            packed[slot, : len(req.prompt)] = req.prompt
            packed[slot, T] = 1
        w_d = {**self.draft.executor._weight_args(),
               **(self.draft_params or {})}
        self.draft_caches = list(fn(w_d, self.draft_caches, packed))
        for slot, req in admissions:
            self.slot_prev_tok[slot] = req.prompt[-1]

    def submit(self, prompt, max_new_tokens: int = 64, eos_id=None,
               timeout_s=None) -> Request:
        # Tighter KV bound than the base: every dispatch writes gamma+1
        # target rows, and the final dispatch may start at
        # len(prompt)+max_new-1 cached rows.
        if len(prompt) + max_new_tokens + self.gamma + 1 > self.capacity:
            raise ValueError(
                f"prompt ({len(prompt)}) + max_new ({max_new_tokens}) + "
                f"gamma+1 ({self.gamma + 1}) exceeds KV capacity "
                f"{self.capacity} (speculative dispatches need headroom)"
            )
        return super().submit(prompt, max_new_tokens, eos_id, timeout_s)

    # -- decode --------------------------------------------------------------

    def _step_inner(self):
        if self.queue and any(r is None for r in self.slot_req):
            admissions = []
            for slot in range(self.slots):
                if self.slot_req[slot] is None and self.queue:
                    admissions.append((slot, self.queue.popleft()))
            if admissions:
                self._admit(admissions)
        active = [s for s in range(self.slots) if self.slot_req[s] is not None]
        if not active:
            return
        w_t = {**self.executor._weight_args(), **(self.params or {})}
        w_d = {**self.draft.executor._weight_args(),
               **(self.draft_params or {})}
        (caches_t, caches_d, toks, prevs, lens, t_seq, counts) = self._spec_fn(
            w_t, w_d, self.caches, self.draft_caches,
            jnp.asarray(self.slot_last_tok), jnp.asarray(self.slot_prev_tok),
            jnp.asarray(self.slot_len),
        )
        self.caches = list(caches_t)
        self.draft_caches = list(caches_d)
        t_seq = np.asarray(t_seq)
        counts = np.asarray(counts)
        toks = np.asarray(toks)
        prevs = np.asarray(prevs)
        lens = np.asarray(lens)
        self.steps += 1
        for slot in active:
            req = self.slot_req[slot]
            n = int(counts[slot])
            self.spec_rounds += 1  # one speculation round per active slot
            self.spec_accepted += n
            cut = min(n, req.max_new_tokens - len(req.generated))
            accepted = t_seq[slot, :cut]
            if req.eos_id is not None:
                hits = np.nonzero(accepted == req.eos_id)[0]
                if hits.size:
                    cut = int(hits[0]) + 1
                    accepted = accepted[:cut]
            req.generated.extend(int(x) for x in accepted)
            self.decode_tokens += cut
            if cut == n:
                # Full device advance: adopt the device-side state.
                self.slot_len[slot] = int(lens[slot])
                self.slot_last_tok[slot] = int(toks[slot])
                self.slot_prev_tok[slot] = int(prevs[slot])
            # else: request finishes below (max_new/eos cut) — slot resets.
            self._maybe_finish(slot, int(accepted[-1]) if cut else -1)

    def restart(self) -> List[Request]:
        requeued = super().restart()
        self.draft_caches = [
            jnp.zeros((self.slots,) + tail, dt)
            for tail, dt in self._d_cache_alloc
        ]
        self.slot_prev_tok[:] = 0
        return requeued

    def fail_inflight(self, error: str) -> List[Request]:
        failed = super().fail_inflight(error)
        self.draft_caches = [
            jnp.zeros((self.slots,) + tail, dt)
            for tail, dt in self._d_cache_alloc
        ]
        self.slot_prev_tok[:] = 0
        return failed

    def stats(self) -> Dict:
        s = super().stats()
        s["spec_rounds"] = self.spec_rounds
        s["spec_tokens_per_round"] = (
            self.spec_accepted / self.spec_rounds if self.spec_rounds else 0.0
        )
        return s
