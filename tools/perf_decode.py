"""Decode-path perf harness (round-2 headline work).

Measures, in ONE process on the real TPU:
  1. standalone single decode step (donated caches), ms
  2. scan-fused k-step decode, ms per iter
with optional jax.profiler device traces parsed via tensorboard_plugin_profile
to attribute time to ops.

Usage: python tools/perf_decode.py [--trace] [--variant current|stacked]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

N_LAYER = 12
SLOTS = 16
CAPACITY = 256
K_STEPS = 32


def build():
    from rten_tpu.model import Model, ModelOptions
    from rten_tpu.models import gpt2
    from rten_tpu.quantize_pass import quantize_dynamic

    cfg = gpt2.GPT2Config(n_layer=N_LAYER)
    weights = gpt2.random_weights(cfg, seed=0)
    graph = gpt2.build_graph_static_cache(cfg, weights, capacity=CAPACITY)
    quantize_dynamic(graph)
    model = Model(graph, ModelOptions(optimize=True))
    return cfg, model


def setup(model):
    g = model.graph
    ex = model.executor
    cache_ids = []
    cache_shapes = []
    for nid in g.input_ids:
        name = g.node_name(nid)
        if name.startswith("past_key_values."):
            node = g.nodes[nid]
            cache_ids.append(nid)
            cache_shapes.append(
                ((SLOTS,) + tuple(node.shape[1:]), node.dtype.np_dtype)
            )
    in_ids = {n: g.find_node(n) for n in ("input_ids", "past_lens", "position_ids")}
    out_ids = [g.find_node("next_token")] + [
        g.find_node("present." + g.node_name(n)[len("past_key_values."):])
        for n in cache_ids
    ]
    caches = [jnp.zeros(s, d) for s, d in cache_shapes]
    return ex, in_ids, cache_ids, out_ids, caches


def bench_standalone(ex, in_ids, cache_ids, out_ids, caches, iters=50):
    lens = jnp.full((SLOTS,), 128, jnp.int32)
    toks = jnp.ones((SLOTS,), jnp.int32)

    def run_once(caches, toks, lens):
        feed = {
            in_ids["input_ids"]: np.asarray(toks)[:, None],
            in_ids["past_lens"]: np.asarray(lens),
            in_ids["position_ids"]: np.asarray(lens)[:, None],
        }
        for nid, c in zip(cache_ids, caches):
            feed[nid] = c
        outs = ex.run(feed, out_ids, donate=cache_ids)
        return outs[0], list(outs[1:])

    # Warmup/compile.
    tok, caches = run_once(caches, toks, lens)
    jax.block_until_ready(caches)
    t0 = time.perf_counter()
    for _ in range(iters):
        tok, caches = run_once(caches, toks, lens)
    jax.block_until_ready(caches)
    dt = (time.perf_counter() - t0) / iters * 1e3
    return dt, caches


def build_scan(ex, in_ids, cache_ids, out_ids, k):
    def fn(weights, caches, toks, lens):
        def body(carry, _):
            caches, toks, lens = carry
            env = dict(weights)
            env[in_ids["input_ids"]] = toks[:, None]
            env[in_ids["past_lens"]] = lens
            env[in_ids["position_ids"]] = lens[:, None]
            for nid, c in zip(cache_ids, caches):
                env[nid] = c
            outs = ex.trace(env, out_ids)
            new_toks = outs[0][:, 0].astype(jnp.int32)
            return (tuple(outs[1:]), new_toks, lens + 1), new_toks

        (caches, toks, lens), tok_seq = jax.lax.scan(
            body, (tuple(caches), toks, lens), None, length=k
        )
        return caches, tok_seq.T

    return jax.jit(fn, donate_argnums=(1,))


def bench_scan(ex, in_ids, cache_ids, out_ids, caches, k=K_STEPS, dispatches=6):
    fn = build_scan(ex, in_ids, cache_ids, out_ids, k)
    lens = jnp.full((SLOTS,), 128, jnp.int32)
    toks = jnp.ones((SLOTS,), jnp.int32)
    w = ex._weight_args()
    caches, tok_seq = fn(w, caches, toks, lens)
    jax.block_until_ready(tok_seq)
    t0 = time.perf_counter()
    for _ in range(dispatches):
        caches, tok_seq = fn(w, caches, toks, lens)
    jax.block_until_ready(tok_seq)
    dt = (time.perf_counter() - t0) / dispatches / k * 1e3
    return dt, caches, fn, w


def parse_trace(trace_dir):
    """Summarize per-op device time from the Chrome trace json (the
    tensorboard_plugin_profile python APIs are broken by a protobuf version
    conflict in this image; the json.gz has everything we need)."""
    import collections

    traces = glob.glob(
        os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True
    )
    if not traces:
        print("  (no trace.json.gz found)")
        return
    t = json.load(gzip.open(sorted(traces)[-1]))
    events = t["traceEvents"]
    pids = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
    device_pids = {p for p, n in pids.items() if "TPU" in n.upper()}
    agg = collections.defaultdict(float)
    cnt = collections.defaultdict(int)
    device_total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        if e["pid"] in device_pids:
            name = e.get("name", "")[:90]
            agg[name] += e.get("dur", 0)
            cnt[name] += 1
    for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:30]:
        print(f"  {dur/1e3:10.3f} ms  n={cnt[name]:>5}  {name}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", action="store_true")
    ap.add_argument("--skip-standalone", action="store_true")
    args = ap.parse_args()

    print("devices:", jax.devices(), flush=True)
    cfg, model = build()
    ex, in_ids, cache_ids, out_ids, caches = setup(model)

    if not args.skip_standalone:
        dt, caches = bench_standalone(ex, in_ids, cache_ids, out_ids, caches)
        print(f"standalone step: {dt:.3f} ms", flush=True)

    dt_scan, caches, fn, w = bench_scan(ex, in_ids, cache_ids, out_ids, caches)
    print(f"scan step ({K_STEPS}): {dt_scan:.3f} ms/iter", flush=True)

    if args.trace:
        trace_dir = "/tmp/jaxtrace_scan"
        lens = jnp.full((SLOTS,), 128, jnp.int32)
        toks = jnp.ones((SLOTS,), jnp.int32)
        with jax.profiler.trace(trace_dir):
            caches, tok_seq = fn(w, caches, toks, lens)
            jax.block_until_ready(tok_seq)
        print("scan trace:", flush=True)
        parse_trace(trace_dir)


if __name__ == "__main__":
    main()
