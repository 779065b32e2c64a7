"""Trace the serving decode dispatch and attribute device time per op.

Builds the bench engine (env-tunable like bench.py), traces a few fused
k-step dispatches with jax.profiler, and prints:
  - total device busy time per step (XLA Modules lane)
  - per-op leaf attribution from the XLA Ops lane (events whose span does
    not contain another event on the same lane), aggregated by op name

Usage: RTEN_BENCH_SLOTS=32 python tools/profile_serving.py [--k 64]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("RTEN_JAX_CACHE", "1") != "0":
    jax.config.update("jax_compilation_cache_dir", "/tmp/rten_jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import bench  # noqa: E402


def lane_events(trace_dir):
    traces = glob.glob(
        os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True
    )
    t = json.load(gzip.open(sorted(traces)[-1]))
    events = t["traceEvents"]
    pids, tids = {}, {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
        elif e.get("ph") == "M" and e.get("name") == "thread_name":
            tids[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
    device_pids = {p for p, n in pids.items() if "TPU" in n.upper()}
    lanes = {}
    for e in events:
        if e.get("ph") != "X" or e["pid"] not in device_pids:
            continue
        key = (e["pid"], e.get("tid"))
        lanes.setdefault(tids.get(key, str(key)), []).append(e)
    return lanes


def leaf_times(evts):
    """Aggregate leaf-event durations by (cleaned) name on one lane."""
    evts = sorted(evts, key=lambda e: (e["ts"], -e.get("dur", 0)))
    agg = {}
    # A leaf is an event that no later-starting event nests inside.
    for i, e in enumerate(evts):
        end = e["ts"] + e.get("dur", 0)
        has_child = False
        for f in evts[i + 1:]:
            if f["ts"] >= end:
                break
            if f["ts"] >= e["ts"] and f["ts"] + f.get("dur", 0) <= end:
                has_child = True
                break
        if not has_child:
            name = re.sub(r"[.\d]+$", "", e.get("name", "?"))
            a = agg.setdefault(name, [0.0, 0])
            a[0] += e.get("dur", 0)
            a[1] += 1
    return agg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=int(os.environ.get("RTEN_BENCH_K", "64")))
    ap.add_argument("--dispatches", type=int, default=2)
    args = ap.parse_args()

    rng_prompts = __import__("numpy").random.default_rng(0)
    cfg, engine = bench.build_engine(steps_per_dispatch=args.k)
    prompts = [
        rng_prompts.integers(0, cfg.vocab_size, bench.PROMPT_LEN).tolist()
        for _ in range(bench.SLOTS)
    ]
    for p in prompts:
        engine.submit(p, max_new_tokens=2)
    engine.run()  # warmup/compile
    fit = (bench.CAPACITY - bench.PROMPT_LEN - 2) // args.k
    args.dispatches = max(1, min(args.dispatches, fit))
    for p in prompts:
        engine.submit(p, max_new_tokens=args.k * args.dispatches + 2)
    engine.step()  # admit

    trace_dir = tempfile.mkdtemp(prefix="rten_prof_")
    with jax.profiler.trace(trace_dir):
        for _ in range(args.dispatches):
            engine._issue_multi(from_host=engine._dev_state is None)
            rec, engine._inflight = engine._inflight, None
            jax.block_until_ready(rec[0])

    steps = args.dispatches * args.k
    lanes = lane_events(trace_dir)
    for name, evts in sorted(lanes.items()):
        total = sum(e.get("dur", 0) for e in evts)
        print(f"lane {name!r}: {len(evts)} events, {total/steps:.1f} us/step")
    ops_lane = None
    for name in lanes:
        if "op" in name.lower() and "module" not in name.lower():
            ops_lane = name
    if ops_lane:
        agg = leaf_times(lanes[ops_lane])
        rows = sorted(agg.items(), key=lambda kv: -kv[1][0])
        print(f"\nper-op leaf device time (us/step, lane {ops_lane!r}):")
        tot = sum(v[0] for v in agg.values())
        for name, (dur, cnt) in rows[:30]:
            print(
                f"  {dur/steps:9.2f} us  {cnt/steps:6.1f} calls  "
                f"{100*dur/tot:5.1f}%  {name}"
            )
        print(f"  total leaf: {tot/steps:.1f} us/step over {steps} steps")
        # closed_call = Pallas kernel launches; cluster durations to
        # attribute time to individual kernels (names are all identical).
        durs = sorted(
            e.get("dur", 0.0)
            for e in lanes[ops_lane]
            if e.get("name", "").startswith("closed_call")
        )
        if durs:
            print("\nclosed_call duration clusters (us):")
            clusters = []
            for d in durs:
                if clusters and d <= clusters[-1][1] * 1.25:
                    lo, hi, n = clusters[-1]
                    clusters[-1] = (lo, max(hi, d), n + 1)
                else:
                    clusters.append((d, d, 1))
            for lo, hi, n in clusters:
                print(f"  {lo:7.1f}-{hi:7.1f} us  x{n/steps:7.2f}/step  "
                      f"= {n * (lo + hi) / 2 / steps:7.1f} us/step")


if __name__ == "__main__":
    main()
