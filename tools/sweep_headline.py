#!/usr/bin/env python
"""Sweep headline-bench knobs (slots, k, dispatches-per-drain, KV dtype)
as fresh subprocesses and collect the JSON lines.

Each configuration runs in its own process because jit executables are
cached per-process and big (slots, cap, k) combos would otherwise
accumulate compile state. The hard config and the CPU baseline are
skipped (RTEN_BENCH_HARD=0, RTEN_BENCH_SKIP_CPU=1) so each point costs
one warmup + one timed wave.

Usage:
  python tools/sweep_headline.py --slots 32,64,96 --k 64 --d 1,2
  python tools/sweep_headline.py --kv int8,bf16 --slots 96
"""

from __future__ import annotations

import argparse
import itertools
import json
import os
import subprocess
import sys

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_point(env_over: dict, timeout: int) -> dict:
    env = dict(os.environ)
    env.update(
        RTEN_BENCH_HARD="0",
        RTEN_BENCH_SKIP_CPU="1",
        RTEN_BENCH_TRACE=env_over.pop("RTEN_BENCH_TRACE", "0"),
    )
    env.update(env_over)
    try:
        out = subprocess.run(
            [sys.executable, "bench.py"], cwd=_HERE, env=env,
            capture_output=True, text=True, timeout=timeout,
        )
        for line in out.stdout.splitlines():
            if line.startswith("{"):
                return json.loads(line)
        return {"error": (out.stderr or out.stdout)[-500:]}
    except subprocess.TimeoutExpired:
        return {"error": f"timeout {timeout}s"}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", default="96")
    ap.add_argument("--k", default="64")
    ap.add_argument("--d", default="1")
    ap.add_argument("--kv", default="int8")
    ap.add_argument("--timeout", type=int, default=3600)
    args = ap.parse_args()

    grid = itertools.product(
        args.slots.split(","), args.k.split(","),
        args.d.split(","), args.kv.split(","),
    )
    for slots, k, d, kv in grid:
        point = {"slots": slots, "k": k, "d": d, "kv": kv}
        r = run_point({
            "RTEN_BENCH_SLOTS": slots, "RTEN_BENCH_K": k,
            "RTEN_BENCH_D": d, "RTEN_BENCH_KV": kv,
        }, args.timeout)
        point.update({
            key: r[key] for key in (
                "value", "ttft_p50_ms", "roofline_fraction",
                "device_roofline_fraction", "error",
            ) if key in r
        })
        print(json.dumps(point), flush=True)


if __name__ == "__main__":
    main()
