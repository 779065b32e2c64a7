"""Headline benchmark: GPT-2 int8 autoregressive decode on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no absolute numbers (BASELINE.md), and its Rust
toolchain is not present in this image, so the baseline is self-measured:
the same int8 GPT-2 decode executed by this engine on the host CPU backend
(XLA-CPU fallback kernels) — the closest available stand-in for the
reference's CPU inference. vs_baseline = TPU tokens/s / CPU tokens/s.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import numpy as np

PROMPT_LEN = 128
DECODE_TOKENS = 32
BATCH = 1
BUCKET = 128


def run_decode(n_layer=12):
    from rten_tpu.generate import Generator, GeneratorConfig
    from rten_tpu.models import gpt2

    cfg = gpt2.GPT2Config(n_layer=n_layer)
    weights = gpt2.random_weights(cfg, seed=0)
    model = gpt2.load(cfg, weights, quantize="int8")
    rng = np.random.default_rng(0)
    prompt = rng.integers(0, cfg.vocab_size, (BATCH, PROMPT_LEN)).astype(np.int32)
    gen = Generator(
        model,
        prompt,
        GeneratorConfig(bucket_size=BUCKET, max_seq_len=PROMPT_LEN + DECODE_TOKENS + BUCKET),
    )
    gen.generate(DECODE_TOKENS)
    m = gen.metrics
    return m.tokens_per_sec(skip_warmup=2), m.ttft_s()


def cpu_baseline() -> float:
    """Same workload on the CPU backend, in a subprocess (fresh JAX)."""
    code = (
        "import os; os.environ['JAX_PLATFORMS']='cpu';"
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import bench, json;"
        "tps, ttft = bench.run_decode(n_layer=12);"
        "print(json.dumps({'tps': tps}))"
    )
    try:
        out = subprocess.run(
            [sys.executable, "-c", code],
            cwd=os.path.dirname(os.path.abspath(__file__)),
            capture_output=True, text=True, timeout=1800,
        )
        for line in reversed(out.stdout.strip().splitlines()):
            try:
                return float(json.loads(line)["tps"])
            except (json.JSONDecodeError, KeyError):
                continue
    except Exception:
        pass
    return 0.0


def main():
    tps, ttft = run_decode()
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cpu_baseline.json")
    cpu_tps = 0.0
    if os.path.exists(cache):
        try:
            cpu_tps = float(json.load(open(cache))["tps"])
        except Exception:
            cpu_tps = 0.0
    if not cpu_tps:
        cpu_tps = cpu_baseline()
        if cpu_tps:
            json.dump({"tps": cpu_tps}, open(cache, "w"))
    vs = tps / cpu_tps if cpu_tps else 0.0
    print(
        json.dumps(
            {
                "metric": "gpt2_int8_decode_tokens_per_sec_per_chip",
                "value": round(tps, 2),
                "unit": "tokens/s",
                "vs_baseline": round(vs, 3),
                "ttft_ms": round((ttft or 0) * 1e3, 1),
                "baseline_cpu_tokens_per_sec": round(cpu_tps, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
