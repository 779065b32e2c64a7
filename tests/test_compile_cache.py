"""Persistent compilation cache: executables land on disk and a fresh
process reuses them (the serving cold-start story on slow-compile
runtimes)."""

import os
import subprocess
import sys


def test_cache_populates_and_hits(tmp_path):
    d = str(tmp_path / "cc")
    code = """
import os, sys, time
sys.path.insert(0, %r)
os.environ["RTEN_COMPILE_CACHE"] = %r
os.environ["JAX_PLATFORMS"] = "cpu"
from rten_tpu.utils import honor_jax_platforms_env
honor_jax_platforms_env()
import jax
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import numpy as np
from rten_tpu.model import Model, ModelOptions
from rten_tpu.models import gpt2
cfg = gpt2.GPT2Config(vocab_size=64, n_positions=16, n_embd=32, n_layer=1, n_head=4)
m = gpt2.load(cfg, gpt2.random_weights(cfg, seed=0))
feed = {
    "input_ids": np.ones((1, 4), np.int32),
    "attention_mask": np.ones((1, 4), np.int32),
    "position_ids": np.arange(4, dtype=np.int32)[None],
}
for i in range(cfg.n_layer):
    z = np.zeros((1, cfg.n_head, 0, cfg.head_dim), np.float32)
    feed[f"past_key_values.{i}.key"] = z
    feed[f"past_key_values.{i}.value"] = z.copy()
t0 = time.perf_counter()
m.run(feed)
print("COMPILE_S", time.perf_counter() - t0)
""" % (os.path.dirname(os.path.dirname(os.path.abspath(__file__))), d)

    def run():
        out = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=300,
        )
        assert out.returncode == 0, out.stderr[-2000:]
        return float(out.stdout.split("COMPILE_S")[-1])

    t_cold = run()
    entries = os.listdir(d)
    assert entries, "no cache entries written"
    t_warm = run()  # fresh process, same cache dir
    # The warm process must reuse the persisted executable: strictly
    # faster is flaky on loaded CI, so assert the cache was READ by
    # checking no new entries were needed AND warm <= cold * 1.5.
    assert set(os.listdir(d)) == set(entries)
    assert t_warm <= t_cold * 1.5, (t_cold, t_warm)
