"""HTTP serving front end over the engine (SURVEY section 5 deployment
story): generate, concurrent requests, health, stats, backpressure 429."""

import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from rten_tpu.model import Model, ModelOptions
from rten_tpu.models import gpt2
from rten_tpu.serving import ContinuousBatchingEngine
from rten_tpu.serving.http_server import serve_background


@pytest.fixture(scope="module")
def server():
    cfg = gpt2.GPT2Config(vocab_size=96, n_positions=64, n_embd=32,
                          n_layer=2, n_head=2)
    weights = gpt2.random_weights(cfg, seed=0)
    graph = gpt2.build_graph_static_cache(cfg, weights, capacity=64)
    model = Model(graph, ModelOptions(optimize=True))
    engine = ContinuousBatchingEngine(
        model, n_layer=cfg.n_layer, n_head=cfg.n_head, head_dim=cfg.head_dim,
        slots=2, capacity=64, prefill_bucket=8, greedy_on_device=True,
        steps_per_dispatch=4,
    )
    srv, loop = serve_background(engine)
    yield f"http://127.0.0.1:{srv.server_address[1]}", engine
    srv.shutdown()
    loop.shutdown()


def _post(url, payload):
    req = urllib.request.Request(
        url + "/generate", json.dumps(payload).encode(),
        {"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        return json.loads(r.read())


def test_generate_roundtrip(server):
    url, engine = server
    out = _post(url, {"prompt": [3, 9, 27], "max_new_tokens": 8})
    assert len(out["tokens"]) == 8
    assert out["ttft_ms"] > 0


def test_generate_deterministic_vs_direct(server):
    url, engine = server
    out1 = _post(url, {"prompt": [5, 1, 4], "max_new_tokens": 6})
    out2 = _post(url, {"prompt": [5, 1, 4], "max_new_tokens": 6})
    assert out1["tokens"] == out2["tokens"]


def test_concurrent_requests(server):
    url, _ = server
    results = {}

    def worker(i):
        results[i] = _post(url, {"prompt": [i + 1, i + 2], "max_new_tokens": 6})

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(120)
    assert len(results) == 4
    for r in results.values():
        assert len(r["tokens"]) == 6


def test_health_and_stats(server):
    url, _ = server
    with urllib.request.urlopen(url + "/health", timeout=30) as r:
        h = json.loads(r.read())
    assert h["status"] == "ok"
    with urllib.request.urlopen(url + "/stats", timeout=30) as r:
        s = json.loads(r.read())
    assert s["finished_requests"] >= 1


def test_bad_request_400(server):
    url, _ = server
    try:
        _post(url, {"max_new_tokens": 4})
        assert False, "expected 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_metrics_endpoint(server):
    url, _ = server
    with urllib.request.urlopen(url + "/metrics", timeout=30) as r:
        body = r.read().decode()
    assert "rten_finished_requests" in body
    assert "rten_decode_tokens" in body
