"""CLI --serve: load a saved static-cache LM and serve it over HTTP."""

import json
import socket
import threading
import time
import urllib.request

from rten_tpu.model import Model, ModelOptions
from rten_tpu.models import gpt2


def test_cli_serve_end_to_end(tmp_path):
    cfg = gpt2.GPT2Config(
        vocab_size=96, n_positions=64, n_embd=32, n_layer=2, n_head=4
    )
    g = gpt2.build_graph_static_cache(
        cfg, gpt2.random_weights(cfg, seed=3), capacity=64
    )
    path = str(tmp_path / "lm.rtpu")
    Model(g, ModelOptions(optimize=True)).save(path)

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    from rten_tpu.cli import main

    t = threading.Thread(
        target=main,
        args=([path, "--serve", str(port), "--slots", "2",
               "--prefill-bucket", "4", "--steps-per-dispatch", "2", "-q"],),
        daemon=True,
    )
    t.start()

    body = json.dumps({"prompt": [5, 9, 23], "max_new_tokens": 6}).encode()
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/generate", data=body,
        headers={"Content-Type": "application/json"},
    )
    deadline = time.time() + 120
    last = None
    while time.time() < deadline:
        try:
            with urllib.request.urlopen(req, timeout=90) as resp:
                out = json.loads(resp.read())
            break
        except Exception as e:  # server still starting
            last = e
            time.sleep(0.5)
    else:
        raise AssertionError(f"server never answered: {last}")
    assert len(out["tokens"]) == 6

    with urllib.request.urlopen(
        f"http://127.0.0.1:{port}/health", timeout=30
    ) as resp:
        assert json.loads(resp.read())["status"] == "ok"
