#!/usr/bin/env python
"""Train a byte-level GPT-2 on in-image text; anchor int8 accuracy on it.

The round-4 verdict's "non-circular accuracy anchor": every prior e2e
metric ran randomly-initialized models (the perplexity eval even sampled
its corpus FROM the random model). This trains a small byte-vocab GPT-2
through the engine's own graph (jax.grad through Executor.trace, the
train_mnist.py recipe — analog of the reference's tools/train-mnist.py and
its real-checkpoint demos, /root/reference/rten-examples/README.md:73-109)
on REAL text already in the image (this repo's source + docs, plus the
Python stdlib sources), then reports:

  - held-out perplexity of the trained f32 model,
  - held-out perplexity of its int8 dynamic quantization (target: <=1%
    delta, docs/quantization.md analog),
  - greedy-decode token agreement f32-vs-int8 over held-out prompts.

Usage: python tools/train_bytelm.py [--steps 1500] [--out bytelm.rtpu]
       [--corpus-mb 8] [--seq 256]
Writes a JSON summary line to stdout; exit 1 if the int8 delta exceeds 1%.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rten_tpu.utils import honor_jax_platforms_env

honor_jax_platforms_env()

import jax
import jax.numpy as jnp
import optax

from rten_tpu.ir.graph import Constant
from rten_tpu.model import Model, ModelOptions
from rten_tpu.models import gpt2


def load_corpus(max_mb: float) -> bytes:
    """Real in-image text: this repo's source+docs, then Python stdlib."""
    roots = [
        (os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
         ("*.py", "*.md")),
        (os.path.dirname(os.__file__), ("*.py",)),
    ]
    chunks, total = [], 0
    budget = int(max_mb * 1e6)
    for root, pats in roots:
        for pat in pats:
            for p in sorted(glob.glob(os.path.join(root, "**", pat),
                                      recursive=True)):
                try:
                    b = open(p, "rb").read()
                except OSError:
                    continue
                chunks.append(b)
                total += len(b)
                if total >= budget:
                    return b"\n".join(chunks)[:budget]
    return b"\n".join(chunks)


def batches(data: np.ndarray, rng, batch: int, seq: int):
    idx = rng.integers(0, len(data) - seq - 1, batch)
    x = np.stack([data[i:i + seq + 1] for i in idx]).astype(np.int32)
    return x


def model_feed(graph, ids: np.ndarray):
    B, T = ids.shape
    feed = {
        "input_ids": ids,
        "attention_mask": np.ones((B, T), np.int32),
        "position_ids": np.broadcast_to(np.arange(T, dtype=np.int32), (B, T)),
    }
    for nid in graph.input_ids:
        name = graph.node_name(nid)
        if name.startswith("past_key_values."):
            node = graph.nodes[nid]
            H, D = node.shape[1], node.shape[3]
            feed[name] = np.zeros((B, H, 0, D), np.float32)
    return feed


def perplexity(model, data: np.ndarray, seq: int, n_seqs: int) -> float:
    """Mean per-byte perplexity over contiguous held-out windows."""
    total_nll, total_tok = 0.0, 0
    for i in range(n_seqs):
        start = i * seq
        toks = data[start:start + seq + 1]
        ids = toks[None, :-1].astype(np.int32)
        logits = np.asarray(
            model.run(model_feed(model.graph, ids), ["logits"])[0], np.float64
        )[0]
        logits -= logits.max(-1, keepdims=True)
        logp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
        total_nll -= logp[np.arange(seq), toks[1:]].sum()
        total_tok += seq
    return float(np.exp(total_nll / total_tok))


def greedy_tokens(model, prompt: np.ndarray, n_new: int) -> list:
    """Greedy full-recompute decode at FIXED length (one executable):
    causal attention makes positions past the current length irrelevant to
    the current logit, so the buffer is padded once and re-run in place."""
    T = len(prompt) + n_new
    buf = np.zeros(T, np.int32)
    buf[:len(prompt)] = prompt
    cur = len(prompt)
    for _ in range(n_new):
        logits = np.asarray(
            model.run(model_feed(model.graph, buf[None]), ["logits"])[0]
        )[0]
        buf[cur] = int(logits[cur - 1].argmax())
        cur += 1
    return buf[len(prompt):].tolist()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--seq", type=int, default=256)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--corpus-mb", type=float, default=8.0)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--out", default="")
    ap.add_argument("--eval-seqs", type=int, default=16)
    ap.add_argument("--greedy-prompts", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    corpus = np.frombuffer(load_corpus(args.corpus_mb), np.uint8)
    n_held = max((args.eval_seqs + 2) * (args.seq + 1), 64 * 1024)
    train, held = corpus[:-n_held], corpus[-n_held:]
    print(f"corpus: {len(corpus)/1e6:.1f}MB real text "
          f"({len(train)/1e6:.2f} train / {len(held)/1e3:.0f}k held-out)",
          file=sys.stderr)

    cfg = gpt2.GPT2Config(
        vocab_size=256, n_positions=max(512, args.seq),
        n_embd=args.width, n_layer=args.layers, n_head=args.heads,
    )
    model = gpt2.load(cfg, options=ModelOptions(optimize=False), seed=args.seed)
    g = model.graph
    # Trainable params = float constants; int32 shape/axes constants stay
    # embedded (jax.grad rejects integer inputs).
    param_ids = [
        nid for nid, node in g.nodes.items()
        if isinstance(node, Constant) and node.array.dtype == np.float32
    ]
    params = {nid: jnp.asarray(g.nodes[nid].array) for nid in param_ids}
    logits_id = g.find_node("logits")
    n_params = sum(int(np.prod(p.shape)) for p in params.values())
    print(f"model: {args.layers}L x {args.width} ({n_params/1e6:.1f}M params)",
          file=sys.stderr)

    in_ids = {
        g.node_name(nid): nid
        for nid in g.input_ids
    }

    def loss_fn(params, xb):
        ids = xb[:, :-1]
        B, T = ids.shape
        env = dict(params)
        env[in_ids["input_ids"]] = ids
        env[in_ids["attention_mask"]] = jnp.ones((B, T), jnp.int32)
        env[in_ids["position_ids"]] = jnp.broadcast_to(
            jnp.arange(T, dtype=jnp.int32), (B, T)
        )
        for name, nid in in_ids.items():
            if name.startswith("past_key_values."):
                node = g.nodes[nid]
                env[nid] = jnp.zeros(
                    (B, node.shape[1], 0, node.shape[3]), jnp.float32
                )
        logits = model.executor.trace(env, [logits_id])[0]
        logp = jax.nn.log_softmax(logits, -1)
        tgt = xb[:, 1:]
        nll = -jnp.take_along_axis(logp, tgt[..., None], -1)
        return nll.mean()

    opt = optax.adamw(
        optax.warmup_cosine_decay_schedule(
            0.0, args.lr, min(200, args.steps // 10), args.steps
        ),
        weight_decay=0.01,
    )
    opt_state = opt.init(params)

    @jax.jit
    def train_step(params, opt_state, xb):
        loss, grads = jax.value_and_grad(loss_fn)(params, xb)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    t0 = time.time()
    for step in range(args.steps):
        xb = jnp.asarray(batches(train, rng, args.batch, args.seq))
        params, opt_state, loss = train_step(params, opt_state, xb)
        if step % 100 == 0 or step == args.steps - 1:
            print(f"step {step}: loss {float(loss):.4f} "
                  f"({time.time()-t0:.0f}s)", file=sys.stderr)

    # Write trained weights back; build f32 and int8 eval models.
    for nid in param_ids:
        g.nodes[nid] = Constant(
            name=g.nodes[nid].name, array=np.asarray(params[nid])
        )
    f32_model = Model(g, ModelOptions(optimize=True))
    import copy

    g8 = copy.deepcopy(g)
    from rten_tpu.quantize_pass import quantize_dynamic

    quantize_dynamic(g8)
    int8_model = Model(g8, ModelOptions(optimize=True))

    ppl_f32 = perplexity(f32_model, held, args.seq, args.eval_seqs)
    ppl_int8 = perplexity(int8_model, held, args.seq, args.eval_seqs)
    delta_pct = (ppl_int8 - ppl_f32) / ppl_f32 * 100.0

    # Greedy serving-output agreement on held-out prompts.
    agree, total = 0, 0
    n_new = 32
    for i in range(args.greedy_prompts):
        p = held[i * 97: i * 97 + 64].astype(np.int32)
        a = greedy_tokens(f32_model, p, n_new)
        b = greedy_tokens(int8_model, p, n_new)
        agree += sum(x == y for x, y in zip(a, b))
        total += n_new
    # Random-model byte perplexity is 256; a trained model must be far
    # below it for the anchor to be meaningful.
    summary = {
        "metric": "bytelm_int8_perplexity_delta_pct",
        "ppl_f32": round(ppl_f32, 4),
        "ppl_int8": round(ppl_int8, 4),
        "delta_pct": round(delta_pct, 4),
        "greedy_agreement": round(agree / total, 4),
        "trained": ppl_f32 < 32.0,
        "params_m": round(n_params / 1e6, 2),
        "corpus_mb": round(len(corpus) / 1e6, 2),
        "steps": args.steps,
    }
    print(json.dumps(summary))
    if args.out:
        f32_model.save(args.out, metadata={
            "ppl_f32": f"{ppl_f32:.4f}", "corpus": "in-image byte corpus",
        })
        np.savez(os.path.splitext(args.out)[0] + "_heldout.npz",
                 tokens=held.astype(np.int32))
    return 0 if (abs(delta_pct) <= 1.0 and summary["trained"]) else 1


if __name__ == "__main__":
    sys.exit(main())
