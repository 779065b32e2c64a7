#!/usr/bin/env python
"""Train an MNIST-style MLP/CNN through the engine IR and save .rtpu.

Analog of the reference's tools/train-mnist.py (trains in PyTorch, exports
ONNX). Here training runs through the engine itself: the model graph's
weights are fed as jit arguments, jax.grad differentiates the traced
graph, optax does the update. With no dataset download available, a
synthetic "digits" dataset (class-dependent Gaussian blobs on a 28x28
canvas) stands in; pass --mnist-npz PATH to train on the real thing
(expects keys x_train/y_train/x_test/y_test).

Usage: python tools/train_mnist.py [--arch cnn|mlp] [--steps 300]
       [--out mnist.rtpu] [--quantize]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rten_tpu.utils import honor_jax_platforms_env

honor_jax_platforms_env()

import jax
import jax.numpy as jnp
import optax

from rten_tpu.ir.graph import Constant
from rten_tpu.model import Model, ModelOptions
from rten_tpu.models import mnist


def synthetic_digits(n, rng):
    """Class-dependent blob patterns, learnable to ~100%."""
    y = rng.integers(0, 10, n)
    x = rng.normal(0, 0.3, (n, 28, 28)).astype(np.float32)
    for i in range(n):
        c = y[i]
        r, col = divmod(c, 4)
        x[i, 4 + r * 8 : 10 + r * 8, 4 + col * 6 : 10 + col * 6] += 1.5
    return x, y.astype(np.int32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", choices=["cnn", "mlp"], default="cnn")
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--out", default="mnist.rtpu")
    ap.add_argument("--quantize", action="store_true")
    ap.add_argument("--mnist-npz", help="real MNIST .npz (x_train/y_train/...)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    if args.mnist_npz:
        data = np.load(args.mnist_npz)
        x_train = data["x_train"].astype(np.float32) / 255.0
        y_train = data["y_train"].astype(np.int32)
        x_test = data["x_test"].astype(np.float32) / 255.0
        y_test = data["y_test"].astype(np.int32)
    else:
        x_train, y_train = synthetic_digits(8192, rng)
        x_test, y_test = synthetic_digits(1024, rng)

    model = mnist.load(args.arch, options=ModelOptions(optimize=False))
    g = model.graph
    param_ids = [
        nid for nid, node in g.nodes.items() if isinstance(node, Constant)
    ]
    params = {nid: jnp.asarray(g.nodes[nid].array) for nid in param_ids}
    logits_id = g.find_node("logits")
    image_id = g.find_node("image")

    def shape_input(x):
        return x.reshape(-1, 784) if args.arch == "mlp" else x.reshape(-1, 1, 28, 28)

    def loss_fn(params, xb, yb):
        env = dict(params)
        env[image_id] = xb
        logits = model.executor.trace(env, [logits_id])[0]
        logp = jax.nn.log_softmax(logits, -1)
        return -jnp.take_along_axis(logp, yb[:, None], -1).mean()

    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    @jax.jit
    def train_step(params, opt_state, xb, yb):
        loss, grads = jax.value_and_grad(loss_fn)(params, xb, yb)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def predict(params, xb):
        env = dict(params)
        env[image_id] = xb
        return jnp.argmax(model.executor.trace(env, [logits_id])[0], -1)

    n = len(x_train)
    for step in range(args.steps):
        idx = rng.integers(0, n, args.batch)
        xb = shape_input(x_train[idx])
        yb = jnp.asarray(y_train[idx])
        params, opt_state, loss = train_step(params, opt_state, xb, yb)
        if step % 50 == 0 or step == args.steps - 1:
            print(f"step {step}: loss {float(loss):.4f}")

    preds = np.asarray(predict(params, shape_input(x_test)))
    acc = float((preds == y_test).mean())
    print(f"test accuracy: {acc:.4f}")

    # Write trained weights back into the graph and save.
    for nid in param_ids:
        g.nodes[nid] = Constant(name=g.nodes[nid].name, array=np.asarray(params[nid]))
    if args.quantize:
        from rten_tpu.quantize_pass import quantize_dynamic

        quantize_dynamic(g)
    model.save(args.out, metadata={"test_accuracy": f"{acc:.4f}", "arch": args.arch})
    print(f"saved {args.out}")
    return 0 if acc > 0.9 else 1


if __name__ == "__main__":
    sys.exit(main())
