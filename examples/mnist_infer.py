#!/usr/bin/env python
"""MNIST flow: train (tools/train_mnist.py) -> .rtpu -> load -> classify.

Runs the trainer in-process if the model file is missing.
"""

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rten_tpu.utils import honor_jax_platforms_env

honor_jax_platforms_env()

import numpy as np


def main():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    model_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/mnist_demo.rtpu"
    if not os.path.exists(model_path):
        print("training first ...")
        subprocess.run(
            [sys.executable, os.path.join(root, "tools", "train_mnist.py"),
             "--arch", "mlp", "--steps", "200", "--out", model_path,
             "--quantize"],
            check=True, env=os.environ,
        )

    from rten_tpu.model import Model

    model = Model.load_file(model_path)
    print("metadata:", model.metadata)
    rng = np.random.default_rng(1)
    # Same synthetic-digits distribution the trainer used.
    sys.path.insert(0, os.path.join(root, "tools"))
    from train_mnist import synthetic_digits

    x, y = synthetic_digits(8, rng)
    logits = np.asarray(model.run({"image": x.reshape(8, -1)})[0])
    preds = logits.argmax(-1)
    print("labels:", y.tolist())
    print("preds: ", preds.tolist())
    print(f"accuracy: {(preds == y).mean():.2f}")


if __name__ == "__main__":
    main()
