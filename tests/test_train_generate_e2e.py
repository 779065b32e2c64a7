"""Full-stack integration: train a tiny GPT-2 THROUGH the engine graph
(jax.grad over Executor.trace) until it learns a synthetic pattern, then
the Generator must reproduce the pattern — training, weight round-trip,
KV-cached decode and sampling all in one test."""

import jax
import jax.numpy as jnp
import numpy as np

from rten_tpu.generate import Generator, GeneratorConfig
from rten_tpu.ir.graph import Constant
from rten_tpu.models import gpt2


def test_train_then_generate_pattern():
    cfg = gpt2.GPT2Config(
        vocab_size=16, n_positions=64, n_embd=32, n_layer=1, n_head=2
    )
    model = gpt2.load(cfg, gpt2.random_weights(cfg, seed=0))
    g = model.graph
    param_ids = [nid for nid, n in g.nodes.items() if isinstance(n, Constant)
                 if n.array.dtype == np.float32 and n.array.size >= 16]
    params = {nid: jnp.asarray(g.nodes[nid].array) for nid in param_ids}
    logits_id = g.find_node("logits")

    # Pattern: 0 1 2 3 4 5 6 7 repeating.
    T = 32
    base = np.arange(T) % 8
    x = base[None, :-1].astype(np.int32)
    y = base[None, 1:].astype(np.int32)
    feed = {
        g.find_node("input_ids"): x,
        g.find_node("attention_mask"): np.ones_like(x),
        g.find_node("position_ids"): np.arange(T - 1, dtype=np.int32)[None],
        g.find_node("past_key_values.0.key"): np.zeros(
            (1, cfg.n_head, 0, cfg.head_dim), np.float32
        ),
        g.find_node("past_key_values.0.value"): np.zeros(
            (1, cfg.n_head, 0, cfg.head_dim), np.float32
        ),
    }

    def loss_fn(params):
        env = dict(params)
        env.update(feed)
        logits = model.executor.trace(env, [logits_id])[0]
        logp = jax.nn.log_softmax(logits, -1)
        return -jnp.take_along_axis(logp, jnp.asarray(y)[..., None], -1).mean()

    @jax.jit
    def step(params):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        return {k: p - 0.05 * grads[k] for k, p in params.items()}, loss

    loss = None
    for i in range(300):
        params, loss = step(params)
    assert float(loss) < 0.1, float(loss)

    # Write trained weights back and generate.
    for nid in param_ids:
        g.nodes[nid] = Constant(name=g.nodes[nid].name, array=np.asarray(params[nid]))
    model.executor._weights = None
    gen = Generator(model, [[0, 1, 2, 3]], GeneratorConfig(bucket_size=8))
    out = gen.generate(12)[0]
    want = (np.arange(4, 16) % 8).astype(np.int32)
    np.testing.assert_array_equal(out, want)
