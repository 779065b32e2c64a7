"""Sharded execution on the 8-virtual-device CPU mesh.

What the reference cannot do at all (SURVEY.md section 2.6): TP+DP GPT-2
forward on a mesh matches the single-device result, and a full training
step (grad over sharded weights) compiles and runs.
"""

import jax
import numpy as np
import pytest

from util import assert_close

from rten_tpu.generate import Generator, GeneratorConfig
from rten_tpu.models import gpt2
from rten_tpu.parallel import MeshConfig, make_mesh, shard_constants
from rten_tpu.parallel.sharding import GPT2_INPUT_RULES, shard_inputs


@pytest.fixture(scope="module")
def tiny_model():
    cfg = gpt2.GPT2Config(
        vocab_size=96, n_positions=64, n_embd=64, n_layer=2, n_head=8
    )
    weights = gpt2.random_weights(cfg, seed=3)
    model = gpt2.load(cfg, weights)
    return cfg, model


def _feed(cfg, ids):
    B, T = ids.shape
    feed = {
        "input_ids": ids,
        "attention_mask": np.ones((B, T), np.int32),
        "position_ids": np.broadcast_to(np.arange(T, dtype=np.int32), (B, T)).copy(),
    }
    for i in range(cfg.n_layer):
        feed[f"past_key_values.{i}.key"] = np.zeros(
            (B, cfg.n_head, 0, cfg.head_dim), np.float32
        )
        feed[f"past_key_values.{i}.value"] = np.zeros(
            (B, cfg.n_head, 0, cfg.head_dim), np.float32
        )
    return feed


@pytest.mark.parametrize("mesh_cfg", [MeshConfig(1, 8), MeshConfig(2, 4)])
def test_tp_dp_forward_matches_single_device(tiny_model, mesh_cfg):
    cfg, model = tiny_model
    ids = np.arange(2 * 8, dtype=np.int32).reshape(2, 8) % cfg.vocab_size
    feed_by_name = _feed(cfg, ids)
    want = np.asarray(model.run(feed_by_name, ["logits"])[0])

    mesh = make_mesh(mesh_cfg)
    g = model.graph
    params = shard_constants(g, mesh)
    feed = {g.find_node(k): v for k, v in feed_by_name.items()}
    feed = shard_inputs(g, mesh, feed, GPT2_INPUT_RULES)
    feed.update(params)
    got = np.asarray(model.executor.run(feed, [g.find_node("logits")])[0])
    assert_close(got, want, rtol=1e-3, atol=1e-4)


def test_sharded_train_step_runs(tiny_model):
    """Full training step over the mesh: loss -> grads -> SGD update."""
    cfg, model = tiny_model
    mesh = make_mesh(MeshConfig(2, 4))
    g = model.graph
    params = shard_constants(g, mesh)
    ids = np.arange(2 * 8, dtype=np.int32).reshape(2, 8) % cfg.vocab_size
    labels = np.roll(ids, -1, axis=1)
    feed_by_name = _feed(cfg, ids)
    runtime = shard_inputs(
        mesh=mesh, graph=g,
        feed={g.find_node(k): v for k, v in feed_by_name.items()},
    )
    logits_id = g.find_node("logits")

    param_ids = list(params.keys())

    def loss_fn(param_vals, runtime_env):
        env = dict(zip(param_ids, param_vals))
        env.update(runtime_env)
        logits = model.executor.trace(env, [logits_id])[0]
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp_take_along(logp, labels)
        return nll.mean()

    import jax.numpy as jnp

    def jnp_take_along(logp, labels):
        return jnp.take_along_axis(
            logp, jnp.asarray(labels)[..., None], axis=-1
        )[..., 0]

    @jax.jit
    def train_step(param_vals, runtime_env):
        loss, grads = jax.value_and_grad(loss_fn)(param_vals, runtime_env)
        new_params = [p - 1e-3 * g_ for p, g_ in zip(param_vals, grads)]
        return loss, new_params

    param_vals = [params[i] for i in param_ids]
    loss0, param_vals = train_step(param_vals, runtime)
    loss1, param_vals = train_step(param_vals, runtime)
    assert np.isfinite(float(loss0)) and np.isfinite(float(loss1))
    assert float(loss1) < float(loss0)  # SGD on the same batch must descend
    # Sharded params keep their shardings through the update.
    assert len(jax.tree.leaves(param_vals)) == len(param_ids)


def test_sharded_generator(tiny_model):
    """Generator with weights resident on the mesh (fed per step)."""
    cfg, model = tiny_model
    mesh = make_mesh(MeshConfig(1, 8))
    g = model.graph
    params = shard_constants(g, mesh)
    named_params = {g.node_name(nid): v for nid, v in params.items()}

    prompt = [3, 17, 5, 40]
    want = Generator(model, [prompt], GeneratorConfig(bucket_size=8)).generate(6)[0]
    gen = Generator(
        model,
        [prompt],
        GeneratorConfig(bucket_size=8, constant_inputs=named_params),
    )
    got = gen.generate(6)[0]
    np.testing.assert_array_equal(got, want)


def test_fsdp_train_step_matches_replicated(tiny_model):
    """ZeRO-3/FSDP: params sharded over the 'data' axis (fsdp_weight_
    shardings), optimizer momentum created with the same specs
    (zero_init_state). One SGD-momentum step must produce the same loss as
    the fully replicated run (identical math, partitioned storage), and the
    updated params must STAY sharded (out_shardings pin the ZeRO layout so
    XLA can't all-gather the state)."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from rten_tpu.parallel.sharding import (
        fsdp_weight_shardings,
        shard_constants_by_plan,
        zero_init_state,
    )

    cfg, model = tiny_model
    mesh = make_mesh(MeshConfig(4, 2))
    g = model.graph
    plan = fsdp_weight_shardings(g, mesh, axis="data")
    assert plan, "FSDP plan is empty"
    # Every spec shards exactly one dim on 'data'.
    for spec in plan.values():
        assert sum(1 for s in spec if s == "data") == 1
    params = shard_constants_by_plan(g, mesh, plan)
    state = zero_init_state(params, mesh, plan)
    param_ids = list(params.keys())

    ids = np.arange(4 * 8, dtype=np.int32).reshape(4, 8) % cfg.vocab_size
    labels = np.roll(ids, -1, axis=1)
    feed_by_name = _feed(cfg, ids)
    runtime = shard_inputs(
        g, mesh, {g.find_node(k): v for k, v in feed_by_name.items()}
    )
    logits_id = g.find_node("logits")

    def loss_fn(param_vals, runtime_env):
        env = dict(zip(param_ids, param_vals))
        env.update(runtime_env)
        logits = model.executor.trace(env, [logits_id])[0]
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(
            logp, jnp.asarray(labels)[..., None], axis=-1
        )[..., 0]
        return nll.mean()

    param_shards = [NamedSharding(mesh, plan.get(i, P())) for i in param_ids]

    @jax.jit
    def train_step(param_vals, mom, runtime_env):
        loss, grads = jax.value_and_grad(loss_fn)(param_vals, runtime_env)
        new_mom = [0.9 * m + g_ for m, g_ in zip(mom, grads)]
        new_p = [p - 1e-2 * m for p, m in zip(param_vals, new_mom)]
        # Pin the ZeRO layout: updated params/state keep the 'data' shards.
        new_p = [jax.lax.with_sharding_constraint(p, s)
                 for p, s in zip(new_p, param_shards)]
        new_mom = [jax.lax.with_sharding_constraint(m, s)
                   for m, s in zip(new_mom, param_shards)]
        return loss, new_p, new_mom

    pv = [params[i] for i in param_ids]
    mv = [state[i] for i in param_ids]
    loss0, pv, mv = train_step(pv, mv, runtime)
    loss1, pv, mv = train_step(pv, mv, runtime)
    assert float(loss1) < float(loss0)
    # Updated params and momentum stayed in the sharded layout.
    for arr, nid in zip(pv, param_ids):
        if nid in plan:
            assert arr.sharding.spec == plan[nid], (
                g.node_name(nid), arr.sharding.spec, plan[nid])
    for arr, nid in zip(mv, param_ids):
        if nid in plan:
            assert arr.sharding.spec == plan[nid]

    # Replicated reference: same two steps, no sharding — loss must match.
    rp = [np.asarray(g.nodes[i].array, np.float32) for i in param_ids]
    rm = [np.zeros_like(p) for p in rp]
    rfeed = {g.find_node(k): v for k, v in feed_by_name.items()}

    @jax.jit
    def ref_step(param_vals, mom):
        loss, grads = jax.value_and_grad(loss_fn)(param_vals, rfeed)
        new_mom = [0.9 * m + g_ for m, g_ in zip(mom, grads)]
        return loss, [p - 1e-2 * m for p, m in zip(param_vals, new_mom)], new_mom

    rloss0, rp, rm = ref_step(rp, rm)
    rloss1, rp, rm = ref_step(rp, rm)
    assert abs(float(loss0) - float(rloss0)) < 1e-4
    assert abs(float(loss1) - float(rloss1)) < 1e-3


def test_sp_prefill_matches_single_device(tiny_model):
    """Sequence-parallel prefill: token axis sharded over the 'model' mesh
    axis with replicated weights (SP_PREFILL_INPUT_RULES). Pointwise layers
    keep the token sharding; GSPMD all-gathers K/V at attention. Numerics
    must match the unsharded forward exactly (same math, partitioned)."""
    from jax.sharding import PartitionSpec as P

    from rten_tpu.parallel.sharding import SP_PREFILL_INPUT_RULES

    cfg, model = tiny_model
    B, T = 2, 16  # T divides the model axis (4)
    ids = (np.arange(B * T, dtype=np.int32).reshape(B, T) * 5) % cfg.vocab_size
    feed_by_name = _feed(cfg, ids)
    want = np.asarray(model.run(feed_by_name, ["logits"])[0])

    mesh = make_mesh(MeshConfig(2, 4))
    g = model.graph
    params = shard_constants(g, mesh, rules=[])  # replicated weights
    feed = {g.find_node(k): v for k, v in feed_by_name.items()}
    feed = shard_inputs(g, mesh, feed, SP_PREFILL_INPUT_RULES)
    # The token axis really is split before the run.
    assert feed[g.find_node("input_ids")].sharding.spec == P("data", "model")
    feed.update(params)
    got = model.executor.run(feed, [g.find_node("logits")])[0]
    assert_close(np.asarray(got), want, rtol=1e-3, atol=1e-4)
