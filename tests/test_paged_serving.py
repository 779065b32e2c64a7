"""Paged KV cache: block-pool serving vs the slot-major cache goldens.

vLLM-style block tables, TPU-native (kernels/flash_attention.py paged_*;
no reference analog — rten is single-sequence inference, SURVEY §2.6).
Token streams must be EXACTLY the non-paged engine's: paging changes
storage layout, not math.
"""

import numpy as np
import pytest

from rten_tpu.model import Model, ModelOptions
from rten_tpu.models import gpt2
from rten_tpu.serving import ContinuousBatchingEngine

CAP = 64
BS = 16


@pytest.fixture(scope="module")
def models():
    cfg = gpt2.GPT2Config(
        vocab_size=128, n_positions=128, n_embd=32, n_layer=2, n_head=4
    )
    weights = gpt2.random_weights(cfg, seed=11)
    flat = gpt2.build_graph_static_cache(cfg, weights, capacity=CAP)
    paged = gpt2.build_graph_static_cache(
        cfg, weights, capacity=CAP, paged_blocks=40, block_size=BS
    )
    return (
        cfg,
        Model(flat, ModelOptions(optimize=True)),
        Model(paged, ModelOptions(optimize=True)),
    )


def make_engine(cfg, model, slots=3, **kw):
    kw.setdefault("greedy_on_device", True)
    return ContinuousBatchingEngine(
        model, n_layer=cfg.n_layer, n_head=cfg.n_head,
        head_dim=cfg.head_dim, slots=slots, capacity=CAP,
        prefill_bucket=8, **kw,
    )


PROMPTS = [
    [5, 9, 23, 40, 7],
    [3, 8, 11],
    [77, 2, 19, 50, 4, 33, 6, 101, 12, 64],
    [120, 14],
    [9, 9, 9, 9, 1, 2, 3],
]


@pytest.mark.parametrize("steps_per_dispatch", [1, 4])
def test_paged_tokens_match_unpaged(models, steps_per_dispatch):
    cfg, flat_model, paged_model = models
    n_new = 11  # not a multiple of steps_per_dispatch
    want = []
    eng = make_engine(cfg, flat_model, slots=3,
                      steps_per_dispatch=steps_per_dispatch)
    reqs = [eng.submit(p, max_new_tokens=n_new) for p in PROMPTS]
    eng.run()
    want = [r.generated for r in reqs]

    peng = make_engine(cfg, paged_model, slots=3,
                       steps_per_dispatch=steps_per_dispatch)
    assert peng.paged and peng.block_size == BS
    preqs = [peng.submit(p, max_new_tokens=n_new) for p in PROMPTS]
    peng.run()
    for i, (pr, exp) in enumerate(zip(preqs, want)):
        assert pr.generated == exp, f"request {i}"
    # Every block returned to the pool after completion.
    assert len(peng._free_blocks) == peng.n_blocks - 1
    assert all(not b for b in peng._slot_blocks)


def test_paged_block_reuse_across_waves(models):
    """Second wave reuses freed (dirty) blocks — stale rows must never leak
    into attention (the mask bounds reads to freshly written positions)."""
    cfg, flat_model, paged_model = models
    n_new = 8
    wave2 = [[44, 3, 99, 1], [7, 7, 120, 55, 2, 31]]

    eng = make_engine(cfg, flat_model, slots=2, steps_per_dispatch=4)
    for p in PROMPTS[:2]:
        eng.submit(p, max_new_tokens=n_new)
    eng.run()
    r2 = [eng.submit(p, max_new_tokens=n_new) for p in wave2]
    eng.run()
    want = [r.generated for r in r2]

    peng = make_engine(cfg, paged_model, slots=2, steps_per_dispatch=4)
    for p in PROMPTS[:2]:
        peng.submit(p, max_new_tokens=n_new)
    peng.run()
    used_before = peng.n_blocks - 1 - len(peng._free_blocks)
    assert used_before == 0
    p2 = [peng.submit(p, max_new_tokens=n_new) for p in wave2]
    peng.run()
    for pr, exp in zip(p2, want):
        assert pr.generated == exp


def test_pool_exhaustion_backpressure(models):
    """A pool too small for every slot at once admits in waves: requests
    wait in the queue until blocks free up, and all of them finish."""
    cfg, _, _ = models
    weights = gpt2.random_weights(cfg, seed=11)
    # 4 slots but only enough blocks for ~2 concurrent requests.
    tight = gpt2.build_graph_static_cache(
        cfg, weights, capacity=CAP, paged_blocks=5, block_size=BS
    )
    model = Model(tight, ModelOptions(optimize=True))
    eng = make_engine(cfg, model, slots=4, steps_per_dispatch=2)
    # Each request needs 2 blocks (span = 3+20+2*2 = 27 -> ceil(27/16));
    # the pool has 4 usable -> at most 2 of the 4 slots hold requests at
    # once, so _reserve_blocks MUST fail and re-queue during the run.
    assert eng._blocks_needed(3, 20) == 2
    reqs = [eng.submit([10 + i, 3, 9], max_new_tokens=20) for i in range(5)]
    max_active = 0
    while eng.has_work():
        eng.step()
        max_active = max(
            max_active, sum(r is not None for r in eng.slot_req)
        )
    assert max_active == 2  # block pool, not slot count, was the limiter
    assert all(r.done and not r.error for r in reqs)
    assert len(eng._free_blocks) == eng.n_blocks - 1


def test_submit_impossible_reservation_rejected(models):
    cfg, _, _ = models
    weights = gpt2.random_weights(cfg, seed=11)
    tiny = gpt2.build_graph_static_cache(
        cfg, weights, capacity=CAP, paged_blocks=3, block_size=BS
    )
    model = Model(tiny, ModelOptions(optimize=True))
    eng = make_engine(cfg, model, slots=2)
    with pytest.raises(ValueError, match="blocks"):
        eng.submit(list(range(1, 40)), max_new_tokens=20)


def test_paged_guards(models):
    cfg, _, paged_model = models
    weights = gpt2.random_weights(cfg, seed=11)
    with pytest.raises(ValueError, match="int4"):
        gpt2.build_graph_static_cache(
            cfg, weights, capacity=CAP, paged_blocks=8, block_size=BS,
            kv_quant=True, kv_bits=4,
        )
    with pytest.raises(ValueError, match="deferred"):
        gpt2.build_graph_static_cache(
            cfg, weights, capacity=CAP, paged_blocks=8, block_size=BS,
            deferred_kv=True,
        )
    with pytest.raises(ValueError, match="block_size"):
        gpt2.build_graph_static_cache(
            cfg, weights, capacity=60, paged_blocks=8, block_size=BS
        )
    with pytest.raises(ValueError, match="chunked"):
        make_engine(cfg, paged_model, slots=2, chunked_prefill=True)


def test_paged_kernel_interpret_matches_gather():
    """The Pallas block-table kernel (interpret mode) == gather + the XLA
    decode-attention reference, with a shuffled non-contiguous table."""
    from rten_tpu.kernels.flash_attention import (
        decode_mha_xla,
        paged_decode_mha,
        paged_gather_kv,
    )

    rng = np.random.default_rng(0)
    B, H, D, BSk, MB, NB = 3, 4, 64, 16, 4, 14
    pool_k = rng.standard_normal((NB, H, BSk, D), np.float32)
    pool_v = rng.standard_normal((NB, H, BSk, D), np.float32)
    # Distinct non-zero blocks per slot, deliberately out of order.
    ids = rng.permutation(np.arange(1, NB))[: B * MB].reshape(B, MB)
    bt = ids.astype(np.int32)
    lens = np.array([5, 63, 17], np.int32)
    q = rng.standard_normal((B, H, 1, D), np.float32)

    got = np.asarray(
        paged_decode_mha(q, pool_k, pool_v, lens, bt, interpret=True)
    )
    kf = paged_gather_kv(pool_k, bt)
    vf = paged_gather_kv(pool_v, bt)
    want = np.asarray(decode_mha_xla(q, kf, vf, lens))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_paged_llama_gqa_matches_unpaged():
    """Paged KV on the GQA+rotary llama family (grouped heads exercise the
    NT kernel's group>1 lane masking through the block table)."""
    from rten_tpu.models import llama

    lcfg = llama.LlamaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=128,
    )
    w = llama.random_weights(lcfg, seed=5)
    prompts = [[5, 9, 23, 40, 7], [3, 8, 11], [77, 2, 19, 50, 4, 33]]

    def run(graph):
        eng = ContinuousBatchingEngine(
            Model(graph, ModelOptions(optimize=True)),
            n_layer=lcfg.num_hidden_layers,
            n_head=lcfg.num_attention_heads, head_dim=lcfg.head_dim,
            slots=2, capacity=CAP, prefill_bucket=8,
            greedy_on_device=True, steps_per_dispatch=4,
        )
        reqs = [eng.submit(p, max_new_tokens=9) for p in prompts]
        eng.run()
        return [r.generated for r in reqs]

    want = run(llama.build_graph_static_cache(lcfg, w, capacity=CAP))
    got = run(llama.build_graph_static_cache(
        lcfg, w, capacity=CAP, paged_blocks=20, block_size=BS
    ))
    assert got == want


PREFIX = [2, 71, 33, 9, 15, 44, 101, 8, 90, 12, 5, 27, 60, 3, 77, 120,
          14, 6, 9, 2, 55, 31]  # 22 tokens: 1 full 16-block + 6 partial


def test_paged_prefix_sharing_matches_flat(models):
    """Shared-prefix caching on paged KV: slots REFERENCE the same prefix
    blocks (true dedup) instead of copying rows per slot; tokens must match
    the flat-cache prefix engine AND the no-prefix engine."""
    cfg, flat_model, paged_model = models
    prompts = [PREFIX + [40, 7, 3], PREFIX + [8], PREFIX + [99, 1, 2, 66]]
    n_new = 8

    base = make_engine(cfg, flat_model, slots=2, steps_per_dispatch=4)
    reqs = [base.submit(p, max_new_tokens=n_new) for p in prompts]
    base.run()
    want = [r.generated for r in reqs]

    flatp = make_engine(cfg, flat_model, slots=2, steps_per_dispatch=4)
    flatp.set_shared_prefix(PREFIX)
    freqs = [flatp.submit(p, max_new_tokens=n_new) for p in prompts]
    flatp.run()
    assert [r.generated for r in freqs] == want

    peng = make_engine(cfg, paged_model, slots=2, steps_per_dispatch=4)
    peng.set_shared_prefix(PREFIX)
    assert len(peng._prefix_shared) == len(PREFIX) // BS
    assert peng._prefix_tmpl is not None  # 22 % 16 = 6 partial rows
    preqs = [peng.submit(p, max_new_tokens=n_new) for p in prompts]
    peng.run()
    assert [r.generated for r in preqs] == want
    # Prefix blocks stay permanently reserved; request blocks all returned.
    assert len(peng._free_blocks) == peng.n_blocks - 1 - peng._prefix_nblocks


def test_paged_prefix_actually_shares_blocks(models):
    """While two requests run concurrently, the pool holds ONE copy of the
    full prefix blocks — per-slot ownership covers only suffix/decode."""
    cfg, _, paged_model = models
    peng = make_engine(cfg, paged_model, slots=2, steps_per_dispatch=2)
    peng.set_shared_prefix(PREFIX)
    prompts = [PREFIX + [40, 7, 3], PREFIX + [8]]
    reqs = [peng.submit(p, max_new_tokens=6) for p in prompts]
    # Admit both (first step does admission), then inspect mid-flight.
    peng.step()
    ns = len(peng._prefix_shared)
    assert ns == 1
    for slot, req in enumerate(reqs):
        row = peng.block_table[slot]
        assert list(row[:ns]) == peng._prefix_shared  # shared entries
        own = peng._slot_blocks[slot]
        assert own and peng._prefix_tmpl not in own
        # Own blocks cover suffix + decode only, far less than a full copy.
        assert len(own) < -(-CAP // BS)
    # The two slots own DISJOINT blocks but share the prefix entry.
    assert not set(peng._slot_blocks[0]) & set(peng._slot_blocks[1])
    peng.run()
    assert [r.done for r in reqs] == [True, True]


def test_paged_prefix_survives_restart(models):
    cfg, flat_model, paged_model = models
    prompts = [PREFIX + [40, 7, 3], PREFIX + [8]]
    base = make_engine(cfg, flat_model, slots=2, steps_per_dispatch=2)
    reqs = [base.submit(p, max_new_tokens=6) for p in prompts]
    base.run()
    want = [r.generated for r in reqs]

    peng = make_engine(cfg, paged_model, slots=2, steps_per_dispatch=2)
    peng.set_shared_prefix(PREFIX)
    r1 = [peng.submit(p, max_new_tokens=6) for p in prompts]
    peng.step()          # admit + some decode
    requeued = peng.restart()   # wipes the pool, re-queues, rewrites prefix
    assert len(requeued) == len(prompts)
    peng.run()
    assert [r.generated for r in r1] == want


def test_paged_prefix_full_budget_pad_overflow(models):
    """Regression: a full-budget prompt whose bucket-padded suffix scatter
    reaches past capacity must steer the pad rows to the garbage sink, not
    clamp them onto the slot's LAST LIVE block (which silently overwrote
    real prompt KV)."""
    cfg, flat_model, paged_model = models
    # 63-token prompt = 22-token prefix + 41 suffix; bucket 8 pads the
    # suffix to 48 -> scatter positions 22..69, of which 64..69 are past
    # capacity and must not land on the slot's 4th (live) block.
    prompt = PREFIX + [(7 * i + 3) % 128 for i in range(41)]
    assert len(prompt) == 63

    flatp = make_engine(cfg, flat_model, slots=2, steps_per_dispatch=1)
    flatp.set_shared_prefix(PREFIX)
    fr = flatp.submit(prompt, max_new_tokens=1)
    flatp.run()

    peng = make_engine(cfg, paged_model, slots=2, steps_per_dispatch=1)
    peng.set_shared_prefix(PREFIX)
    pr = peng.submit(prompt, max_new_tokens=1)
    peng.run()
    assert pr.generated == fr.generated


@pytest.mark.parametrize("family", ["gpt2", "llama"])
def test_paged_int8_kv_matches_flat_int8(models, family):
    """int8 paged pools (the headline KV dtype) == flat int8 caches: the
    per-row absmax quantize happens at write time in both layouts, so the
    stored values — and therefore the tokens — are identical."""
    if family == "gpt2":
        cfg, _, _ = models
        weights = gpt2.random_weights(cfg, seed=11)
        flat = gpt2.build_graph_static_cache(
            cfg, weights, capacity=CAP, kv_quant=True
        )
        paged = gpt2.build_graph_static_cache(
            cfg, weights, capacity=CAP, kv_quant=True,
            paged_blocks=40, block_size=BS,
        )
        n_layer, n_head, head_dim = cfg.n_layer, cfg.n_head, cfg.head_dim
    else:
        from rten_tpu.models import llama

        lcfg = llama.LlamaConfig(
            vocab_size=128, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=128,
        )
        w = llama.random_weights(lcfg, seed=5)
        flat = llama.build_graph_static_cache(lcfg, w, capacity=CAP,
                                              kv_quant=True)
        paged = llama.build_graph_static_cache(
            lcfg, w, capacity=CAP, kv_quant=True,
            paged_blocks=40, block_size=BS,
        )
        n_layer, n_head, head_dim = 2, 4, lcfg.head_dim

    def run(graph):
        eng = ContinuousBatchingEngine(
            Model(graph, ModelOptions(optimize=True)),
            n_layer=n_layer, n_head=n_head, head_dim=head_dim,
            slots=2, capacity=CAP, prefill_bucket=8,
            greedy_on_device=True, steps_per_dispatch=4,
        )
        reqs = [eng.submit(p, max_new_tokens=9) for p in PROMPTS[:3]]
        eng.run()
        return [r.generated for r in reqs]

    assert run(paged) == run(flat)


def test_paged_int8_kernel_interpret_matches_gather():
    from rten_tpu.kernels.flash_attention import (
        decode_mha_xla,
        paged_decode_mha,
        paged_gather_kv,
        paged_gather_scales,
    )

    rng = np.random.default_rng(1)
    B, H, D, BSk, MB, NB = 2, 4, 64, 16, 4, 12
    pool_k = rng.integers(-127, 128, (NB, H, BSk, D)).astype(np.int8)
    pool_v = rng.integers(-127, 128, (NB, H, BSk, D)).astype(np.int8)
    pool_ks = rng.uniform(0.001, 0.02, (NB, H, 1, BSk)).astype(np.float32)
    pool_vs = rng.uniform(0.001, 0.02, (NB, H, 1, BSk)).astype(np.float32)
    bt = rng.permutation(np.arange(1, NB))[: B * MB].reshape(B, MB)
    bt = bt.astype(np.int32)
    lens = np.array([7, 60], np.int32)
    q = rng.standard_normal((B, H, 1, D)).astype(np.float32)

    got = np.asarray(paged_decode_mha(
        q, pool_k, pool_v, lens, bt, pool_ks, pool_vs, interpret=True
    ))
    want = np.asarray(decode_mha_xla(
        q, paged_gather_kv(pool_k, bt), paged_gather_kv(pool_v, bt), lens,
        paged_gather_scales(pool_ks, bt), paged_gather_scales(pool_vs, bt),
    ))
    # int8 pool blocks feed the MXU as bf16 (exact for the s8 side,
    # bf16-rounded q/p — what the on-chip f32 dot does anyway); the XLA
    # golden computes in f32, so the semantic check allows bf16-level error.
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3)

    # Rounding-aware check (round-4 advisor): a golden that EMULATES the
    # kernel's bf16 operand feeding (_dot_f32: bf16 q and p·vs, s8 exact in
    # bf16) pins absolute errors on near-zero outputs 5x tighter; the
    # residual is bf16 rounding variance between the kernel's online-softmax
    # block order and the global softmax (measured max ~5.4e-4 here).
    import jax.numpy as jnp

    def _bf16(x):
        return jnp.asarray(x, jnp.bfloat16).astype(jnp.float32)

    kf = paged_gather_kv(pool_k, bt).astype(jnp.float32)
    vf = paged_gather_kv(pool_v, bt).astype(jnp.float32)
    ks = paged_gather_scales(pool_ks, bt).reshape(B, H, 1, -1)
    vs = paged_gather_scales(pool_vs, bt).reshape(B, H, 1, -1)
    S = kf.shape[2]
    s = jnp.einsum("bhqd,bhkd->bhqk", _bf16(q), kf) / np.sqrt(D) * ks
    s = jnp.where(
        jnp.arange(S)[None, None, None, :]
        <= jnp.asarray(lens).reshape(B, 1, 1, 1),
        s, -1e30,
    )
    p = jnp.exp(s - jnp.max(s, axis=-1, keepdims=True))
    want_bf16 = np.asarray(
        jnp.einsum("bhqk,bhkd->bhqd", _bf16(p * vs), vf)
        / jnp.sum(p, axis=-1, keepdims=True)
    )
    np.testing.assert_allclose(got, want_bf16, rtol=5e-3, atol=1e-3)


# --- round 5: paged + kernel-append unification -------------------------------


@pytest.mark.parametrize("quant", [True, False])
def test_paged_kernel_append_tokens_match_flat_append(models, quant):
    """paged_blocks + kernel_append (cat pools, in-kernel append through
    the block table) must produce exactly the flat kernel_append engine's
    tokens — the round-4 decode design no longer excludes paged memory
    management (round-4 verdict #4)."""
    cfg, _, _ = models
    weights = gpt2.random_weights(cfg, seed=11)
    flat = gpt2.build_graph_static_cache(
        cfg, weights, capacity=CAP, kv_quant=quant, kernel_append=True
    )
    paged = gpt2.build_graph_static_cache(
        cfg, weights, capacity=CAP, kv_quant=quant, kernel_append=True,
        paged_blocks=40, block_size=BS,
    )

    def run(graph):
        eng = make_engine(cfg, Model(graph, ModelOptions(optimize=True)),
                          slots=3, steps_per_dispatch=4)
        reqs = [eng.submit(p, max_new_tokens=11) for p in PROMPTS]
        eng.run()
        return [r.generated for r in reqs], eng

    got, peng = run(paged)
    want, _ = run(flat)
    assert got == want
    assert peng.paged and peng.block_size == BS
    # Blocks fully returned after the wave.
    assert len(peng._free_blocks) == peng.n_blocks - 1


def test_paged_append_kernel_interpret_matches_fallback():
    """The Pallas block-table append kernel (interpret) == the jnp
    fallback: output at bf16-dot tolerance, pools and scale pools exact."""
    from rten_tpu.kernels.flash_attention import (
        _append_cat_paged_fallback,
        decode_mha_append_cat,
    )

    rng = np.random.default_rng(7)
    B, H, D, BSk, MB, NB = 2, 4, 64, 64, 2, 6
    HkvD = H * D
    import jax.numpy as jnp

    q = jnp.asarray(rng.standard_normal((B, H, 1, D)), jnp.float32)
    kn = jnp.asarray(rng.standard_normal((B, H, 1, D)), jnp.float32)
    vn = jnp.asarray(rng.standard_normal((B, H, 1, D)), jnp.float32)
    pool_k = jnp.asarray(rng.integers(-127, 128, (NB, BSk, HkvD)), jnp.int8)
    pool_v = jnp.asarray(rng.integers(-127, 128, (NB, BSk, HkvD)), jnp.int8)
    ks = jnp.asarray(rng.uniform(0.005, 0.02, (NB, H, 1, BSk)), jnp.float32)
    vs = jnp.asarray(rng.uniform(0.005, 0.02, (NB, H, 1, BSk)), jnp.float32)
    bt = jnp.asarray(np.array([[1, 2], [3, 4]], np.int32))
    for lens_l in ([0, 100], [63, 64], [30, 127]):
        lens = jnp.asarray(lens_l, jnp.int32)
        want = _append_cat_paged_fallback(
            q, pool_k, pool_v, lens, ks, vs, k_new=kn, v_new=vn,
            scale=1 / np.sqrt(D), window=0, use_flash=False, block_table=bt,
        )
        got = decode_mha_append_cat(
            q, pool_k, pool_v, lens, ks, vs, k_new=kn, v_new=vn,
            interpret=True, block_table=bt,
        )
        np.testing.assert_allclose(
            np.asarray(got[0]), np.asarray(want[0]), rtol=5e-3, atol=5e-3
        )
        # s8 pools: the absmax/127 divide may compile as a reciprocal
        # multiply on one side (1-ULP scale difference) — tolerate exactly
        # the knife-edge LSB flips that causes (same bound as the on-TPU
        # append-kernel tests); scales agree to f32 roundoff.
        for g, w in zip(got[1:], want[1:]):
            g, w = np.asarray(g), np.asarray(w)
            if g.dtype == np.int8:
                assert np.abs(
                    g.astype(np.int16) - w.astype(np.int16)
                ).max() <= 1
            else:
                np.testing.assert_allclose(g, w, rtol=1e-6, atol=1e-8)


def test_paged_append_second_wave_reuses_blocks(models):
    """Freed (dirty) blocks reused by a second wave through the APPEND
    kernel must not leak stale rows."""
    cfg, _, _ = models
    weights = gpt2.random_weights(cfg, seed=11)
    paged = gpt2.build_graph_static_cache(
        cfg, weights, capacity=CAP, kv_quant=True, kernel_append=True,
        paged_blocks=5, block_size=BS,
    )
    flat = gpt2.build_graph_static_cache(
        cfg, weights, capacity=CAP, kv_quant=True, kernel_append=True
    )
    peng = make_engine(cfg, Model(paged, ModelOptions(optimize=True)),
                       slots=1, steps_per_dispatch=2)
    feng = make_engine(cfg, Model(flat, ModelOptions(optimize=True)),
                       slots=1, steps_per_dispatch=2)
    for prompt in (PROMPTS[0], PROMPTS[2]):
        pr = peng.submit(prompt, max_new_tokens=7)
        peng.run()
        fr = feng.submit(prompt, max_new_tokens=7)
        feng.run()
        assert pr.generated == fr.generated


def test_paged_kernel_append_llama_gqa_matches_flat():
    """GQA (llama) paged + kernel_append == flat kernel_append tokens:
    the block-table append kernel's non-cat_q path with in-op rotary."""
    from rten_tpu.models import llama

    lcfg = llama.LlamaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=128,
    )
    w = llama.random_weights(lcfg, seed=5)
    flat = llama.build_graph_static_cache(
        lcfg, w, capacity=CAP, kv_quant=True, kernel_append=True
    )
    paged = llama.build_graph_static_cache(
        lcfg, w, capacity=CAP, kv_quant=True, kernel_append=True,
        paged_blocks=20, block_size=BS,
    )

    def run(graph):
        eng = ContinuousBatchingEngine(
            Model(graph, ModelOptions(optimize=True)),
            n_layer=2, n_head=4, head_dim=lcfg.head_dim,
            slots=2, capacity=CAP, prefill_bucket=8,
            greedy_on_device=True, steps_per_dispatch=4,
        )
        reqs = [eng.submit(p, max_new_tokens=9) for p in PROMPTS[:3]]
        eng.run()
        return [r.generated for r in reqs]

    assert run(paged) == run(flat)


def test_paged_fold_kernel_interpret_matches_fallback():
    """Round-5 paged VEC FOLD (MB == 1, one pool block per slot): the
    stream machinery gathers blocks/scales through the table per slot
    and write-backs land through the same indirection. Interpret vs the
    jnp fallback: pools/scale pools exact, output at bf16-dot level."""
    from rten_tpu.kernels.flash_attention import (
        _append_cat_paged_fallback,
        decode_mha_append_cat,
    )

    rng = np.random.default_rng(11)
    B, H, D, BSk, NB = 12, 12, 64, 256, 20
    HkvD = H * D
    import jax.numpy as jnp

    q = jnp.asarray(rng.standard_normal((B, H, 1, D)), jnp.float32)
    kn = jnp.asarray(rng.standard_normal((B, H, 1, D)), jnp.float32)
    vn = jnp.asarray(rng.standard_normal((B, H, 1, D)), jnp.float32)
    pool_k = jnp.asarray(rng.integers(-127, 128, (NB, BSk, HkvD)), jnp.int8)
    pool_v = jnp.asarray(rng.integers(-127, 128, (NB, BSk, HkvD)), jnp.int8)
    ks = jnp.asarray(rng.uniform(0.005, 0.02, (NB, H, 1, BSk)), jnp.float32)
    vs = jnp.asarray(rng.uniform(0.005, 0.02, (NB, H, 1, BSk)), jnp.float32)
    bt = jnp.asarray(
        rng.permutation(np.arange(1, NB))[:B].reshape(B, 1), jnp.int32)
    lens = jnp.asarray(rng.integers(0, BSk, (B,)), jnp.int32)
    got = decode_mha_append_cat(
        q, pool_k, pool_v, lens, ks, vs, k_new=kn, v_new=vn,
        interpret=True, block_table=bt,
    )
    want = _append_cat_paged_fallback(
        q, pool_k, pool_v, lens, ks, vs, k_new=kn, v_new=vn,
        scale=1 / np.sqrt(D), window=0, use_flash=False, block_table=bt,
    )
    np.testing.assert_allclose(
        np.asarray(got[0]), np.asarray(want[0]), rtol=5e-3, atol=5e-3
    )
    for g, w in zip(got[1:], want[1:]):
        g, w = np.asarray(g), np.asarray(w)
        if g.dtype == np.int8:
            assert np.abs(g.astype(np.int16) - w.astype(np.int16)).max() <= 1
        else:
            np.testing.assert_allclose(g, w, rtol=1e-6, atol=1e-8)


def test_paged_fold_engine_tokens_match_flat():
    """BS == cap paged serving (the fold-eligible configuration)
    generates the same tokens as the flat kernel-append engine."""
    from rten_tpu.dtypes import DataType

    cfg = gpt2.GPT2Config(
        vocab_size=128, n_positions=128, n_embd=32, n_layer=2, n_head=4
    )
    weights = gpt2.random_weights(cfg, seed=11)
    flat = gpt2.build_graph_static_cache(
        cfg, weights, capacity=CAP, kv_dtype=DataType.Int8,
        kernel_append=True,
    )
    paged = gpt2.build_graph_static_cache(
        cfg, weights, capacity=CAP, kv_dtype=DataType.Int8,
        kernel_append=True, paged_blocks=8, block_size=CAP,
    )

    def run(graph):
        eng = ContinuousBatchingEngine(
            Model(graph, ModelOptions(optimize=True)),
            n_layer=cfg.n_layer, n_head=cfg.n_head, head_dim=cfg.head_dim,
            slots=2, capacity=CAP, prefill_bucket=8,
            greedy_on_device=True, steps_per_dispatch=4,
        )
        reqs = [eng.submit(p, max_new_tokens=9) for p in PROMPTS[:3]]
        eng.run()
        return [r.generated for r in reqs]

    assert run(paged) == run(flat)


def test_paged_fold_gqa_interpret_matches_fallback():
    """GQA (group=4) through the paged vec fold (MB == 1)."""
    from rten_tpu.kernels.flash_attention import (
        _append_cat_paged_fallback,
        decode_mha_append_cat,
    )

    rng = np.random.default_rng(13)
    B, Hq, Hkv, D, BSk, NB = 4, 16, 4, 64, 256, 8
    HkvD = Hkv * D
    import jax.numpy as jnp

    q = jnp.asarray(rng.standard_normal((B, Hq, 1, D)), jnp.float32)
    kn = jnp.asarray(rng.standard_normal((B, Hkv, 1, D)), jnp.float32)
    vn = jnp.asarray(rng.standard_normal((B, Hkv, 1, D)), jnp.float32)
    pool_k = jnp.asarray(rng.integers(-127, 128, (NB, BSk, HkvD)), jnp.int8)
    pool_v = jnp.asarray(rng.integers(-127, 128, (NB, BSk, HkvD)), jnp.int8)
    ks = jnp.asarray(rng.uniform(0.005, 0.02, (NB, Hkv, 1, BSk)), jnp.float32)
    vs = jnp.asarray(rng.uniform(0.005, 0.02, (NB, Hkv, 1, BSk)), jnp.float32)
    bt = jnp.asarray(
        rng.permutation(np.arange(1, NB))[:B].reshape(B, 1), jnp.int32)
    lens = jnp.asarray([0, 17, 130, 255], jnp.int32)
    got = decode_mha_append_cat(
        q, pool_k, pool_v, lens, ks, vs, k_new=kn, v_new=vn,
        interpret=True, block_table=bt,
    )
    want = _append_cat_paged_fallback(
        q, pool_k, pool_v, lens, ks, vs, k_new=kn, v_new=vn,
        scale=1 / np.sqrt(D), window=0, use_flash=False, block_table=bt,
    )
    np.testing.assert_allclose(
        np.asarray(got[0]), np.asarray(want[0]), rtol=5e-3, atol=5e-3
    )
    for g, w in zip(got[1:], want[1:]):
        g, w = np.asarray(g), np.asarray(w)
        if g.dtype == np.int8:
            assert np.abs(g.astype(np.int16) - w.astype(np.int16)).max() <= 1
        else:
            np.testing.assert_allclose(g, w, rtol=1e-6, atol=1e-8)
