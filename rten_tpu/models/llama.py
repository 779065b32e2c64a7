"""Llama/Qwen2-architecture causal LM in engine IR (RMSNorm + rotary +
GQA + SwiGLU), serving-engine static-cache variant.

The reference runs llama/qwen2 from Optimum ONNX exports through
rten-generate (rten-examples/src/{llama,qwen2_chat}.rs); the generic ONNX
path here is covered by tests/test_llama_like_generate.py. This module is
the CONTINUOUS-BATCHING graph: preallocated [slots, Hkv, cap, D] KV
buffers written at per-slot offsets by GroupQueryAttention(rten_past_lens)
with in-op rotary — the decode path runs the Pallas decode-attention
kernel with real grouped KV heads (kernels/flash_attention.decode_mha).

Weight naming follows HF LlamaForCausalLM state_dict:
  model.embed_tokens.weight, model.layers.N.self_attn.{q,k,v,o}_proj.weight,
  model.layers.N.{input_layernorm,post_attention_layernorm}.weight,
  model.layers.N.mlp.{gate,up,down}_proj.weight, model.norm.weight,
  lm_head.weight.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import numpy as np

from ..dtypes import DataType
from ..ir.builder import GraphBuilder
from ..ir.graph import Graph
from ..model import Model, ModelOptions


@dataclasses.dataclass
class LlamaConfig:
    vocab_size: int = 32000
    hidden_size: int = 2048
    intermediate_size: int = 5632
    num_hidden_layers: int = 22
    num_attention_heads: int = 32
    num_key_value_heads: int = 4
    max_position_embeddings: int = 2048
    rms_norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    tie_word_embeddings: bool = False
    # Qwen2-style q/k/v projection biases (the only architectural delta
    # between Llama and Qwen2 at this level — set True for Qwen2 weights).
    attention_bias: bool = False
    # Mistral-style sliding-window attention: each position attends only
    # the last `sliding_window` keys (0 = full attention). Requires
    # deferred_kv=False serving graphs.
    sliding_window: int = 0

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads


def rope_tables(cfg: LlamaConfig):
    """cos/sin caches [max_pos, D/2] (ONNX RotaryEmbedding layout)."""
    D = cfg.head_dim
    inv = 1.0 / (cfg.rope_theta ** (np.arange(0, D, 2, dtype=np.float64) / D))
    t = np.arange(cfg.max_position_embeddings, dtype=np.float64)
    freqs = np.outer(t, inv)
    return freqs.astype(np.float32), freqs.astype(np.float32)  # cos/sin args


def build_graph_static_cache(
    cfg: LlamaConfig, weights: Dict[str, np.ndarray], capacity: int,
    deferred_kv: bool = False, recent_dtype: DataType = None,
    kv_dtype: DataType = None, kv_quant: bool = False, kv_bits: int = 8,
    paged_blocks: int = 0, block_size: int = 64,
    kernel_append: bool = False, gather_last: bool = False,
) -> Graph:
    """Serving graph: inputs input_ids [slots,seq], past_lens [slots],
    position_ids [slots,seq]; outputs logits, present.N.{key,value},
    next_token (on-device argmax).

    ``deferred_kv``: per-layer recent.{i}.key/value window inputs + step_t
    (see gpt2.build_graph_static_cache) — decode KV rows buffer in a small
    window with a uniform-index write; the engine commits once per fused
    dispatch.

    ``kv_quant``: quantized KV cache via QuantizedKVAttention with GQA +
    in-op rotary (do_rotary; positions derive from past_lens). kv_bits=8
    is the s8 absmax/127 cache; kv_bits=4 the nibble-packed u8 cache at
    D/2 lanes (kernels/flash_attention.pack_int4)."""
    b = GraphBuilder()
    E = cfg.hidden_size
    Hq, Hkv, D = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim

    def w_t(name):
        # torch Linear stores [out, in]; matmul wants [in, out].
        return b.constant(
            name + ".T", np.ascontiguousarray(weights[name].T, np.float32)
        )

    def w(name):
        return b.constant(name, np.ascontiguousarray(weights[name], np.float32))

    if paged_blocks:
        # Paged KV cache (see gpt2.build_graph_static_cache): caches become
        # a shared block pool + block_table input; v1 is f32/bf16 KV only.
        if deferred_kv or (kv_quant and kv_bits != 8):
            raise ValueError(
                "paged_blocks is incompatible with deferred_kv and with "
                "int4 (kv_bits=4) caches"
            )
        if capacity % block_size or block_size % 8:
            raise ValueError(
                "capacity must be a multiple of block_size, and block_size "
                f"a multiple of 8 (got {capacity=}, {block_size=})"
            )
    if kernel_append and (deferred_kv or kv_bits != 8):
        raise ValueError(
            "kernel_append (in-kernel cache append) is incompatible with "
            "deferred_kv and int4 caches"
        )
    # paged_blocks + kernel_append (round 5): cat-layout block pools; the
    # decode kernel appends through the block table (see models/gpt2.py).
    ka_attr = {"rten_kernel_append": 1} if kernel_append else {}

    ids = b.input("input_ids", DataType.Int32, ("slots", "seq"))
    past_lens = b.input("past_lens", DataType.Int32, ("slots",))
    step_t = (
        b.input("step_t", DataType.Int32, (1,)) if deferred_kv else None
    )
    b.input("position_ids", DataType.Int32, ("slots", "seq"))  # unused: GQA
    # derives rotary positions from past_lens (kept for engine IO parity).
    block_table = (
        b.input(
            "block_table", DataType.Int32,
            ("slots", capacity // block_size),
        )
        if paged_blocks else None
    )

    cos_np, sin_np = rope_tables(cfg)
    cos_c = b.constant("rope.cos", np.cos(cos_np))
    sin_c = b.constant("rope.sin", np.sin(sin_np))

    x = b.op("Gather", [w("model.embed_tokens.weight"), ids])

    def rms(h, name):
        return b.op(
            "RMSNormalization", [h, w(name)], {"epsilon": cfg.rms_norm_eps}
        )

    def block_tail(x, attn, p):
        """o_proj residual + RMSNorm + SwiGLU MLP (shared by the f32 and
        quantized-KV attention variants)."""
        x = x + b.op("MatMul", [attn, w_t(f"{p}.self_attn.o_proj.weight")],
                     name=f"{p}.self_attn.o_proj")
        h2 = rms(x, f"{p}.post_attention_layernorm.weight")
        gate = b.op("MatMul", [h2, w_t(f"{p}.mlp.gate_proj.weight")],
                    name=f"{p}.mlp.gate_proj")
        up = b.op("MatMul", [h2, w_t(f"{p}.mlp.up_proj.weight")],
                  name=f"{p}.mlp.up_proj")
        act = b.op("Mul", [b.op("Silu", [gate]), up])
        return x + b.op("MatMul", [act, w_t(f"{p}.mlp.down_proj.weight")],
                        name=f"{p}.mlp.down_proj")

    def proj(h, name):
        if cfg.attention_bias:
            return b.op(
                "MatMulAdd", [h, w_t(f"{name}.weight"), w(f"{name}.bias")],
                name=name,
            )
        return b.op("MatMul", [h, w_t(f"{name}.weight")], name=name)

    presents = []
    for i in range(cfg.num_hidden_layers):
        p = f"model.layers.{i}"
        h = rms(x, f"{p}.input_layernorm.weight")
        q = proj(h, f"{p}.self_attn.q_proj")
        k = proj(h, f"{p}.self_attn.k_proj")
        v = proj(h, f"{p}.self_attn.v_proj")
        if kv_quant and paged_blocks:
            # int8 paged KV with in-op rotary (positions from past_lens).
            pool_shape = (
                (paged_blocks, block_size, Hkv * D) if kernel_append
                else (paged_blocks, Hkv, block_size, D)
            )
            past_k = b.input(
                f"past_key_values.{i}.key", DataType.Int8, pool_shape
            )
            k_sc = b.input(
                f"past_key_values.{i}.key_scale", DataType.Float,
                (paged_blocks, Hkv, 1, block_size),
            )
            past_v = b.input(
                f"past_key_values.{i}.value", DataType.Int8, pool_shape
            )
            v_sc = b.input(
                f"past_key_values.{i}.value_scale", DataType.Float,
                (paged_blocks, Hkv, 1, block_size),
            )
            qattrs = {
                "num_heads": Hq, "kv_num_heads": Hkv, "bits": kv_bits,
                "do_rotary": 1, "rten_paged": 1, **ka_attr,
            }
            if cfg.sliding_window:
                qattrs["local_window_size"] = cfg.sliding_window
            outs = b.op(
                "QuantizedKVAttention",
                [q, k, v, past_k, k_sc, past_v, v_sc, past_lens,
                 block_table, cos_c, sin_c],
                qattrs,
                n_outputs=5,
                output_names=[
                    f"attn_out_{i}", f"present.{i}.key",
                    f"present.{i}.key_scale", f"present.{i}.value",
                    f"present.{i}.value_scale",
                ],
            )
            x = block_tail(x, outs[0], p)
            presents.extend(outs[1:])
            continue
        if kv_quant:
            kv_elem = DataType.UInt8 if kv_bits == 4 else DataType.Int8
            kv_d = D // 2 if kv_bits == 4 else D
            # kernel_append caches live in cat layout [slots, cap, Hkv*D]
            # (full-lane s8 tiles; see models/gpt2.py).
            kv_shape = (
                ("slots", capacity, Hkv * kv_d) if kernel_append
                else ("slots", Hkv, capacity, kv_d)
            )
            past_k = b.input(f"past_key_values.{i}.key", kv_elem, kv_shape)
            k_sc = b.input(
                f"past_key_values.{i}.key_scale", DataType.Float,
                ("slots", Hkv, capacity, 1),
            )
            past_v = b.input(f"past_key_values.{i}.value", kv_elem, kv_shape)
            v_sc = b.input(
                f"past_key_values.{i}.value_scale", DataType.Float,
                ("slots", Hkv, capacity, 1),
            )
            qattrs = {
                "num_heads": Hq, "kv_num_heads": Hkv, "bits": kv_bits,
                "do_rotary": 1,
            }
            if cfg.sliding_window:
                qattrs["local_window_size"] = cfg.sliding_window
            if deferred_kv:
                rdt = recent_dtype or DataType.Float
                recent_k = b.input(
                    f"recent.{i}.key", rdt, ("slots", Hkv, "recent", D)
                )
                recent_v = b.input(
                    f"recent.{i}.value", rdt, ("slots", Hkv, "recent", D)
                )
                outs = b.op(
                    "QuantizedKVAttention",
                    [q, k, v, past_k, k_sc, past_v, v_sc, past_lens,
                     recent_k, recent_v, step_t, cos_c, sin_c],
                    {**qattrs, "rten_recent_kv": 1},
                    n_outputs=7,
                    output_names=[
                        f"attn_out_{i}", f"present.{i}.key",
                        f"present.{i}.key_scale", f"present.{i}.value",
                        f"present.{i}.value_scale",
                        f"recent_present.{i}.key",
                        f"recent_present.{i}.value",
                    ],
                )
                attn = outs[0]
                presents.extend(outs[1:])
            else:
                outs = b.op(
                    "QuantizedKVAttention",
                    [q, k, v, past_k, k_sc, past_v, v_sc, past_lens,
                     cos_c, sin_c],
                    {**qattrs, **ka_attr},
                    n_outputs=5,
                    output_names=[
                        f"attn_out_{i}", f"present.{i}.key",
                        f"present.{i}.key_scale", f"present.{i}.value",
                        f"present.{i}.value_scale",
                    ],
                )
                attn = outs[0]
                presents.extend(outs[1:])
            x = block_tail(x, attn, p)
            continue
        kdt = kv_dtype or DataType.Float
        if paged_blocks:
            pool_shape = (
                (paged_blocks, block_size, Hkv * D) if kernel_append
                else (paged_blocks, Hkv, block_size, D)
            )
            past_k = b.input(
                f"past_key_values.{i}.key", kdt, pool_shape
            )
            past_v = b.input(
                f"past_key_values.{i}.value", kdt, pool_shape
            )
            attn, pk, pv = b.op(
                "GroupQueryAttention",
                [q, k, v, past_k, past_v, past_lens, None, cos_c, sin_c,
                 block_table],
                {
                    "num_heads": Hq, "kv_num_heads": Hkv,
                    "rten_past_lens": 1, "do_rotary": 1, "rten_paged": 1,
                    **ka_attr,
                    **({"local_window_size": cfg.sliding_window}
                       if cfg.sliding_window else {}),
                },
                n_outputs=3,
                output_names=[
                    f"attn_out_{i}", f"present.{i}.key", f"present.{i}.value",
                ],
            )
            presents.extend([pk, pv])
            x = block_tail(x, attn, p)
            continue
        kv_shape = (
            ("slots", capacity, Hkv * D) if kernel_append
            else ("slots", Hkv, capacity, D)
        )
        past_k = b.input(f"past_key_values.{i}.key", kdt, kv_shape)
        past_v = b.input(f"past_key_values.{i}.value", kdt, kv_shape)
        if deferred_kv:
            rdt = recent_dtype or DataType.Float
            recent_k = b.input(
                f"recent.{i}.key", rdt, ("slots", Hkv, "recent", D)
            )
            recent_v = b.input(
                f"recent.{i}.value", rdt, ("slots", Hkv, "recent", D)
            )
            outs = b.op(
                "GroupQueryAttention",
                [q, k, v, past_k, past_v, past_lens, None, cos_c, sin_c,
                 recent_k, recent_v, step_t],
                {
                    "num_heads": Hq, "kv_num_heads": Hkv,
                    "rten_past_lens": 1, "do_rotary": 1,
                    "rten_recent_kv": 1,
                    **({"local_window_size": cfg.sliding_window}
                       if cfg.sliding_window else {}),
                },
                n_outputs=5,
                output_names=[
                    f"attn_out_{i}", f"present.{i}.key",
                    f"present.{i}.value",
                    f"recent_present.{i}.key", f"recent_present.{i}.value",
                ],
            )
            attn = outs[0]
            presents.extend(outs[1:])
        else:
            attn, pk, pv = b.op(
                "GroupQueryAttention",
                [q, k, v, past_k, past_v, past_lens, None, cos_c, sin_c],
                {
                    "num_heads": Hq, "kv_num_heads": Hkv, "rten_past_lens": 1,
                    "do_rotary": 1, **ka_attr,
                    **({"local_window_size": cfg.sliding_window}
                       if cfg.sliding_window else {}),
                },
                n_outputs=3,
                output_names=[
                    f"attn_out_{i}", f"present.{i}.key", f"present.{i}.value",
                ],
            )
            presents.extend([pk, pv])
        x = block_tail(x, attn, p)

    x = rms(x, "model.norm.weight")
    if gather_last:
        # Only the prompt-final row's logits are consumed at prefill;
        # gather it before the (opaque once-quantized) lm_head. See
        # models/gpt2.py.
        last_pos = b.input("last_pos", DataType.Int32, ("slots",))
        idx3 = b.op(
            "Reshape",
            [last_pos, b.constant(
                "last_pos_shape", np.array([0, 1, 1], np.int64)
            )],
        )
        x = b.op("GatherND", [x, idx3], {"batch_dims": 1})
    lm_name = (
        "model.embed_tokens.weight" if cfg.tie_word_embeddings else "lm_head.weight"
    )
    logits = b.op("MatMul", [x, w_t(lm_name)], name="lm_head",
                  output_names=["logits"])
    next_tok = b.op(
        "ArgMax", [logits], {"axis": -1, "keepdims": 0},
        output_names=["next_token"],
    )
    b.output(logits, *presents)
    b.graph.output_ids.append(next_tok.node_id)
    return b.finish()


def random_weights(cfg: LlamaConfig, seed: int = 0) -> Dict[str, np.ndarray]:
    rng = np.random.default_rng(seed)
    E, F, V = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    Hq, Hkv, D = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim

    def nrm(*shape, std=0.02):
        return (rng.standard_normal(shape) * std).astype(np.float32)

    wd = {"model.embed_tokens.weight": nrm(V, E), "model.norm.weight": np.ones(E, np.float32)}
    if not cfg.tie_word_embeddings:
        wd["lm_head.weight"] = nrm(V, E)
    for i in range(cfg.num_hidden_layers):
        p = f"model.layers.{i}"
        wd[f"{p}.self_attn.q_proj.weight"] = nrm(Hq * D, E)
        wd[f"{p}.self_attn.k_proj.weight"] = nrm(Hkv * D, E)
        wd[f"{p}.self_attn.v_proj.weight"] = nrm(Hkv * D, E)
        if cfg.attention_bias:
            wd[f"{p}.self_attn.q_proj.bias"] = nrm(Hq * D)
            wd[f"{p}.self_attn.k_proj.bias"] = nrm(Hkv * D)
            wd[f"{p}.self_attn.v_proj.bias"] = nrm(Hkv * D)
        wd[f"{p}.self_attn.o_proj.weight"] = nrm(E, Hq * D)
        wd[f"{p}.mlp.gate_proj.weight"] = nrm(F, E)
        wd[f"{p}.mlp.up_proj.weight"] = nrm(F, E)
        wd[f"{p}.mlp.down_proj.weight"] = nrm(E, F)
        wd[f"{p}.input_layernorm.weight"] = np.ones(E, np.float32)
        wd[f"{p}.post_attention_layernorm.weight"] = np.ones(E, np.float32)
    return wd


def weights_from_torch(module) -> Dict[str, np.ndarray]:
    """HF LlamaForCausalLM (or tests/llama_like_model.LlamaLike) weights."""
    sd = {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}
    if "model.embed_tokens.weight" in sd:
        return sd
    # tests/llama_like_model naming -> HF naming.
    out = {}
    ren = {
        "embed_tokens.weight": "model.embed_tokens.weight",
        "norm.weight": "model.norm.weight",
        "lm_head.weight": "lm_head.weight",
    }
    for k, v in sd.items():
        if k in ren:
            out[ren[k]] = v
            continue
        if k.startswith("layers."):
            parts = k.split(".")
            i, rest = parts[1], ".".join(parts[2:])
            rest = {
                "q_proj.weight": "self_attn.q_proj.weight",
                "k_proj.weight": "self_attn.k_proj.weight",
                "v_proj.weight": "self_attn.v_proj.weight",
                "q_proj.bias": "self_attn.q_proj.bias",
                "k_proj.bias": "self_attn.k_proj.bias",
                "v_proj.bias": "self_attn.v_proj.bias",
                "o_proj.weight": "self_attn.o_proj.weight",
                "gate_proj.weight": "mlp.gate_proj.weight",
                "up_proj.weight": "mlp.up_proj.weight",
                "down_proj.weight": "mlp.down_proj.weight",
                "input_norm.weight": "input_layernorm.weight",
                "post_norm.weight": "post_attention_layernorm.weight",
            }.get(rest, rest)
            out[f"model.layers.{i}.{rest}"] = v
    return out
