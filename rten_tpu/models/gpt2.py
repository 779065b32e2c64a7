"""GPT-2 built in engine IR with Optimum-style KV-cache IO.

Reference flow: rten runs GPT-2 from an Optimum ONNX export
(rten-examples/src/gpt2.rs) through rten-generate. Here the same graph
shape — inputs input_ids/attention_mask/position_ids/past_key_values.N.*,
outputs logits/present.N.* — is built directly from config + weights, so
the Generator drives it identically to an ONNX-loaded model.

Weights come from a HF transformers GPT2LMHeadModel state_dict (random-init
in this offline environment; the graph/math is identical to trained GPT-2).
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
class GPT2Config:
    vocab_size: int = 50257
    n_positions: int = 1024
    n_embd: int = 768
    n_layer: int = 12
    n_head: int = 12
    layer_norm_epsilon: float = 1e-5

    @property
    def head_dim(self) -> int:
        return self.n_embd // self.n_head


# Standard HF checkpoints: gpt2 (124M), gpt2-medium (355M), ...
CONFIGS = {
    "gpt2": GPT2Config(),
    "gpt2-medium": GPT2Config(n_embd=1024, n_layer=24, n_head=16),
    "gpt2-large": GPT2Config(n_embd=1280, n_layer=36, n_head=20),
    "gpt2-xl": GPT2Config(n_embd=1600, n_layer=48, n_head=25),
}


def build_graph(cfg: GPT2Config, weights: Dict[str, np.ndarray]) -> Graph:
    """Build the KV-cached causal-LM graph."""
    b = GraphBuilder()
    E, H, D = cfg.n_embd, cfg.n_head, cfg.head_dim

    def w(name):
        arr = weights[name]
        return b.constant(name, np.ascontiguousarray(arr, np.float32))

    ids = b.input("input_ids", DataType.Int32, ("batch", "seq"))
    mask = b.input("attention_mask", DataType.Int32, ("batch", "total_seq"))
    pos = b.input("position_ids", DataType.Int32, ("batch", "seq"))

    # Embeddings.
    x = b.op("Gather", [w("transformer.wte.weight"), ids])
    x = x + b.op("Gather", [w("transformer.wpe.weight"), pos])

    # Additive attention mask [B,1,1,S]: 0 keep, -1e30 drop.
    mask_f = b.op("Cast", [mask], {"to": DataType.Float})
    neg = b.constant(None, np.float32(-1e30))
    one = b.constant(None, np.float32(1.0))
    add_mask = b.op("Mul", [b.op("Sub", [one, mask_f]), neg])
    add_mask = b.op(
        "Unsqueeze", [add_mask, b.constant(None, np.int32([1, 2]))]
    )

    def layer_norm(h, prefix):
        return b.op(
            "LayerNormalization",
            [h, w(f"{prefix}.weight"), w(f"{prefix}.bias")],
            {"epsilon": cfg.layer_norm_epsilon},
        )

    def to_heads(h):
        # [B,T,E] -> [B,H,T,D]
        r = b.op(
            "Reshape", [h, b.constant(None, np.int32([0, 0, H, D]))]
        )
        return b.op("Transpose", [r], {"perm": [0, 2, 1, 3]})

    def from_heads(h):
        r = b.op("Transpose", [h], {"perm": [0, 2, 1, 3]})
        return b.op("Reshape", [r, b.constant(None, np.int32([0, 0, E]))])

    presents = []
    for i in range(cfg.n_layer):
        p = f"transformer.h.{i}"
        past_k = b.input(
            f"past_key_values.{i}.key", DataType.Float, ("batch", H, "past_seq", D)
        )
        past_v = b.input(
            f"past_key_values.{i}.value", DataType.Float, ("batch", H, "past_seq", D)
        )
        h = layer_norm(x, f"{p}.ln_1")
        qkv = b.op(
            "MatMulAdd", [h, w(f"{p}.attn.c_attn.weight"), w(f"{p}.attn.c_attn.bias")],
            name=f"{p}.attn.c_attn",
        )
        q, k, v = b.op(
            "Split", [qkv], {"axis": -1, "num_outputs": 3}, n_outputs=3
        )
        q, k, v = to_heads(q), to_heads(k), to_heads(v)
        attn, pk, pv = b.op(
            "Attention",
            [q, k, v, add_mask, past_k, past_v],
            {"is_causal": 1},
            n_outputs=3,
            output_names=[
                f"attn_out_{i}", f"present.{i}.key", f"present.{i}.value",
            ],
        )
        presents.extend([pk, pv])
        attn = from_heads(attn)
        proj = b.op(
            "MatMulAdd",
            [attn, w(f"{p}.attn.c_proj.weight"), w(f"{p}.attn.c_proj.bias")],
            name=f"{p}.attn.c_proj",
        )
        x = x + proj
        h2 = layer_norm(x, f"{p}.ln_2")
        fc = b.op(
            "MatMulAdd", [h2, w(f"{p}.mlp.c_fc.weight"), w(f"{p}.mlp.c_fc.bias")],
            name=f"{p}.mlp.c_fc",
        )
        act = b.op("Gelu", [fc], {"approximate": "tanh"})
        mlp = b.op(
            "MatMulAdd", [act, w(f"{p}.mlp.c_proj.weight"), w(f"{p}.mlp.c_proj.bias")],
            name=f"{p}.mlp.c_proj",
        )
        x = x + mlp

    x = layer_norm(x, "transformer.ln_f")
    lm_w = b.constant(
        "lm_head.weight_t",
        np.ascontiguousarray(weights["transformer.wte.weight"].T, np.float32),
    )
    logits = b.op("MatMul", [x, lm_w], name="lm_head", output_names=["logits"])

    b.output(logits, *presents)
    return b.finish()


def build_graph_static_cache(
    cfg: GPT2Config, weights: Dict[str, np.ndarray], capacity: int,
    kv_quant: bool = False, deferred_kv: bool = False,
    recent_dtype: "DataType" = None, kv_dtype: "DataType" = None,
    kv_bits: int = 8, lora_rank: int = 0, n_adapters: int = 0,
    paged_blocks: int = 0, block_size: int = 64,
    kernel_append: bool = False, gather_last: bool = False,
) -> Graph:
    """Serving-engine variant: KV caches are preallocated [slots, H, cap, D]
    buffers written in-graph at per-slot offsets (GroupQueryAttention with
    rten_past_lens), so decode steps donate the buffers and XLA updates
    them in place — the continuous-batching layout from SURVEY.md section 7
    (slot-major cache, lax.dynamic_update_slice + donation).

    Inputs: input_ids [slots, T], past_lens [slots], position_ids
    [slots, T], past_key_values.N.{key,value} [slots, H, cap, D].
    Outputs: logits, present.N.{key,value} (the updated buffers).

    ``deferred_kv`` adds per-layer recent.{i}.key/value window inputs and a
    step_t scalar (``recent_dtype`` selects the window element type —
    bf16 halves the per-step window stream and matches MXU dot precision): decode steps buffer new KV rows in the window (one
    uniform-index write) and the engine commits per-slot rows once per
    fused dispatch instead of running a per-slot dus chain every step.
    """
    b = GraphBuilder()
    E, H, D = cfg.n_embd, cfg.n_head, cfg.head_dim

    def w(name):
        return b.constant(name, np.ascontiguousarray(weights[name], np.float32))

    if paged_blocks:
        # Paged KV cache (vLLM-style block tables; no reference analog —
        # rten is single-sequence). Caches become shared POOLS of
        # block_size-row blocks; the engine assigns blocks per slot via
        # the block_table input. Block 0 is the reserved garbage sink for
        # unallocated entries.
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
    # paged_blocks + kernel_append (round 5): cat-layout block POOLS
    # [n_blocks, block_size, H*D]; the decode kernel appends through the
    # block table (no more scatter+gather per step on the paged path).
    # Decode steps (S==1) merge the new KV row into the cache inside the
    # attention kernel (aliased write-back block) instead of a per-slot
    # dus chain or a deferred window+commit.
    ka_attr = {"rten_kernel_append": 1} if kernel_append else {}

    ids = b.input("input_ids", DataType.Int32, ("slots", "seq"))
    past_lens = b.input("past_lens", DataType.Int32, ("slots",))
    pos = b.input("position_ids", DataType.Int32, ("slots", "seq"))
    block_table = (
        b.input(
            "block_table", DataType.Int32,
            ("slots", capacity // block_size),
        )
        if paged_blocks else None
    )
    step_t = (
        b.input("step_t", DataType.Int32, (1,)) if deferred_kv else None
    )
    if lora_rank and n_adapters < 1:
        raise ValueError("lora_rank > 0 requires n_adapters >= 1")
    # Multi-LoRA serving (S-LoRA style): per-slot adapter selection over
    # STACKED adapter inputs lora.{layer}.{target}.{A,B} [n_adapters, ...];
    # each matmul adds x @ A[slot] @ B[slot] to the frozen base (alpha/r
    # folded into B by the caller). slot_adapter [slots] selects per slot —
    # a batch can mix adapters freely.
    slot_adapter = (
        b.input("slot_adapter", DataType.Int32, ("slots",))
        if lora_rank else None
    )

    def lora(y, x_in, layer_prefix, target, k_in, k_out):
        if not lora_rank:
            return y
        a_stack = b.input(
            f"lora.{layer_prefix}.{target}.A", DataType.Float,
            (n_adapters, k_in, lora_rank),
        )
        b_stack = b.input(
            f"lora.{layer_prefix}.{target}.B", DataType.Float,
            (n_adapters, lora_rank, k_out),
        )
        a_sel = b.op("Gather", [a_stack, slot_adapter])  # [slots, k_in, r]
        b_sel = b.op("Gather", [b_stack, slot_adapter])  # [slots, r, k_out]
        xa = b.op("Einsum", [x_in, a_sel], {"equation": "bse,ber->bsr"})
        return y + b.op("Einsum", [xa, b_sel], {"equation": "bsr,bro->bso"})

    x = b.op("Gather", [w("transformer.wte.weight"), ids])
    x = x + b.op("Gather", [w("transformer.wpe.weight"), pos])

    def layer_norm(h, prefix):
        return b.op(
            "LayerNormalization",
            [h, w(f"{prefix}.weight"), w(f"{prefix}.bias")],
            {"epsilon": cfg.layer_norm_epsilon},
        )

    presents = []
    for i in range(cfg.n_layer):
        p = f"transformer.h.{i}"
        h = layer_norm(x, f"{p}.ln_1")
        qkv = b.op(
            "MatMulAdd", [h, w(f"{p}.attn.c_attn.weight"), w(f"{p}.attn.c_attn.bias")],
            name=f"{p}.attn.c_attn",
        )
        qkv = lora(qkv, h, str(i), "attn.c_attn", E, 3 * E)
        q, k, v = b.op("Split", [qkv], {"axis": -1, "num_outputs": 3}, n_outputs=3)
        if deferred_kv:
            rdt = recent_dtype or DataType.Float
            recent_k = b.input(
                f"recent.{i}.key", rdt, ("slots", H, "recent", D)
            )
            recent_v = b.input(
                f"recent.{i}.value", rdt, ("slots", H, "recent", D)
            )
        if kv_quant and paged_blocks:
            # int8 paged KV: s8 pools + lane-major scale pools addressed by
            # the block table (the headline KV dtype, paged). With
            # kernel_append the pools are cat-layout [NB, BS, H*D] and the
            # decode kernel appends through the table in-kernel.
            pool_shape = (
                (paged_blocks, block_size, H * D) if kernel_append
                else (paged_blocks, H, block_size, D)
            )
            past_k = b.input(
                f"past_key_values.{i}.key", DataType.Int8, pool_shape
            )
            k_sc = b.input(
                f"past_key_values.{i}.key_scale", DataType.Float,
                (paged_blocks, H, 1, block_size),
            )
            past_v = b.input(
                f"past_key_values.{i}.value", DataType.Int8, pool_shape
            )
            v_sc = b.input(
                f"past_key_values.{i}.value_scale", DataType.Float,
                (paged_blocks, H, 1, block_size),
            )
            attn, pk, pks, pv, pvs = b.op(
                "QuantizedKVAttention",
                [q, k, v, past_k, k_sc, past_v, v_sc, past_lens,
                 block_table],
                {"num_heads": H, "bits": kv_bits, "rten_paged": 1,
                 **ka_attr},
                n_outputs=5,
                output_names=[
                    f"attn_out_{i}", f"present.{i}.key",
                    f"present.{i}.key_scale", f"present.{i}.value",
                    f"present.{i}.value_scale",
                ],
            )
            presents.extend([pk, pks, pv, pvs])
        elif kv_quant:
            # kv_bits=4: nibble-packed u8 cache at HALF the head-dim lanes
            # (kernels/flash_attention.pack_int4) — 8x f32's context
            # capacity per HBM byte, scales unchanged.
            kv_elem = DataType.UInt8 if kv_bits == 4 else DataType.Int8
            kv_d = D // 2 if kv_bits == 4 else D
            # kernel_append caches live in cat layout [slots, cap, H*D]:
            # full-lane s8 tiles stream at 732 GB/s vs 444 for the
            # head-major D=64 minor dim (round-4 microbench).
            kv_shape = (
                ("slots", capacity, H * kv_d) if kernel_append
                else ("slots", H, capacity, kv_d)
            )
            past_k = b.input(f"past_key_values.{i}.key", kv_elem, kv_shape)
            k_sc = b.input(
                f"past_key_values.{i}.key_scale", DataType.Float,
                ("slots", H, capacity, 1),
            )
            past_v = b.input(f"past_key_values.{i}.value", kv_elem, kv_shape)
            v_sc = b.input(
                f"past_key_values.{i}.value_scale", DataType.Float,
                ("slots", H, capacity, 1),
            )
            if deferred_kv:
                outs = b.op(
                    "QuantizedKVAttention",
                    [q, k, v, past_k, k_sc, past_v, v_sc, past_lens,
                     recent_k, recent_v, step_t],
                    {"num_heads": H, "rten_recent_kv": 1, "bits": kv_bits},
                    n_outputs=7,
                    output_names=[
                        f"attn_out_{i}", f"present.{i}.key",
                        f"present.{i}.key_scale", f"present.{i}.value",
                        f"present.{i}.value_scale",
                        f"recent_present.{i}.key", f"recent_present.{i}.value",
                    ],
                )
                attn = outs[0]
                presents.extend(outs[1:])
            else:
                attn, pk, pks, pv, pvs = b.op(
                    "QuantizedKVAttention",
                    [q, k, v, past_k, k_sc, past_v, v_sc, past_lens],
                    {"num_heads": H, "bits": kv_bits, **ka_attr},
                    n_outputs=5,
                    output_names=[
                        f"attn_out_{i}", f"present.{i}.key", f"present.{i}.key_scale",
                        f"present.{i}.value", f"present.{i}.value_scale",
                    ],
                )
                presents.extend([pk, pks, pv, pvs])
        else:
            # kv_dtype=BFloat16: half the decode-attention stream of f32 at
            # effectively MXU precision (dots run in bf16 on TPU anyway),
            # with none of the int8 path's dequant converts or scale
            # buffers. 2x context capacity per HBM byte.
            kdt = kv_dtype or DataType.Float
            if paged_blocks:
                pool_shape = (
                    (paged_blocks, block_size, H * D) if kernel_append
                    else (paged_blocks, H, block_size, D)
                )
                past_k = b.input(
                    f"past_key_values.{i}.key", kdt, pool_shape
                )
                past_v = b.input(
                    f"past_key_values.{i}.value", kdt, pool_shape
                )
                attn, pk, pv = b.op(
                    "GroupQueryAttention",
                    [q, k, v, past_k, past_v, past_lens, None, None, None,
                     block_table],
                    {"num_heads": H, "kv_num_heads": H, "rten_past_lens": 1,
                     "rten_paged": 1, **ka_attr},
                    n_outputs=3,
                    output_names=[
                        f"attn_out_{i}", f"present.{i}.key",
                        f"present.{i}.value",
                    ],
                )
                presents.extend([pk, pv])
            elif deferred_kv:
                past_k = b.input(
                    f"past_key_values.{i}.key", kdt, ("slots", H, capacity, D)
                )
                past_v = b.input(
                    f"past_key_values.{i}.value", kdt, ("slots", H, capacity, D)
                )
                outs = b.op(
                    "GroupQueryAttention",
                    [q, k, v, past_k, past_v, past_lens, None, None, None,
                     recent_k, recent_v, step_t],
                    {"num_heads": H, "kv_num_heads": H, "rten_past_lens": 1,
                     "rten_recent_kv": 1},
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
                kv_shape = (
                    ("slots", capacity, H * D) if kernel_append
                    else ("slots", H, capacity, D)
                )
                past_k = b.input(f"past_key_values.{i}.key", kdt, kv_shape)
                past_v = b.input(f"past_key_values.{i}.value", kdt, kv_shape)
                attn, pk, pv = b.op(
                    "GroupQueryAttention",
                    [q, k, v, past_k, past_v, past_lens],
                    {"num_heads": H, "kv_num_heads": H, "rten_past_lens": 1,
                     **ka_attr},
                    n_outputs=3,
                    output_names=[
                        f"attn_out_{i}", f"present.{i}.key", f"present.{i}.value",
                    ],
                )
                presents.extend([pk, pv])
        proj = b.op(
            "MatMulAdd",
            [attn, w(f"{p}.attn.c_proj.weight"), w(f"{p}.attn.c_proj.bias")],
            name=f"{p}.attn.c_proj",
        )
        proj = lora(proj, attn, str(i), "attn.c_proj", E, E)
        x = x + proj
        h2 = layer_norm(x, f"{p}.ln_2")
        fc = b.op(
            "MatMulAdd", [h2, w(f"{p}.mlp.c_fc.weight"), w(f"{p}.mlp.c_fc.bias")],
            name=f"{p}.mlp.c_fc",
        )
        act = b.op("Gelu", [fc], {"approximate": "tanh"})
        mlp = b.op(
            "MatMulAdd", [act, w(f"{p}.mlp.c_proj.weight"), w(f"{p}.mlp.c_proj.bias")],
            name=f"{p}.mlp.c_proj",
        )
        x = x + mlp

    x = layer_norm(x, "transformer.ln_f")
    if gather_last:
        # Serving prefill computes hidden states for the whole bucket but
        # only the prompt-final position's logits are consumed; the
        # lm_head is an opaque int8 Pallas call once quantized, so XLA
        # cannot push the engine's post-hoc gather through it — at a
        # 96x128 admission that cost a 950-GFLOP lm_head + a 2.5GB logits
        # buffer + a 7.6ms slice (round-4 trace). Gather ONE row per slot
        # first; decode steps feed last_pos = 0.
        last_pos = b.input("last_pos", DataType.Int32, ("slots",))
        idx3 = b.op(
            "Reshape",
            [last_pos, b.constant(
                "last_pos_shape", np.array([0, 1, 1], np.int64)
            )],
        )
        x = b.op("GatherND", [x, idx3], {"batch_dims": 1})  # [slots,1,E]
    lm_w = b.constant(
        "lm_head.weight_t",
        np.ascontiguousarray(weights["transformer.wte.weight"].T, np.float32),
    )
    logits = b.op("MatMul", [x, lm_w], name="lm_head", output_names=["logits"])
    # On-device greedy token: callers that only need argmax sampling fetch
    # this [slots, T] int output instead of the [slots, T, V] logits —
    # shrinking the per-step device->host transfer by V/1.
    next_tok = b.op(
        "ArgMax", [logits], {"axis": -1, "keepdims": 0},
        output_names=["next_token"],
    )
    b.output(logits, *presents)
    b.graph.output_ids.append(next_tok.node_id)
    return b.finish()


def random_weights(cfg: GPT2Config, seed: int = 0) -> Dict[str, np.ndarray]:
    """GPT-2-initialization random weights (offline stand-in for trained
    checkpoints; same shapes/layout as HF `GPT2LMHeadModel.state_dict()`,
    with Conv1D weights stored [in, out])."""
    rng = np.random.default_rng(seed)
    E = cfg.n_embd
    wdict: Dict[str, np.ndarray] = {}

    def nrm(*shape, std=0.02):
        return (rng.standard_normal(shape) * std).astype(np.float32)

    wdict["transformer.wte.weight"] = nrm(cfg.vocab_size, E)
    wdict["transformer.wpe.weight"] = nrm(cfg.n_positions, E, std=0.01)
    for i in range(cfg.n_layer):
        p = f"transformer.h.{i}"
        wdict[f"{p}.ln_1.weight"] = np.ones(E, np.float32)
        wdict[f"{p}.ln_1.bias"] = np.zeros(E, np.float32)
        wdict[f"{p}.attn.c_attn.weight"] = nrm(E, 3 * E)
        wdict[f"{p}.attn.c_attn.bias"] = np.zeros(3 * E, np.float32)
        wdict[f"{p}.attn.c_proj.weight"] = nrm(E, E, std=0.02 / np.sqrt(2 * cfg.n_layer))
        wdict[f"{p}.attn.c_proj.bias"] = np.zeros(E, np.float32)
        wdict[f"{p}.ln_2.weight"] = np.ones(E, np.float32)
        wdict[f"{p}.ln_2.bias"] = np.zeros(E, np.float32)
        wdict[f"{p}.mlp.c_fc.weight"] = nrm(E, 4 * E)
        wdict[f"{p}.mlp.c_fc.bias"] = np.zeros(4 * E, np.float32)
        wdict[f"{p}.mlp.c_proj.weight"] = nrm(4 * E, E, std=0.02 / np.sqrt(2 * cfg.n_layer))
        wdict[f"{p}.mlp.c_proj.bias"] = np.zeros(E, np.float32)
    wdict["transformer.ln_f.weight"] = np.ones(E, np.float32)
    wdict["transformer.ln_f.bias"] = np.zeros(E, np.float32)
    return wdict


def weights_from_torch(module) -> Dict[str, np.ndarray]:
    """Extract weights from a transformers GPT2LMHeadModel."""
    sd = module.state_dict()
    return {
        k: v.detach().cpu().numpy()
        for k, v in sd.items()
        if not k.endswith(".attn.bias") and not k.endswith(".attn.masked_bias")
        and k != "lm_head.weight"
    }


def load(
    cfg: GPT2Config | str = "gpt2",
    weights: Optional[Dict[str, np.ndarray]] = None,
    quantize: Optional[str] = None,
    options: Optional[ModelOptions] = None,
    seed: int = 0,
) -> Model:
    """Build a runnable GPT-2 Model. quantize: None | 'int8'."""
    if isinstance(cfg, str):
        cfg = CONFIGS[cfg]
    if weights is None:
        weights = random_weights(cfg, seed)
    graph = build_graph(cfg, weights)
    options = options or ModelOptions()
    if quantize == "int8":
        from ..quantize_pass import quantize_dynamic

        graph = quantize_dynamic(graph)
    elif quantize == "int4":
        from ..quantize_pass import quantize_weight_only_int4

        graph = quantize_weight_only_int4(graph)
    elif quantize is not None:
        raise ValueError(f"unknown quantize mode {quantize}")
    return Model(graph, options)
