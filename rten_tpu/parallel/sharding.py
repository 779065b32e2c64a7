"""Sharding plans: name-pattern -> PartitionSpec rules.

Megatron-style tensor parallelism for transformer blocks, expressed as
GSPMD annotations (the scaling-book recipe: annotate weights, let XLA
insert the collectives):

* QKV / MLP-up projections: column-parallel  [E, 3E|4E] -> P(None, 'model')
* attn-out / MLP-down:      row-parallel     [*, E]     -> P('model', None)
* LM head:                  column-parallel over vocab
* KV caches:                heads on the model axis
* token inputs / masks:     batch on the data axis
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ir.graph import Constant, Graph

# (regex on node name, PartitionSpec) — first match wins.
GPT2_SHARDING_RULES: List[Tuple[str, P]] = [
    (r"\.attn\.c_attn\.weight$", P(None, "model")),
    (r"\.attn\.c_attn\.bias$", P("model")),
    (r"\.attn\.c_proj\.weight$", P("model", None)),
    (r"\.mlp\.c_fc\.weight$", P(None, "model")),
    (r"\.mlp\.c_fc\.bias$", P("model")),
    (r"\.mlp\.c_proj\.weight$", P("model", None)),
    (r"^lm_head\.weight_t$", P(None, "model")),
    (r"^transformer\.wte\.weight$", P(None, None)),
    # int8-quantized variants produced by quantize_pass (same layouts).
    (r"\.attn\.c_attn\.weight\.q8$", P(None, "model")),
    (r"\.attn\.c_attn\.weight\.scales$", P("model")),
    (r"\.attn\.c_proj\.weight\.q8$", P("model", None)),
    (r"\.mlp\.c_fc\.weight\.q8$", P(None, "model")),
    (r"\.mlp\.c_fc\.weight\.scales$", P("model")),
    (r"\.mlp\.c_proj\.weight\.q8$", P("model", None)),
    (r"\.scales$", P(None)),
]

# Runtime inputs for causal-LM graphs.
GPT2_INPUT_RULES: List[Tuple[str, P]] = [
    (r"^input_ids$", P("data", None)),
    (r"^attention_mask$", P("data", None)),
    (r"^position_ids$", P("data", None)),
    (r"^past_key_values\..*\.(key|value)$", P("data", "model", None, None)),
]

# Sequence-parallel (SP) prefill: long-prompt activations sharded along the
# TOKEN axis over the 'model' mesh axis (weights replicated). Embeddings,
# norms and MLPs are token-pointwise so the sharding propagates for free;
# at attention GSPMD all-gathers K/V along ICI while Q/scores/output stay
# token-sharded — the standard pjit-SP prefill recipe (scaling-book ch.
# "inference"; no reference analog — rten is single-threaded per op,
# SURVEY §2.6). Use for prompts long enough that prefill FLOPs dominate;
# token count must divide the 'model' axis size.
SP_PREFILL_INPUT_RULES: List[Tuple[str, P]] = [
    (r"^input_ids$", P("data", "model")),
    (r"^attention_mask$", P("data", None)),
    (r"^position_ids$", P("data", "model")),
    (r"^past_key_values\..*\.(key|value)$", P("data", None, None, None)),
]

# Expert parallelism: the MoE op's stacked [n_experts, ...] weights shard
# on the leading expert axis; each device computes its experts' einsum
# slice and GSPMD psums the gate-weighted combine (ops/moe.py). The expert
# axis rides the 'model' mesh axis (the usual inference layout — EP and TP
# trade the same ICI links); routers replicate.
MOE_EP_RULES: List[Tuple[str, P]] = [
    (r"\.moe\.(w_up|w_down|b_up|b_down)$", P("model")),
    (r"\.moe\.router_w$", P()),
]


def sharding_for_name(
    name: Optional[str], rules: List[Tuple[str, P]]
) -> Optional[P]:
    if name is None:
        return None
    for pat, spec in rules:
        if re.search(pat, name):
            return spec
    return None


from ..ir.graph import is_weight_constant  # noqa: E402 (shared predicate)


def shard_constants(
    graph: Graph,
    mesh: Mesh,
    rules: List[Tuple[str, P]] = GPT2_SHARDING_RULES,
    dtype=None,
    min_size: int = 16,
) -> Dict[int, jax.Array]:
    """device_put every weight-like constant with its rule's NamedSharding
    (replicated when no rule matches). Returns {node_id: sharded array} to
    feed as executor inputs — the WeightCache analog (weights land on the
    mesh once, shape-committed so GSPMD propagates from them)."""
    out: Dict[int, jax.Array] = {}
    for nid, node in graph.nodes.items():
        if not isinstance(node, Constant) or not is_weight_constant(node, min_size):
            continue
        spec = sharding_for_name(node.name, rules) or P()
        # Pad rank: P specs shorter than rank are fine (trailing unsharded).
        arr = node.array
        if dtype is not None and arr.dtype == np.float32:
            arr = arr.astype(dtype)
        out[nid] = jax.device_put(arr, NamedSharding(mesh, spec))
    return out


def shard_inputs(
    graph: Graph,
    mesh: Mesh,
    feed: Dict[int, "np.ndarray"],
    rules: List[Tuple[str, P]] = GPT2_INPUT_RULES,
) -> Dict[int, jax.Array]:
    out = {}
    for nid, val in feed.items():
        name = graph.node_name(nid)
        spec = sharding_for_name(name, rules) or P()
        if (np.ndim(val) == 3 and name
                and re.search(r"^past_key_values\.", name)
                and len(spec) == 4):
            # Cat-layout cache [slots, cap, Hkv*D] (kernel_append graphs):
            # heads ride the LAST axis in contiguous D chunks, so the
            # 'model' axis moves from dim 1 to dim 2.
            spec = P(spec[0], None, spec[1])
        spec = P(*spec[: np.ndim(val)])
        out[nid] = jax.device_put(val, NamedSharding(mesh, spec))
    return out


# --- generic TP derivation --------------------------------------------------
#
# Round-1 sharding was a GPT-2 name table. derive_tp_plan instead reads the
# STRUCTURE: Megatron pairing says a const-weight matmul feeding another
# const-weight matmul through elementwise/attention ops (no normalization
# in between — norms need the full hidden vector, which forces the
# all-reduce boundary) forms a (column-parallel, row-parallel) pair. This
# covers attention qkv->o and MLP up/gate->down for any pre-norm
# transformer (GPT-2, Llama/Qwen2, BERT blocks, ...). The final lm_head
# (no downstream const matmul, feeds a graph output) is column-parallel
# over the vocab.

_MATMUL_OPS = {"MatMul", "MatMulAdd", "Gemm", "MatMulIntegerToFloat", "MatMulNBits"}
# Ops that BLOCK a Megatron pair (they consume the full hidden axis).
_TP_BLOCKERS = {
    "LayerNormalization", "RMSNormalization", "SimplifiedLayerNormalization",
    "SkipLayerNormalization", "SkipSimplifiedLayerNormalization",
    "InstanceNormalization", "BatchNormalization", "LpNormalization",
    "Gather", "ArgMax", "ArgMin",
}


def _weight_input(graph: Graph, op) -> Optional[int]:
    """Node id of the constant weight operand, if this matmul has one."""
    if not op.inputs or len(op.inputs) < 2 or op.inputs[1] is None:
        return None
    w = graph.nodes.get(op.inputs[1])
    if isinstance(w, Constant) and w.array.ndim == 2:
        return op.inputs[1]
    return None


def derive_tp_plan(graph: Graph) -> Dict[int, str]:
    """Classify const-weight matmul OPERATORS as 'col' / 'row' / 'lm_head'.

    Returns {operator_node_id: kind}. Pure graph analysis — no name
    patterns, so it works for any architecture the pairing rule fits.
    """
    producers: Dict[int, Tuple[int, object]] = {}
    for nid, op in graph.operators():
        for o in op.outputs:
            producers[o] = (nid, op)
    consumers: Dict[int, List[Tuple[int, object]]] = {}
    for nid, op in graph.operators():
        for i in op.inputs:
            if i is not None:
                consumers.setdefault(i, []).append((nid, op))

    matmuls = [
        (nid, op) for nid, op in graph.operators()
        if op.op_type in _MATMUL_OPS and _weight_input(graph, op) is not None
    ]
    matmul_ids = {nid for nid, _ in matmuls}

    # edges[m1] = set of const-matmuls reachable from m1's output through
    # pass-through ops (activation inputs only).
    edges: Dict[int, set] = {nid: set() for nid in matmul_ids}
    reaches_output: Dict[int, bool] = {nid: False for nid in matmul_ids}
    output_set = set(graph.output_ids)
    for m_id, m_op in matmuls:
        seen = set()
        stack = list(m_op.outputs)
        while stack:
            vid = stack.pop()
            if vid in seen:
                continue
            seen.add(vid)
            if vid in output_set:
                reaches_output[m_id] = True
            for c_id, c_op in consumers.get(vid, ()):
                if c_id in matmul_ids:
                    # Only count flows into the ACTIVATION operand.
                    if c_op.inputs and c_op.inputs[0] == vid:
                        edges[m_id].add(c_id)
                    continue
                if c_op.op_type in _TP_BLOCKERS or c_op.subgraphs():
                    # ArgMax feeds the on-device sampling head; treat its
                    # presence after a matmul as reaching the output.
                    if c_op.op_type in ("ArgMax", "ArgMin"):
                        reaches_output[m_id] = True
                    continue
                stack.extend(c_op.outputs)

    kinds: Dict[int, str] = {}
    for m_id in matmul_ids:
        for succ in edges[m_id]:
            kinds.setdefault(succ, "row")
    for m_id in matmul_ids:
        if edges[m_id] and kinds.get(m_id) != "row":
            kinds[m_id] = "col"
    # Conflicts (both ends of overlapping chains) stay whatever was set
    # first ('row' wins) — mismatched pairs simply drop to replicated below
    # when their partner is absent.
    for m_id in matmul_ids:
        if m_id not in kinds and reaches_output[m_id] and not edges[m_id]:
            kinds[m_id] = "lm_head"
    return kinds


def tp_weight_shardings(graph: Graph, mesh: Mesh, axis: str = "model") -> Dict[int, P]:
    """{constant_node_id: PartitionSpec} derived from derive_tp_plan,
    covering f32 weights, int8 weights + per-col scales + prepacked col
    sums, and biases. Weights whose sharded dim isn't divisible by the mesh
    axis stay replicated."""
    size = mesh.shape[axis]
    kinds = derive_tp_plan(graph)
    out: Dict[int, P] = {}

    def put(nid, spec, dim_ok):
        if nid is not None and dim_ok:
            out[nid] = spec

    for m_id, kind in kinds.items():
        op = graph.nodes[m_id]
        w_id = _weight_input(graph, op)
        w = graph.nodes[w_id].array
        K, N = w.shape
        if kind in ("col", "lm_head"):
            ok = N % size == 0
            put(w_id, P(None, axis), ok)
            if op.op_type == "MatMulIntegerToFloat":
                put(op.inputs[3] if len(op.inputs) > 3 else None, P(axis), ok)
                put(op.inputs[7] if len(op.inputs) > 7 else None, P(None, axis), ok)
                put(op.inputs[6] if len(op.inputs) > 6 else None, P(axis), ok)
            elif op.op_type in ("MatMulAdd", "Gemm") and len(op.inputs) > 2:
                put(op.inputs[2], P(axis), ok)
        elif kind == "row":
            ok = K % size == 0
            put(w_id, P(axis, None), ok)
            if op.op_type == "MatMulIntegerToFloat":
                put(op.inputs[3] if len(op.inputs) > 3 else None, P(None), ok)
                # Prepacked col sums are FULL-K sums; under K-sharding the
                # zero-point correction must apply once — leave the op to
                # the XLA path (no colsums) by replicating them.
                put(op.inputs[7] if len(op.inputs) > 7 else None, P(None, None), ok)
    return out


def fsdp_weight_shardings(
    graph: Graph, mesh: Mesh, axis: str = "data", min_size: int = 16
) -> Dict[int, P]:
    """ZeRO-3/FSDP parameter sharding: every weight-like constant sharded on
    its largest mesh-divisible dimension over `axis` (usually 'data').

    This is the GSPMD form of FSDP (scaling-book "training" recipe): params
    live sharded across the data axis; XLA inserts the all-gather at each
    use site and a reduce-scatter for the matching gradient, so per-device
    parameter + optimizer-state memory drops by the axis size. Optimizer
    state created with the same specs (see zero_init_state) is ZeRO-1/2.

    No reference analog — rten is single-host inference (SURVEY §2.6); this
    exists because the TPU engine also trains (tools/train_mnist.py,
    dryrun_multichip).
    """
    size = mesh.shape[axis]
    out: Dict[int, P] = {}
    for nid, node in graph.nodes.items():
        if not isinstance(node, Constant) or not is_weight_constant(node, min_size):
            continue
        shape = node.array.shape
        # Largest divisible dim; ties prefer the leading dim (row-major
        # contiguous shards -> cheap all-gather layout).
        best = None
        for d, n in enumerate(shape):
            if n % size == 0 and (best is None or n > shape[best]):
                best = d
        if best is None:
            continue
        spec = [None] * len(shape)
        spec[best] = axis
        out[nid] = P(*spec)
    return out


def zero_init_state(
    params: Dict[int, jax.Array], mesh: Mesh, plan: Dict[int, P]
) -> Dict[int, jax.Array]:
    """Zero-initialized per-param buffers (momentum/variance) placed with the
    SAME sharding as the parameter — the ZeRO trick: optimizer state never
    materializes unsharded anywhere."""
    out: Dict[int, jax.Array] = {}
    for nid, p in params.items():
        spec = plan.get(nid, P())
        out[nid] = jax.device_put(
            np.zeros(p.shape, np.float32), NamedSharding(mesh, spec)
        )
    return out


def shard_constants_by_plan(
    graph: Graph, mesh: Mesh, plan: Dict[int, P], dtype=None, min_size: int = 16
) -> Dict[int, jax.Array]:
    """device_put weight constants with per-node specs (replicated when the
    plan has no entry). The derive_tp_plan companion to shard_constants."""
    out: Dict[int, jax.Array] = {}
    for nid, node in graph.nodes.items():
        if not isinstance(node, Constant) or not is_weight_constant(node, min_size):
            continue
        spec = plan.get(nid, P())
        arr = node.array
        if dtype is not None and arr.dtype == np.float32:
            arr = arr.astype(dtype)
        out[nid] = jax.device_put(arr, NamedSharding(mesh, spec))
    return out
