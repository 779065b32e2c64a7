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
        spec = P(*spec[: np.ndim(val)])
        out[nid] = jax.device_put(val, NamedSharding(mesh, spec))
    return out

