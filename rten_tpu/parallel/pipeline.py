"""Pipeline parallelism (GPipe-style) over a 'pipe' mesh axis.

TPU-native design: stages are carved out of the SAME graph IR the rest of
the framework executes (no separate model definition), then run as one
SPMD program under ``shard_map`` — every device traces the identical stage
function; stage identity only selects which microbatch enters/exits, and
activations move stage-to-stage with ``lax.ppermute`` over ICI. This is
the scaling-book pipeline recipe, not a port: the reference runtime is a
single-host CPU interpreter with no pipeline concept (SURVEY §2.6).

How a graph becomes a pipeline:

1. ``find_cut_values`` computes the dataflow DOMINATORS of the requested
   output w.r.t. the main input — the values every path from ``input_ids``
   to ``logits`` passes through (a transformer's residual stream).
2. ``plan_pipeline`` hashes the op-signature of each inter-cut segment and
   detects the repeating layer period, yielding prologue (embeddings),
   N isomorphic trunk layers, and epilogue (final norm + lm head).
3. Trunk layers are grouped into ``n_stages`` equal superblocks. Stage 0's
   superblock is traced ONCE as the shared stage function; every stage's
   weights are stacked on a leading axis sharded ``P('pipe')`` so each
   device holds exactly its stage's parameters.
4. ``PipelineRunner.run`` executes prologue (replicated), the GPipe loop
   (M microbatches, M + S - 1 ticks, bubble fraction (S-1)/(M+S-1)), and
   the epilogue, returning the same outputs as ``Model.run``.

Differentiable end to end (ppermute/scan/psum all have transpose rules),
so the same runner backpropagates for pipeline-parallel training.
"""

from __future__ import annotations

import dataclasses
import functools
import hashlib
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
try:
    from jax import shard_map as _shard_map

    def shard_map(f=None, **kw):  # new API: check_rep renamed check_vma
        kw["check_vma"] = kw.pop("check_rep", kw.pop("check_vma", True))
        return _shard_map(f, **kw) if f is not None else _shard_map(**kw)
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ir.graph import Constant, Graph, NodeId, Operator, is_weight_constant


def find_cut_values(graph: Graph, main_id: NodeId, out_id: NodeId) -> List[NodeId]:
    """Topologically-ordered dataflow dominators of ``out_id``: values that
    every path from ``main_id`` passes through. Side inputs (masks, caches)
    are ignored — they re-enter each stage as auxiliary feeds."""
    producer: Dict[NodeId, Operator] = {}
    order: List[NodeId] = []  # value ids in plan (topological) order
    plan = graph.plan(list(graph.input_ids), [out_id], allow_missing_inputs=True)
    for op_id in plan:
        op = graph.nodes[op_id]
        for o in op.outputs:
            producer[o] = op
            order.append(o)

    # dom[v] = set of value ids on EVERY main->v path (v included); only
    # defined for values that depend on main at all.
    dom: Dict[NodeId, set] = {main_id: {main_id}}
    for vid in order:
        op = producer[vid]
        dep_doms = [dom[i] for i in op.inputs if i is not None and i in dom]
        if not dep_doms:
            continue
        inter = set(dep_doms[0])
        for d in dep_doms[1:]:
            inter &= d
        inter.add(vid)
        dom[vid] = inter
    if out_id not in dom:
        raise ValueError("output does not depend on the main input")
    pos = {vid: i for i, vid in enumerate(order)}
    cuts = sorted(dom[out_id] - {main_id}, key=lambda v: pos.get(v, -1))
    return [main_id] + cuts


def _segment_ops(graph: Graph, cut_in: NodeId, cut_out: NodeId) -> List[NodeId]:
    """Operator ids computing ``cut_out`` from ``cut_in`` + runtime inputs
    (side values like mask preprocessing are recomputed inside the segment
    — a few VPU ops per stage, irrelevant next to the matmuls)."""
    avail = [cut_in] + [i for i in graph.input_ids if i != cut_in]
    return graph.plan(avail, [cut_out])


def _attr_token(v) -> str:
    if isinstance(v, np.ndarray):
        return f"nd{v.shape}{v.dtype}:{hashlib.md5(v.tobytes()).hexdigest()[:8]}"
    return repr(v)


def _segment_signature(graph: Graph, ops: Sequence[NodeId]) -> str:
    """Structural hash of a segment: op types + attrs + weight shapes (NOT
    weight values or node ids — isomorphic layers must collide)."""
    parts = []
    for op_id in ops:
        op = graph.nodes[op_id]
        ws = []
        for i in op.inputs:
            n = graph.nodes.get(i) if i is not None else None
            if isinstance(n, Constant):
                ws.append(f"{n.array.shape}{n.array.dtype}")
        attrs = ",".join(
            f"{k}={_attr_token(v)}" for k, v in sorted(op.attrs.items())
        )
        parts.append(f"{op.op_type}({attrs})[{';'.join(ws)}]")
    return hashlib.md5("|".join(parts).encode()).hexdigest()


def _find_period(sigs: List[str]) -> Tuple[int, int, int]:
    """(start, period, reps) of the longest repeated signature block —
    the transformer trunk. Brute force: len(sigs) is O(layers * cuts/layer)."""
    n = len(sigs)
    best = (0, 1, 1)
    for p in range(1, n // 2 + 1):
        for s in range(0, n - 2 * p + 1):
            reps = 1
            while (
                s + (reps + 1) * p <= n
                and sigs[s + reps * p : s + (reps + 1) * p] == sigs[s : s + p]
            ):
                reps += 1
            if reps >= 2 and reps * p > best[1] * best[2]:
                best = (s, p, reps)
    return best


@dataclasses.dataclass
class PipelinePlan:
    boundaries: List[NodeId]          # n_stages+1 cut values (stage i: [i]->[i+1])
    weight_ids: List[List[NodeId]]    # per stage, first-use order
    staged_side: List[List[NodeId]]   # per-stage exclusive runtime inputs
    shared_side: List[NodeId]         # runtime inputs every stage consumes
    n_stages: int
    layers: int                       # trunk layers detected
    main_id: NodeId
    out_id: NodeId


def plan_pipeline(
    graph: Graph,
    n_stages: int,
    main_input: str = "input_ids",
    output: str = "logits",
) -> PipelinePlan:
    """Detect the repeating trunk and split it into ``n_stages`` isomorphic
    superblocks. Raises when the trunk layer count doesn't divide evenly
    (GPipe stacking needs identical stages)."""
    main_id = graph.find_node(main_input)
    out_id = graph.find_node(output)
    if main_id is None or out_id is None:
        raise ValueError(f"graph lacks '{main_input}' or '{output}'")
    cuts = find_cut_values(graph, main_id, out_id)
    if len(cuts) < 3:
        raise ValueError("no interior cut points — graph is not pipelineable")
    seg_ops = [
        _segment_ops(graph, cuts[i], cuts[i + 1]) for i in range(len(cuts) - 1)
    ]
    sigs = [_segment_signature(graph, ops) for ops in seg_ops]
    start, period, reps = _find_period(sigs)
    if reps < 2:
        raise ValueError("no repeating trunk detected")
    if reps % n_stages != 0:
        raise ValueError(
            f"{reps} trunk layers do not split into {n_stages} equal stages"
        )
    lps = reps // n_stages  # layers per stage
    boundaries = [
        cuts[start + s * lps * period] for s in range(n_stages + 1)
    ]

    input_set = set(graph.input_ids)
    weight_ids: List[List[NodeId]] = []
    side_ids: List[List[NodeId]] = []
    lit_sigs: List[List[bytes]] = []
    for s in range(n_stages):
        ops: List[NodeId] = []
        for li in range(lps * period):
            ops.extend(seg_ops[start + s * lps * period + li])
        ws, sides, lits = [], [], []
        seen_w, seen_s = set(), set()
        for op_id in ops:
            op = graph.nodes[op_id]
            for i in op.inputs:
                if i is None or i == boundaries[s]:
                    continue
                n = graph.nodes.get(i)
                if isinstance(n, Constant) and is_weight_constant(n):
                    if i not in seen_w:
                        seen_w.add(i)
                        ws.append(i)
                elif isinstance(n, Constant):
                    # Small constants embed as trace-time literals from
                    # STAGE 0's trace — they must be value-identical across
                    # stages (shape vectors, eps scalars are; a per-layer
                    # small constant would silently reuse layer 0's).
                    lits.append(n.array.tobytes())
                elif i in input_set and i != main_id and i not in seen_s:
                    seen_s.add(i)
                    sides.append(i)
        weight_ids.append(ws)
        side_ids.append(sides)
        lit_sigs.append(lits)
    if any(l != lit_sigs[0] for l in lit_sigs[1:]):
        raise ValueError(
            "stages embed differing small constants — cannot share one "
            "stage trace (promote them to weight constants)"
        )

    # Positional classification: same id in every stage -> shared feed;
    # all-distinct -> per-stage (stacked, e.g. per-layer KV inputs).
    n_side = {len(s) for s in side_ids}
    if len(n_side) != 1:
        raise ValueError("stages consume differing side-input counts")
    shared, staged = [], [[] for _ in range(n_stages)]
    for j in range(n_side.pop()):
        col = [side_ids[s][j] for s in range(n_stages)]
        if all(c == col[0] for c in col):
            shared.append(col[0])
        elif len(set(col)) == n_stages:
            for s in range(n_stages):
                staged[s].append(col[s])
        else:
            raise ValueError(
                "side input shared by SOME stages only — unsupported split"
            )
    # Homogeneity: stacked weights must agree positionally.
    for j in range(len(weight_ids[0])):
        shapes = {
            (graph.nodes[weight_ids[s][j]].array.shape,
             graph.nodes[weight_ids[s][j]].array.dtype.name)
            for s in range(n_stages)
        }
        if len(shapes) != 1:
            raise ValueError(f"stage weights diverge at position {j}: {shapes}")
    return PipelinePlan(
        boundaries=boundaries,
        weight_ids=weight_ids,
        staged_side=staged,
        shared_side=shared,
        n_stages=n_stages,
        layers=reps,
        main_id=main_id,
        out_id=out_id,
    )


def pipeline_loop(
    mesh: Mesh,
    axis: str,
    stage_fn,
    n_stages: int,
    n_micro: int,
    shared_split: Tuple[bool, ...],     # which shared feeds are [M, mb, ...]
    staged_split: Tuple[bool, ...],     # which staged feeds are [S, M, mb, ...]
    weights: Sequence[jax.Array],       # each [S, ...] sharded P(axis)
    x_mb: jax.Array,                    # [M, mb, ...] replicated
    shared_mb: Sequence[jax.Array],     # [M, mb, ...] replicated, or static
    staged: Sequence[jax.Array],        # each [S, ...] sharded P(axis)
):
    """The GPipe schedule: M + S - 1 ticks; stage s processes microbatch
    t - s at tick t; activations hop one stage per tick via ppermute."""
    M, S = n_micro, n_stages

    w_specs = tuple(P(axis) for _ in weights)
    st_specs = tuple(P(axis) for _ in staged)
    sh_specs = tuple(P() for _ in shared_mb)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(w_specs, P(), sh_specs, st_specs),
        out_specs=P(),
        check_rep=False,
    )
    def run(w_local, x, shared, staged_local):
        s_idx = jax.lax.axis_index(axis)
        state0 = jnp.zeros(x.shape[1:], x.dtype)
        outs0 = jnp.zeros_like(x)

        def tick(carry, t):
            state, outs = carry
            # Microbatch this stage works on at tick t (clamped: out-of-
            # range ticks compute garbage that never lands anywhere).
            m = jnp.clip(t - s_idx, 0, M - 1)
            x_m = jax.lax.dynamic_index_in_dim(x, jnp.clip(t, 0, M - 1), 0,
                                               keepdims=False)
            inp = jnp.where(s_idx == 0, x_m, state)
            shared_m = [
                jax.lax.dynamic_index_in_dim(sv, m, 0, keepdims=False)
                if split else sv
                for sv, split in zip(shared, shared_split)
            ]
            staged_m = [
                jax.lax.dynamic_index_in_dim(sv[0], m, 0, keepdims=False)
                if split else sv[0]
                for sv, split in zip(staged_local, staged_split)
            ]
            out = stage_fn(inp, [w[0] for w in w_local], shared_m, staged_m)
            m_out = t - (S - 1)
            write = (s_idx == S - 1) & (m_out >= 0)
            mo = jnp.clip(m_out, 0, M - 1)
            prev = jax.lax.dynamic_index_in_dim(outs, mo, 0, keepdims=False)
            outs = jax.lax.dynamic_update_index_in_dim(
                outs, jnp.where(write, out, prev), mo, 0
            )
            state = jax.lax.ppermute(
                out, axis, [(i, i + 1) for i in range(S - 1)]
            )
            return (state, outs), None

        (_, outs), _ = jax.lax.scan(
            tick, (state0, outs0), jnp.arange(M + S - 1)
        )
        # Only the last stage holds real outputs; replicate via psum.
        return jax.lax.psum(
            jnp.where(s_idx == S - 1, outs, jnp.zeros_like(outs)), axis
        )

    return run(tuple(weights), x_mb, tuple(shared_mb), tuple(staged))


class PipelineRunner:
    """Run a Model pipeline-parallel over ``mesh``'s ``axis``.

    ``n_micro`` microbatches must divide the batch; the trunk layer count
    must divide the axis size. Outputs match ``Model.run`` numerically
    (same ops, same order — only the partitioning differs).
    """

    def __init__(
        self,
        model,
        mesh: Mesh,
        axis: str = "pipe",
        n_micro: int = 2,
        main_input: str = "input_ids",
        output: str = "logits",
    ):
        self.model = model
        self.g = model.graph
        self.executor = model.executor
        self.mesh = mesh
        self.axis = axis
        self.n_micro = n_micro
        S = mesh.shape[axis]
        self.plan = plan_pipeline(self.g, S, main_input, output)
        p = self.plan

        # Stack stage weights [S, ...] and commit them pipe-sharded.
        self.stacked_w = []
        for j in range(len(p.weight_ids[0])):
            arr = np.stack(
                [self.g.nodes[p.weight_ids[s][j]].array for s in range(S)]
            )
            self.stacked_w.append(
                jax.device_put(arr, NamedSharding(mesh, P(axis)))
            )

        executor = self.executor
        stage0_w = p.weight_ids[0]
        stage0_side = p.staged_side[0]
        shared_ids = p.shared_side
        cut_in0, cut_out0 = p.boundaries[0], p.boundaries[1]

        def stage_fn(x, w_vals, shared_vals, staged_vals):
            env = {cut_in0: x}
            env.update(zip(stage0_w, w_vals))
            env.update(zip(shared_ids, shared_vals))
            env.update(zip(stage0_side, staged_vals))
            return executor.trace(env, [cut_out0])[0]

        self.stage_fn = stage_fn
        self._jit_loop = None
        self._loop_key = None

    def run(self, feed: Dict[str, Any]):
        """``feed``: {input name: array} covering every graph input. Returns
        the pipeline output (same value Model.run would produce)."""
        g, p, M, S = self.g, self.plan, self.n_micro, self.plan.n_stages
        env = {g.find_node(k): np.asarray(v) for k, v in feed.items()}
        B = env[p.main_id].shape[0]
        if B % M:
            raise ValueError(f"batch {B} not divisible by {M} microbatches")
        mb = B // M

        # Prologue (embeddings): replicated, one jitted call.
        x = self.executor.run(dict(env), [p.boundaries[0]])[0]
        x_mb = jnp.reshape(x, (M, mb) + x.shape[1:])

        shared_vals, shared_split = [], []
        for i in p.shared_side:
            v = jnp.asarray(env[i])
            split = bool(v.ndim and v.shape[0] == B)
            shared_vals.append(
                jnp.reshape(v, (M, mb) + v.shape[1:]) if split else v
            )
            shared_split.append(split)
        staged_vals, staged_split = [], []
        for j in range(len(p.staged_side[0])):
            col = np.stack(
                [np.asarray(env[p.staged_side[s][j]]) for s in range(S)]
            )
            split = col.ndim > 1 and col.shape[1] == B
            if split:
                col = col.reshape((S, M, mb) + col.shape[2:])
            staged_vals.append(
                jax.device_put(col, NamedSharding(self.mesh, P(self.axis)))
            )
            staged_split.append(split)

        key = (tuple(shared_split), tuple(staged_split))
        if self._jit_loop is None or self._loop_key != key:
            loop = functools.partial(
                pipeline_loop, self.mesh, self.axis, self.stage_fn, S, M,
                key[0], key[1],
            )
            self._jit_loop = jax.jit(loop)
            self._loop_key = key
        y_mb = self._jit_loop(self.stacked_w, x_mb, shared_vals, staged_vals)
        y = jnp.reshape(y_mb, (B,) + y_mb.shape[2:])

        # Epilogue: final norm + head from the trunk-end value.
        env[p.boundaries[-1]] = y
        return self.executor.run(env, [p.out_id])[0]
