"""Graph executor: trace the IR into a single XLA computation.

Architectural divergence from the reference (by design): rten walks the
graph node-by-node at inference time with an interpreter + buffer pool
(`src/graph.rs:771-1286`). On TPU that would leave XLA nothing to fuse and
pay dispatch per op. Instead we *trace* the whole plan once into a jitted
function — XLA then does scheduling, fusion and memory planning (the
BufferPool/in-place machinery of the reference maps to XLA buffer
assignment + donation). Shape specialization is handled by `jax.jit`'s
shape-keyed cache, the analog of the reference's `CachedPlan`
(src/graph/planner.rs:39-83).

`partial_run` evaluates the constant-reachable subset eagerly on CPU — used
by the optimizer's constant-propagation pass (rten `src/optimize.rs:705`)
and by the generator's prefix caching.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ir.graph import Constant, Graph, NodeId, Operator
from ..ops.registry import OpError, get_op

# Ops that must not be folded at trace time even on concrete inputs.
_NON_FOLDABLE = {
    "RandomNormal", "RandomNormalLike", "RandomUniform", "RandomUniformLike",
    "Multinomial", "Dropout",
}


def _contains_tracer(x) -> bool:
    if isinstance(x, jax.core.Tracer):
        return True
    if isinstance(x, (list, tuple)):
        return any(_contains_tracer(i) for i in x)
    return False


@dataclasses.dataclass
class RunConfig:
    """Engine knobs (analog of rten RunOptions + feature flags)."""

    use_pallas_int8: bool = True
    use_pallas_int4: bool = True
    use_flash_attention: bool = True
    # Route int8 matmuls with fewer than this many rows to the XLA integer
    # dot instead of the Pallas kernel. Round 2 needed 64 here (the default
    # blocks gave 27+ tiny grid steps, ~90us/call at M=16); round 3's
    # skinny-M blocks (kernels/int8_matmul.py _skinny_blocks: full-K,
    # ~4MB-weight blocks, 1-4 grid steps) made the kernel match-or-beat the
    # XLA dot at decode shapes (per-matmul scan A/B 363 vs 396us across the
    # GPT-2 set; serving headline 5,200 vs 5,205 tok/s), so the concession
    # is retired. 0 = always use the Pallas kernel.
    pallas_int8_min_m: int = 0
    # Flip low-precision matmuls to bf16 (accuracy/perf tradeoff; f32 default
    # matches the reference's numerics).
    prefer_bf16: bool = False
    seed: int = 0


class TraceContext:
    """Per-trace context handed to op lowerings.

    Carries the kernel-selection config, a PRNG-key supply for random ops,
    the number of outputs the current node declares, and capture scopes for
    control-flow subgraphs (rten CaptureEnv, src/graph.rs:1165-1181).
    """

    def __init__(self, executor: "Executor", config: RunConfig, rng_key=None):
        self.executor = executor
        self.config = config
        self._rng_key = rng_key
        self._rng_counter = 0
        self.n_outputs = 1
        self.scopes: List[Dict[str, Any]] = []

    def next_rng(self):
        if self._rng_key is None:
            self._rng_key = jax.random.PRNGKey(self.config.seed)
        self._rng_counter += 1
        return jax.random.fold_in(self._rng_key, self._rng_counter)

    def lookup_capture(self, name: str):
        for scope in reversed(self.scopes):
            if name in scope:
                return scope[name]
        return None

    def run_subgraph(self, subgraph: Graph, inputs: Sequence[Any]):
        """Trace a control-flow subgraph with capture support."""
        sub_exec = Executor(subgraph, self.config)
        env: Dict[NodeId, Any] = {}
        for nid, val in zip(subgraph.input_ids, inputs):
            env[nid] = val
        # Resolve captures by name from enclosing scopes.
        for name in subgraph.captures:
            v = self.lookup_capture(name)
            if v is None:
                raise OpError(f"unresolved capture '{name}' in subgraph")
            nid = subgraph.find_node(name)
            if nid is not None:
                env[nid] = v
        return sub_exec.trace(env, subgraph.output_ids, ctx=self)


class Executor:
    def __init__(self, graph: Graph, config: Optional[RunConfig] = None):
        self.graph = graph
        self.config = config or RunConfig()
        self._jit_cache: Dict[Tuple, Callable] = {}
        self._weights: Optional[Dict[NodeId, Any]] = None
        self._run_counter = 0

    def _needs_fresh_rng(self) -> bool:
        """True if the graph contains unseeded random ops: their PRNG key
        must be a jit ARGUMENT (fresh per run), not a traced constant —
        otherwise the compiled executable replays one frozen sample forever
        (rten re-draws randomness every Graph::run)."""
        for _, op in self.graph.operators():
            if op.op_type in _NON_FOLDABLE and op.op_type != "Dropout" \
                    and op.attrs.get("seed") is None:
                return True
        return False

    def _weight_args(self) -> Dict[NodeId, Any]:
        """Weight constants as device-resident arrays, transferred once.

        The WeightCache analog (rten src/weight_cache.rs): weights become
        jit *arguments* instead of embedded literals — XLA must not fold
        megabytes of constants into the executable, and device placement/
        sharding of weights must survive across calls.
        """
        if self._weights is None:
            from ..ir.graph import is_weight_constant

            self._weights = {}
            for nid, node in self.graph.nodes.items():
                if isinstance(node, Constant) and is_weight_constant(node):
                    self._weights[nid] = jax.device_put(node.array)
        return self._weights

    # -- tracing ---------------------------------------------------------

    def trace(
        self,
        env: Dict[NodeId, Any],
        output_ids: Sequence[NodeId],
        ctx: Optional[TraceContext] = None,
        allow_missing: bool = False,
        profiler=None,
    ) -> List[Any]:
        """Walk the plan, calling each op's lowering; returns output values.

        With ``profiler`` (eager runs only) each op is dispatched + synced
        and its wall time recorded (rten RunOptions.timing analog).
        """
        g = self.graph
        if ctx is None:
            ctx = TraceContext(self, self.config)
        # Publish named values for capture resolution by nested subgraphs.
        scope: Dict[str, Any] = {}
        ctx.scopes.append(scope)
        try:
            for nid, node in g.nodes.items():
                if isinstance(node, Constant):
                    env.setdefault(nid, node.array)
            for nid in list(env):
                name = getattr(g.nodes.get(nid), "name", None)
                if name:
                    scope[name] = env[nid]

            plan = g.plan(list(env.keys()), list(output_ids), allow_missing_inputs=True)
            for op_id in plan:
                op = g.nodes[op_id]
                assert isinstance(op, Operator)
                ins = [env.get(i) if i is not None else None for i in op.inputs]
                op_def = get_op(op.op_type)
                ctx.n_outputs = len(op.outputs)
                attrs = dict(op.attrs)
                attrs["__n_outputs__"] = len(op.outputs)
                # Shape-computation chains (Shape -> Gather -> Slice ...)
                # must stay concrete at trace time: evaluate ops whose
                # inputs are all non-tracers eagerly (the generic analog of
                # rten's ComputeShapeFusion/ShapeSliceToConstant,
                # src/optimize/fusions.rs). Weight args arrive as tracers,
                # so only genuinely static values take this path.
                eval_eagerly = (
                    op.op_type not in _NON_FOLDABLE
                    and not op.subgraphs()
                    and not any(_contains_tracer(i) for i in ins)
                )
                try:
                    if eval_eagerly and profiler is None:
                        with jax.ensure_compile_time_eval():
                            result = op_def.lower(ctx, ins, attrs)
                    elif profiler is not None:
                        import time as _time

                        t0 = _time.perf_counter()
                        result = op_def.lower(ctx, ins, attrs)
                        jax.block_until_ready(
                            [r for r in (result if isinstance(result, tuple) else (result,))
                             if r is not None and not isinstance(r, (list, int, float))]
                        )
                        profiler.add(
                            op.op_type,
                            g.node_name(op_id),
                            [getattr(i, "shape", ()) for i in ins if i is not None],
                            _time.perf_counter() - t0,
                        )
                    else:
                        result = op_def.lower(ctx, ins, attrs)
                except OpError as e:
                    raise OpError(f"{op.op_type} '{g.node_name(op_id)}': {e}") from e
                if not isinstance(result, tuple):
                    result = (result,)
                if len(result) < len(op.outputs):
                    raise OpError(
                        f"{op.op_type} returned {len(result)} outputs, "
                        f"node declares {len(op.outputs)}"
                    )
                for out_id, val in zip(op.outputs, result):
                    env[out_id] = val
                    name = g.node_name(out_id)
                    if name:
                        scope[name] = val
            outs = []
            for oid in output_ids:
                if oid not in env:
                    if allow_missing:
                        outs.append(None)
                        continue
                    raise OpError(f"output {g.node_name(oid)} was not computed")
                outs.append(env[oid])
            return outs
        finally:
            ctx.scopes.pop()

    # -- compiled execution ------------------------------------------------

    def _fn_for(
        self,
        input_ids: Tuple[NodeId, ...],
        output_ids: Tuple[NodeId, ...],
        donate_argnums: Tuple[int, ...] = (),
        static_env: Optional[Dict[NodeId, Any]] = None,
    ):
        static_key = ()
        if static_env:
            static_key = tuple(
                (nid, np.asarray(v).tobytes(), str(np.asarray(v).dtype),
                 np.asarray(v).shape)
                for nid, v in sorted(static_env.items())
            )
        key = (input_ids, output_ids, donate_argnums, static_key)
        fn = self._jit_cache.get(key)
        if fn is None:
            static_env = dict(static_env) if static_env else {}
            if self._needs_fresh_rng():

                def run(rng_key, *args):
                    env = dict(zip(input_ids, args))
                    env.update(static_env)
                    ctx = TraceContext(self, self.config, rng_key=rng_key)
                    return tuple(self.trace(env, output_ids, ctx=ctx))

                # rng key is arg 0; shift donation indices by one.
                fn_inner = jax.jit(
                    run, donate_argnums=tuple(d + 1 for d in donate_argnums)
                )

                def fn(*args):
                    self._run_counter += 1
                    k = jax.random.fold_in(
                        jax.random.PRNGKey(self.config.seed), self._run_counter
                    )
                    return fn_inner(k, *args)

            else:

                def run(*args):
                    env = dict(zip(input_ids, args))
                    env.update(static_env)
                    return tuple(self.trace(env, output_ids))

                fn = jax.jit(run, donate_argnums=donate_argnums)
            self._jit_cache[key] = fn
        return fn

    def run(
        self,
        inputs: Dict[NodeId, Any],
        output_ids: Sequence[NodeId],
        jit: bool = True,
        donate: Sequence[NodeId] = (),
        static: Optional[Dict[NodeId, Any]] = None,
    ) -> List[Any]:
        """``donate``: node ids whose input buffers XLA may reuse for
        outputs (rten's in-place execution analog, src/graph.rs:967-1049 —
        here it makes KV-cache updates in-place on device).

        ``static``: inputs whose concrete VALUES specialize the trace (the
        jit static_argnums analog). Needed for flags like Optimum's
        use_cache_branch: an ONNX If whose branches return different shapes
        cannot lower to lax.cond, so the predicate must be known at trace
        time and the executable cache keys on its value."""
        if jit:
            # Caller-provided values (e.g. sharded weights) override the
            # executor's own weight cache.
            inputs = {**self._weight_args(), **inputs}
        in_ids = tuple(sorted(inputs.keys()))
        args = [jnp.asarray(inputs[i]) for i in in_ids]
        if not jit:
            env = dict(zip(in_ids, args))
            if static:
                env.update({k: np.asarray(v) for k, v in static.items()})
            return self.trace(env, list(output_ids))
        donate_argnums = tuple(
            i for i, nid in enumerate(in_ids) if nid in set(donate)
        )
        static_env = (
            {k: np.asarray(v) for k, v in static.items()} if static else None
        )
        fn = self._fn_for(in_ids, tuple(output_ids), donate_argnums, static_env)
        return list(fn(*args))

    def profile_run(
        self, inputs: Dict[NodeId, Any], output_ids: Sequence[NodeId]
    ):
        """Eager per-op profiled run -> (outputs, Profiler)."""
        from .profiler import Profiler

        prof = Profiler()
        env = {k: jnp.asarray(v) for k, v in inputs.items()}
        outs = self.trace(env, list(output_ids), profiler=prof)
        return outs, prof

    def partial_run(
        self, inputs: Dict[NodeId, Any], output_ids: Sequence[NodeId]
    ) -> List[Tuple[NodeId, Any]]:
        """Eagerly evaluate whatever subset of `output_ids` is reachable.

        Used for constant propagation at load time; runs on CPU to avoid
        per-node TPU compiles (rten partial_run, src/graph.rs:1335-1384).
        """
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            env = dict(inputs)
            outs = self.trace(env, list(output_ids), allow_missing=True)
        return [
            (oid, np.asarray(v) if v is not None else None)
            for oid, v in zip(output_ids, outs)
        ]
