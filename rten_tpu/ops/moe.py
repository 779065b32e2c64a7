"""Mixture-of-experts block (expert parallelism building block).

TPU-native design: the block is ONE op on stacked expert weights
[n_experts, ...] so that expert parallelism is purely a sharding
annotation — P('expert'|'model') on the leading axis makes each device
compute its experts' einsum slice and GSPMD inserts the psum at the
gate-weighted combine (the scaling-book EP recipe; the reference runtime
has no MoE or multi-device analog, SURVEY §2.6).

The compute uses the dense-mask formulation: every expert runs on every
token and the top-k gate mask zeroes the rest. For n_experts/top_k ratios
up to ~4 on MXU-bound shapes this wastes less than it saves in avoided
gather/scatter (dynamic dispatch defeats XLA's static tiling); a
capacity-based GShard dispatch-einsum is the optimization lever if ratios
grow. ONNX has no MoE op — this is a contrib op for rten_tpu-built graphs
(name-compatible with the builder in models/moe.py).

inputs:
  x        [B, T, E]
  router_w [E, X]              (X = n_experts)
  w_up     [X, E, F]           (gate+up merged when act='swiglu': F = 2*ff)
  w_down   [X, F', E]
  b_up     [X, F]   optional
  b_down   [X, E]   optional
attrs: top_k (default 2), activation ('gelu'|'silu'|'swiglu'),
       normalize_gates (default 1: softmax over the selected k)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .registry import OpError, get_input, opt_input, register


@register("MoE")
def _moe(ctx, inputs, attrs):
    x = get_input(inputs, 0)
    router_w = get_input(inputs, 1, "router_w")
    w_up = get_input(inputs, 2, "w_up")
    w_down = get_input(inputs, 3, "w_down")
    b_up = opt_input(inputs, 4)
    b_down = opt_input(inputs, 5)
    top_k = int(attrs.get("top_k", 2))
    act = attrs.get("activation", "gelu")
    normalize = bool(attrs.get("normalize_gates", 1))

    X = w_up.shape[0]
    if top_k > X:
        raise OpError(f"top_k {top_k} exceeds n_experts {X}")

    # Router: top-k gates, scattered back to a dense [B, T, X] mask via
    # one_hot (gather-free — a lane-wise select XLA fuses; dynamic scatter
    # would block MXU tiling).
    logits = jnp.einsum("bte,ex->btx", x.astype(jnp.float32),
                        router_w.astype(jnp.float32))
    top_vals, top_idx = jax.lax.top_k(logits, top_k)        # [B,T,k]
    if normalize:
        gate_vals = jax.nn.softmax(top_vals, axis=-1)
    else:
        gate_vals = jax.nn.sigmoid(top_vals)
    onehot = jax.nn.one_hot(top_idx, X, dtype=jnp.float32)  # [B,T,k,X]
    gates = jnp.einsum("btk,btkx->btx", gate_vals, onehot)

    # Dense expert compute on the stacked weights: sharding the leading
    # axis (P('expert')) turns each einsum into a local slice per device.
    h = jnp.einsum("bte,xef->xbtf", x.astype(jnp.float32),
                   w_up.astype(jnp.float32))
    if b_up is not None:
        h = h + b_up.astype(jnp.float32)[:, None, None, :]
    if act == "swiglu":
        ff = h.shape[-1] // 2
        h = jax.nn.silu(h[..., :ff]) * h[..., ff:]
    elif act == "silu":
        h = jax.nn.silu(h)
    elif act == "gelu":
        h = jax.nn.gelu(h, approximate=False)
    else:
        raise OpError(f"MoE: unknown activation '{act}'")
    y = jnp.einsum("xbtf,xfe->xbte", h, w_down.astype(jnp.float32))
    if b_down is not None:
        # Per-expert down biases must be gate-weighted like the expert
        # outputs (they ride inside the combine, not after it).
        y = y + b_down.astype(jnp.float32)[:, None, None, :]
    # Gate-weighted combine; contraction over x = the EP psum boundary.
    out = jnp.einsum("btx,xbte->bte", gates, y)
    return out.astype(x.dtype)
