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

    def _act(h):
        if act == "swiglu":
            ff = h.shape[-1] // 2
            return jax.nn.silu(h[..., :ff]) * h[..., ff:]
        if act == "silu":
            return jax.nn.silu(h)
        if act == "gelu":
            return jax.nn.gelu(h, approximate=False)
        raise OpError(f"MoE: unknown activation '{act}'")

    if attrs.get("dispatch", "dense") == "capacity":
        # GShard capacity-based dispatch: each expert processes at most C
        # token slots, so expert FLOPs scale with top_k/X instead of 1 —
        # the win once X/top_k outgrows ~4 (the dense-mask crossover).
        # One-hot dispatch/combine einsums keep everything static-shaped
        # and MXU-tileable (no gather/scatter); tokens past an expert's
        # capacity are DROPPED (contribute zero), standard GShard
        # semantics — size capacity_factor for the expected imbalance.
        B, T, E = x.shape
        N, k = B * T, top_k
        cf = float(attrs.get("capacity_factor", 1.25))
        C = max(8, int(-(-N * k * cf // X)) + 7 & ~7)  # ceil, round to 8
        xf = x.reshape(N, E).astype(jnp.float32)
        idx = top_idx.reshape(N, k)
        gts = gate_vals.reshape(N, k)
        oh_e = jax.nn.one_hot(idx, X, dtype=jnp.float32)       # [N,k,X]
        # Position of each (token, k) assignment within its expert's
        # capacity, ordered token-major (earlier tokens keep their slot).
        flat = oh_e.reshape(N * k, X)
        pos = jnp.cumsum(flat, axis=0) * flat - 1.0            # [N*k,X]
        keep = (pos >= 0) & (pos < C)
        oh_c = jax.nn.one_hot(
            jnp.clip(pos, 0, C - 1).astype(jnp.int32), C, dtype=jnp.float32
        ) * keep[..., None].astype(jnp.float32)                # [N*k,X,C]
        oh_c = oh_c.reshape(N, k, X, C)
        disp = oh_c.sum(axis=1)                                # [N,X,C]
        comb = (gts[:, :, None, None] * oh_c).sum(axis=1)      # [N,X,C]
        xd = jnp.einsum("nxc,nd->xcd", disp, xf)               # [X,C,E]
        h = jnp.einsum("xcd,xdf->xcf", xd, w_up.astype(jnp.float32))
        if b_up is not None:
            h = h + b_up.astype(jnp.float32)[:, None, :]
        h = _act(h)
        y = jnp.einsum("xcf,xfe->xce", h, w_down.astype(jnp.float32))
        if b_down is not None:
            y = y + b_down.astype(jnp.float32)[:, None, :]
        out = jnp.einsum("nxc,xce->ne", comb, y)               # EP psum here
        return out.reshape(B, T, E).astype(x.dtype)

    # Dense expert compute on the stacked weights: sharding the leading
    # axis (P('expert')) turns each einsum into a local slice per device.
    h = jnp.einsum("bte,xef->xbtf", x.astype(jnp.float32),
                   w_up.astype(jnp.float32))
    if b_up is not None:
        h = h + b_up.astype(jnp.float32)[:, None, None, :]
    h = _act(h)
    y = jnp.einsum("xbtf,xfe->xbte", h, w_down.astype(jnp.float32))
    if b_down is not None:
        # Per-expert down biases must be gate-weighted like the expert
        # outputs (they ride inside the combine, not after it).
        y = y + b_down.astype(jnp.float32)[:, None, None, :]
    # Gate-weighted combine; contraction over x = the EP psum boundary.
    out = jnp.einsum("btx,xbte->bte", gates, y)
    return out.astype(x.dtype)
