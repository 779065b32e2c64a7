"""Attention ops: ONNX `Attention`, MS contrib `MultiHeadAttention` /
`GroupQueryAttention`, `RotaryEmbedding` (+MS variant).

Reference coverage: rten `src/ops/attention.rs` (:645 Attention, :564
softcap, :873-881 causal anchored at KV end) and
`src/ops/attention/contrib.rs` (:48 MHA, :424 GQA), `src/ops/embedding.rs`
(:210 RotaryEmbedding). Unlike the reference (which materializes the score
matrix), lowering routes to the Pallas flash-attention kernel on TPU
(kernels/flash_attention.py) and a fused XLA formulation elsewhere.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .registry import OpError, get_input, opt_input, register


def _use_flash(ctx) -> bool:
    return ctx is None or ctx.config.use_flash_attention


def _attend(ctx, q, k, v, mask=None, *, scale=None, causal=False, softcap=0.0):
    from ..kernels.flash_attention import mha

    return mha(
        q, k, v, mask, scale=scale, causal=causal, softcap=softcap,
        prefer_flash=_use_flash(ctx),
    )


def _slot_kv_update(buf, new, starts):
    """Write per-slot KV rows into a preallocated [B, H, cap, D] buffer at
    per-slot time offsets ``starts`` [B].

    NOT a vmapped dynamic_update_slice: batched start indices batch to a
    scatter, which XLA-TPU lowers as a full-buffer select — rewriting the
    entire multi-MB cache every decode step (measured ~54us/buffer/step,
    half the decode step's device time). An unrolled chain of scalar-index
    dynamic_update_slices aliases in place and writes only the new rows.
    (Unrolled, not fori_loop: a while-loop carrying both the cache and the
    new rows trips an XLA-TPU RET_CHECK in while-loop simplification.)
    """
    B, H, S, D = new.shape
    starts = jnp.asarray(starts, jnp.int32)
    for i in range(B):
        buf = jax.lax.dynamic_update_slice(
            buf, new[i : i + 1], (i, 0, starts[i], 0)
        )
    return buf


def _slot_kv_update_cat(buf, new, starts):
    """Cat-layout variant: rows ``new`` [B, S, Hkv*D] into a
    [B, cap, Hkv*D] cache at per-slot offsets (same unrolled scalar-index
    dus chain as _slot_kv_update, one fewer dim)."""
    B = new.shape[0]
    starts = jnp.asarray(starts, jnp.int32)
    for i in range(B):
        buf = jax.lax.dynamic_update_slice(
            buf, new[i : i + 1], (i, starts[i], 0)
        )
    return buf


def _paged_kv_update(pool, new, starts, bt):
    """Write per-slot KV rows into a paged block POOL [NB, H, BS, D].

    ``new`` [B, H, S, D] rows for slot b land at logical positions
    starts[b]..starts[b]+S-1, i.e. pool[bt[b, p // BS], :, p % BS, :].

    S == 1 (decode hot path): an unrolled dynamic_update_slice chain, same
    rationale as _slot_kv_update (a batched scatter lowers to a full-pool
    select on TPU). S > 1 (prefill, per-admission): one scatter — its
    full-pool write matches the non-paged admission's zeros+merge cost.
    Positions past the table (padded prompt tails) clamp to the last table
    entry; unallocated entries are 0, the engine's reserved garbage block.
    """
    B, H, S, D = new.shape
    BS = pool.shape[2]
    MB = bt.shape[1]
    starts = jnp.asarray(starts, jnp.int32)
    bt = jnp.asarray(bt, jnp.int32)
    new = new.astype(pool.dtype)
    if S == 1:
        for i in range(B):
            jb = starts[i] // BS
            blk = jnp.where(
                jb < MB,
                jax.lax.dynamic_index_in_dim(
                    bt[i], jnp.minimum(jb, MB - 1), keepdims=False
                ),
                0,
            )
            pool = jax.lax.dynamic_update_slice(
                pool, new[i : i + 1], (blk, 0, starts[i] % BS, 0)
            )
        return pool
    pos = starts[:, None] + jnp.arange(S, dtype=jnp.int32)[None]  # [B, S]
    # Positions past the table (bucket-padded prompt tails) go to the
    # garbage sink, NOT a clamped live entry: for a full-budget slot the
    # last table entry holds real KV that a clamp would overwrite.
    jb = pos // BS
    blk = jnp.where(
        jb < MB, jnp.take_along_axis(bt, jnp.minimum(jb, MB - 1), axis=1), 0
    )
    off = pos % BS
    rows = new.transpose(0, 2, 1, 3).reshape(B * S, H, D)
    return pool.at[blk.reshape(-1), :, off.reshape(-1), :].set(rows)


def _paged_kv_update_cat(pool, new_cat, starts, bt):
    """Cat-layout sibling of _paged_kv_update: pool [NB, BS, Hkv*D],
    new_cat [B, S, Hkv*D] rows for logical positions starts[b]..+S-1."""
    B, S, HkvD = new_cat.shape
    BS = pool.shape[1]
    MB = bt.shape[1]
    starts = jnp.asarray(starts, jnp.int32)
    bt = jnp.asarray(bt, jnp.int32)
    new_cat = new_cat.astype(pool.dtype)
    if S == 1:
        for i in range(B):
            jb = starts[i] // BS
            blk = jnp.where(
                jb < MB,
                jax.lax.dynamic_index_in_dim(
                    bt[i], jnp.minimum(jb, MB - 1), keepdims=False
                ),
                0,
            )
            pool = jax.lax.dynamic_update_slice(
                pool, new_cat[i : i + 1], (blk, starts[i] % BS, 0)
            )
        return pool
    pos = starts[:, None] + jnp.arange(S, dtype=jnp.int32)[None]
    jb = pos // BS
    blk = jnp.where(
        jb < MB, jnp.take_along_axis(bt, jnp.minimum(jb, MB - 1), axis=1), 0
    )
    return pool.at[blk.reshape(-1), (pos % BS).reshape(-1), :].set(
        new_cat.reshape(B * S, HkvD)
    )


def _paged_gather_cat(pool, bt):
    """[NB, BS, Hkv*D] pool -> per-slot contiguous [B, MB*BS, Hkv*D]."""
    bt = jnp.asarray(bt, jnp.int32)
    B, MB = bt.shape
    return pool[bt].reshape(B, MB * pool.shape[1], pool.shape[2])


def _paged_gather_scales_flat(spool, bt):
    """[NB, Hkv, 1, BS] scale pool -> [B, Hkv, MB*BS] contiguous."""
    bt = jnp.asarray(bt, jnp.int32)
    B, MB = bt.shape
    g = spool[bt][:, :, :, 0, :]               # [B, MB, Hkv, BS]
    return jnp.transpose(g, (0, 2, 1, 3)).reshape(
        B, spool.shape[1], MB * spool.shape[3]
    )


def _paged_scale_update(spool, s_new, starts, bt):
    """Scale-pool companion of _paged_kv_update: spool [NB, Hkv, 1, BS]
    (positions lane-major, the paged kernel's scale layout), s_new
    [B, Hkv, S, 1] per-row scales for positions starts[b]..starts[b]+S-1."""
    B, Hkv, S, _ = s_new.shape
    BS = spool.shape[3]
    MB = bt.shape[1]
    starts = jnp.asarray(starts, jnp.int32)
    bt = jnp.asarray(bt, jnp.int32)
    s_new = s_new.astype(spool.dtype)
    if S == 1:
        for i in range(B):
            jb = starts[i] // BS
            blk = jnp.where(
                jb < MB,
                jax.lax.dynamic_index_in_dim(
                    bt[i], jnp.minimum(jb, MB - 1), keepdims=False
                ),
                0,
            )
            pool_row = s_new[i : i + 1].reshape(1, Hkv, 1, 1)
            spool = jax.lax.dynamic_update_slice(
                spool, pool_row, (blk, 0, 0, starts[i] % BS)
            )
        return spool
    pos = starts[:, None] + jnp.arange(S, dtype=jnp.int32)[None]  # [B, S]
    jb = pos // BS
    blk = jnp.where(
        jb < MB, jnp.take_along_axis(bt, jnp.minimum(jb, MB - 1), axis=1), 0
    )
    off = pos % BS
    rows = s_new[..., 0].transpose(0, 2, 1).reshape(B * S, Hkv)
    return spool.at[blk.reshape(-1), :, 0, off.reshape(-1)].set(rows)


def _split_heads(x, n_heads):
    # [B, S, H*D] -> [B, H, S, D]
    B, S, HD = x.shape
    D = HD // n_heads
    return x.reshape(B, S, n_heads, D).transpose(0, 2, 1, 3)


def _merge_heads(x):
    # [B, H, S, D] -> [B, S, H*D]
    B, H, S, D = x.shape
    return x.transpose(0, 2, 1, 3).reshape(B, S, H * D)


@register("Attention")
def _attention(ctx, inputs, attrs):
    """ONNX opset-23 Attention (rten src/ops/attention.rs:645).

    Q [B,Hq,Tq,D] or [B,Tq,Hq*D]; K,V similarly; optional attn_mask
    (bool: True=keep, or additive float), past_key/past_value appended
    in front of K/V; outputs Y (+present_key, present_value).
    """
    q = get_input(inputs, 0, "query")
    k = get_input(inputs, 1, "key")
    v = get_input(inputs, 2, "value")
    mask = opt_input(inputs, 3)
    past_k = opt_input(inputs, 4)
    past_v = opt_input(inputs, 5)

    three_d = q.ndim == 3
    if three_d:
        q_heads = attrs.get("q_num_heads")
        kv_heads = attrs.get("kv_num_heads", q_heads)
        if q_heads is None:
            raise OpError("Attention with 3D inputs requires q_num_heads")
        q = _split_heads(q, q_heads)
        k = _split_heads(k, kv_heads)
        v = _split_heads(v, kv_heads)

    if past_k is not None:
        k = jnp.concatenate([past_k, k], axis=2)
        v = jnp.concatenate([past_v, v], axis=2)
    present_k, present_v = k, v

    scale = attrs.get("scale")
    softcap = attrs.get("softcap", 0.0)
    causal = bool(attrs.get("is_causal", 0))

    add_mask = None
    if mask is not None:
        m = mask
        if m.dtype == jnp.bool_:
            add_mask = jnp.where(m, 0.0, -1e30).astype(jnp.float32)
        else:
            add_mask = m.astype(jnp.float32)
        # Broadcast [*, Tq, Tk] -> full; the kernels accept 2D masks, so
        # fold batch/head mask dims via the XLA path when present.
        while add_mask.ndim > 2:
            if add_mask.shape[0] != 1:
                break
            add_mask = add_mask[0]

    if add_mask is not None and add_mask.ndim > 2:
        # Per-batch/head masks: use the XLA path (kernel takes 2D masks).
        from ..kernels.flash_attention import mha_xla

        while add_mask.ndim < 4:
            add_mask = add_mask[None]
        out = mha_xla(q, k, v, add_mask, scale=scale, causal=causal, softcap=softcap)
    else:
        out = _attend(ctx, q, k, v, add_mask, scale=scale, causal=causal, softcap=softcap)

    if three_d:
        out = _merge_heads(out)
    n_out = attrs.get("__n_outputs__", 1)
    if n_out >= 3:
        return (out, present_k, present_v)
    return out


@register("MultiHeadAttention")
def _multi_head_attention(ctx, inputs, attrs):
    """MS contrib MultiHeadAttention (rten contrib.rs:48).

    query [B,Tq,H*D] (or packed QKV [B,Tq,H,3,D] when key is absent),
    key/value [B,Tk,H*D] or pre-split [B,H,Tk,D]; optional bias
    [3*H*D], key_padding_mask, attention_bias, past_key/past_value.
    """
    query = get_input(inputs, 0, "query")
    key = opt_input(inputs, 1)
    value = opt_input(inputs, 2)
    bias = opt_input(inputs, 3)
    key_padding_mask = opt_input(inputs, 4)
    attention_bias = opt_input(inputs, 5)
    past_k = opt_input(inputs, 6)
    past_v = opt_input(inputs, 7)
    n_heads = attrs.get("num_heads")
    if n_heads is None:
        raise OpError("MultiHeadAttention requires num_heads")
    scale = attrs.get("scale")
    causal = bool(attrs.get("unidirectional", 0))
    mask_filter = attrs.get("mask_filter_value", -10000.0)

    if query.ndim == 5:  # packed QKV [B,S,H,3,D]
        q = query[:, :, :, 0].transpose(0, 2, 1, 3)
        k = query[:, :, :, 1].transpose(0, 2, 1, 3)
        v = query[:, :, :, 2].transpose(0, 2, 1, 3)
    else:
        hidden = query.shape[-1]
        if bias is not None:
            b = jnp.asarray(bias)
            query = query + b[:hidden]
            if key is not None and key.ndim == 3:
                key = key + b[hidden : 2 * hidden]
            if value is not None and value.ndim == 3:
                value = value + b[2 * hidden :]
        q = _split_heads(query, n_heads)
        if key is not None and key.ndim == 4:
            k, v = key, value  # already [B,H,Tk,D]
        else:
            k = _split_heads(key, n_heads)
            v = _split_heads(value, n_heads)

    if past_k is not None:
        k = jnp.concatenate([past_k, k], axis=2)
        v = jnp.concatenate([past_v, v], axis=2)

    add_mask = None
    if attention_bias is not None:
        add_mask = attention_bias.astype(jnp.float32)
    if key_padding_mask is not None:
        kpm = key_padding_mask
        if kpm.dtype != jnp.bool_:
            kpm = kpm.astype(jnp.int32) != 0
        pad = jnp.where(kpm, 0.0, mask_filter)[:, None, None, :]
        add_mask = pad if add_mask is None else add_mask + pad

    if add_mask is not None:
        from ..kernels.flash_attention import mha_xla

        while add_mask.ndim < 4:
            add_mask = add_mask[None]
        out = mha_xla(q, k, v, add_mask, scale=scale, causal=causal)
    else:
        out = _attend(ctx, q, k, v, None, scale=scale, causal=causal)
    out = _merge_heads(out)
    n_out = attrs.get("__n_outputs__", 1)
    if n_out >= 3:
        return (out, k, v)
    return out


def _sdpa_with_sink(q, k, v, mask, *, scale, softcap, sink):
    """Attention with per-head SINK logits (GPT-OSS style): exp(sink)
    joins the softmax denominator, damping low-affinity rows — equivalent
    to an always-present key with value 0. The reference refuses head_sink
    (contrib.rs:475); implemented here."""
    B, Hq, Tq, D = q.shape
    Hkv = k.shape[1]
    if scale is None:
        scale = 1.0 / float(np.sqrt(D))
    if Hq != Hkv:
        k = jnp.repeat(k, Hq // Hkv, axis=1)
        v = jnp.repeat(v, Hq // Hkv, axis=1)
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32)
    ) * scale
    if softcap:
        s = softcap * jnp.tanh(s / softcap)
    if mask is not None:
        m4 = mask.astype(jnp.float32)
        while m4.ndim < 4:
            m4 = m4[None]
        s = s + m4
    sink = jnp.asarray(sink, jnp.float32).reshape(1, Hq, 1, 1)
    m = jnp.maximum(jnp.max(s, axis=-1, keepdims=True), sink)
    p = jnp.exp(s - m)
    denom = p.sum(axis=-1, keepdims=True) + jnp.exp(sink - m)
    out = jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32)) / denom
    return out.astype(q.dtype)


@register("GroupQueryAttention")
def _group_query_attention(ctx, inputs, attrs):
    """MS contrib GroupQueryAttention (rten contrib.rs:424).

    query [B,S,Hq*D] (or packed [B,S,(Hq+2Hkv)*D] when key/value absent),
    past_key/past_value [B,Hkv,cap,D] preallocated buffers, seqlens_k [B]
    (= total_len-1), total_sequence_length scalar, optional rotary caches.
    """
    query = get_input(inputs, 0, "query")
    key = opt_input(inputs, 1)
    value = opt_input(inputs, 2)
    past_k = opt_input(inputs, 3)
    past_v = opt_input(inputs, 4)
    seqlens_k = opt_input(inputs, 5)
    total_seq_len = opt_input(inputs, 6)
    cos_cache = opt_input(inputs, 7)
    sin_cache = opt_input(inputs, 8)

    n_heads = attrs.get("num_heads")
    kv_heads = attrs.get("kv_num_heads")
    if n_heads is None or kv_heads is None:
        raise OpError("GroupQueryAttention requires num_heads and kv_num_heads")
    scale = attrs.get("scale")
    softcap = attrs.get("softcap", 0.0)
    do_rotary = bool(attrs.get("do_rotary", 0))
    interleaved = bool(attrs.get("rotary_interleaved", 0))
    # Sliding-window (Mistral-style) attention: query at position p
    # attends the last `local_window_size` keys (p-W, p] (reference
    # contrib.rs:770; ORT default -1 = disabled).
    lws = int(attrs.get("local_window_size", -1))
    window = lws if lws > 0 else 0

    # ORT optional extras (inputs 9-11; the deferred-KV serving form
    # reuses these slots for recent_k/recent_v/step_t under the
    # rten_recent_kv attr, so only parse them for ORT-compat graphs).
    # The reference supports position_ids and attention_bias
    # (contrib.rs:470-472) and REFUSES head_sink (:475); here head_sink
    # (GPT-OSS-style attention sinks: a per-head logit joining the softmax
    # denominator) is implemented.
    gqa_pos = attn_bias_in = head_sink = None
    if not attrs.get("rten_recent_kv", 0) and not attrs.get("rten_paged", 0):
        gqa_pos = opt_input(inputs, 9)
        attn_bias_in = opt_input(inputs, 10)
        head_sink = opt_input(inputs, 11)

    B, S, _ = query.shape
    if key is None:  # packed QKV
        D = query.shape[-1] // (n_heads + 2 * kv_heads)
        q = _split_heads(query[..., : n_heads * D], n_heads)
        k = _split_heads(query[..., n_heads * D : (n_heads + kv_heads) * D], kv_heads)
        v = _split_heads(query[..., (n_heads + kv_heads) * D :], kv_heads)
    else:
        q = _split_heads(query, n_heads)
        k = _split_heads(key, kv_heads)
        v = _split_heads(value, kv_heads)

    from .registry import is_tracer

    # Past lengths. `rten_past_lens` marks our own static-cache graphs
    # (serving engine): seqlens_k holds per-slot PAST lengths, possibly
    # traced — KV lands in the preallocated buffer at each slot's offset
    # via per-batch dynamic_update_slice (the continuous-batching write
    # path). ORT-compat models carry seqlens_k = total_len - 1.
    per_slot = bool(attrs.get("rten_past_lens", 0))
    past_lens = None  # [B] int32
    past_len = 0
    if per_slot:
        if seqlens_k is None:
            raise OpError("rten_past_lens requires seqlens_k")
        past_lens = jnp.asarray(seqlens_k, jnp.int32).reshape(B)
    elif past_k is not None and past_k.shape[2] > 0:
        if seqlens_k is not None and not is_tracer(seqlens_k):
            past_len = int(np.asarray(seqlens_k).reshape(-1)[0]) + 1 - S
        else:
            past_len = past_k.shape[2]

    if do_rotary:
        if cos_cache is None or sin_cache is None:
            raise OpError("do_rotary requires cos/sin caches")
        if gqa_pos is not None:
            pos = jnp.broadcast_to(
                jnp.asarray(gqa_pos, jnp.int32).reshape(B, -1), (B, S)
            )
        elif past_lens is not None:
            pos = past_lens[:, None] + jnp.arange(S)[None]
        else:
            pos = jnp.broadcast_to(past_len + jnp.arange(S)[None], (B, S))
        q = _rotary(q, cos_cache, sin_cache, pos, interleaved)
        k = _rotary(k, cos_cache, sin_cache, pos, interleaved)

    if past_lens is not None and bool(attrs.get("rten_paged", 0)):
        # Paged KV cache: past_k/past_v are shared block POOLS
        # [n_blocks, Hkv, block_size, D]; input 9 is the per-slot block
        # table [B, max_blocks]. Logical position p of slot b lives at
        # pool[bt[b, p // BS], :, p % BS, :]. New rows scatter into the
        # pool; attention reads through the table (Pallas block-table
        # kernel at decode, gather-to-contiguous at prefill/CPU).
        bt = get_input(inputs, 9, "block_table")
        if softcap:
            raise OpError("rten_paged does not support softcap")
        n_out = attrs.get("__n_outputs__", 3)
        if past_k.ndim == 3:
            # Cat-layout pools [NB, BS, Hkv*D] (paged kernel-append
            # graphs, round 5): decode runs the in-kernel append through
            # the block table; admission scatters rows then attends over
            # a gathered contiguous view.
            from ..kernels.flash_attention import (
                cat_to_heads, decode_attention, decode_attention_append_cat,
                decode_mha_xla, heads_to_cat,
            )

            if S == 1 and bool(attrs.get("rten_kernel_append", 0)):
                out, pool_k, pool_v = decode_attention_append_cat(
                    q, past_k, past_v, past_lens, k_new=k, v_new=v,
                    scale=scale, window=window, use_flash=_use_flash(ctx),
                    block_table=bt,
                )
                return (out, pool_k, pool_v)[:n_out]
            pool_k = _paged_kv_update_cat(
                past_k, heads_to_cat(k).astype(past_k.dtype), past_lens, bt
            )
            pool_v = _paged_kv_update_cat(
                past_v, heads_to_cat(v).astype(past_v.dtype), past_lens, bt
            )
            Hkv = k.shape[1]
            kf = cat_to_heads(_paged_gather_cat(pool_k, bt), Hkv)
            vf = cat_to_heads(_paged_gather_cat(pool_v, bt), Hkv)
            f = decode_attention if _use_flash(ctx) else decode_mha_xla
            out = f(q, kf.astype(jnp.float32), vf.astype(jnp.float32),
                    past_lens, scale=scale, window=window)
            return (_merge_heads(out), pool_k, pool_v)[:n_out]
        from ..kernels.flash_attention import paged_attention

        pool_k = _paged_kv_update(past_k, k.astype(past_k.dtype), past_lens, bt)
        pool_v = _paged_kv_update(past_v, v.astype(past_v.dtype), past_lens, bt)
        out = paged_attention(
            q, pool_k, pool_v, past_lens, bt, scale=scale, window=window,
            use_flash=_use_flash(ctx),
        )
        out = _merge_heads(out)
        return (out, pool_k, pool_v)[:n_out]

    if past_lens is not None and bool(attrs.get("rten_recent_kv", 0)):
        # Deferred-KV serving graphs: decode steps append the new row to a
        # small per-dispatch "recent" window with ONE uniform-index
        # dynamic_update_slice (the per-slot dus chain cost 558us/step at
        # slots=32 in the round-3 trace); the engine commits the window
        # into the big cache once per dispatch. Prefill (S>1) writes the
        # big cache directly as before.
        recent_k = get_input(inputs, 9, "recent_k")
        recent_v = get_input(inputs, 10, "recent_v")
        step_t = get_input(inputs, 11, "step_t")
        n_out = attrs.get("__n_outputs__", 5)
        if window:
            raise OpError(
                "local_window_size with deferred KV is unsupported; build "
                "the serving graph with deferred_kv=False"
            )
        if softcap:
            # The deferred form routes S==1 to the window path and S>1 to
            # the big-cache path; neither implements softcap, and falling
            # through to a non-deferred path would silently DROP the KV
            # rows the engine expects in the window outputs. Refuse at
            # trace time instead of producing wrong tokens.
            raise OpError(
                "rten_recent_kv (deferred KV) does not support softcap; "
                "build the serving graph with deferred_kv=False"
            )
        if S == 1:
            t = jnp.asarray(step_t, jnp.int32).reshape(())
            lens0 = past_lens - t
            from ..kernels.flash_attention import decode_attention_deferred

            out, rk_new, rv_new = decode_attention_deferred(
                q, past_k, past_v, lens0, scale=scale,
                recent_k=recent_k, recent_v=recent_v, t=t,
                k_new=k, v_new=v, use_flash=_use_flash(ctx),
            )
            out = _merge_heads(out)
            return (out, past_k, past_v, rk_new, rv_new)[:n_out]
        # Prefill: direct big-cache write; the recent window is untouched.
        k = _slot_kv_update(past_k, k.astype(past_k.dtype), past_lens)
        v = _slot_kv_update(past_v, v.astype(past_v.dtype), past_lens)
        from ..kernels.flash_attention import decode_attention, decode_mha_xla

        if _use_flash(ctx):
            out = decode_attention(q, k, v, past_lens, scale=scale)
        else:
            out = decode_mha_xla(q, k, v, past_lens, scale=scale)
        out = _merge_heads(out)
        return (out, k, v, recent_k, recent_v)[:n_out]

    # Cat-layout caches ([slots, cap, Hkv*D]): declared by kernel_append
    # graphs for full-lane-width DMA (444 -> 732 GB/s on s8 D=64 caches,
    # round-4 microbench). Detected by rank.
    cat_kv = past_k is not None and past_k.ndim == 3

    if (past_lens is not None and S == 1
            and bool(attrs.get("rten_kernel_append", 0))
            and not softcap and attn_bias_in is None and head_sink is None):
        # In-kernel cache append: the decode-attention kernel merges the
        # new row into its aliased write-back block — no per-slot dus
        # chain, no recent window (round-4 trace: the deferred design's
        # window stream + window dus + commit cost ~1ms/step at slots=96).
        n_out = attrs.get("__n_outputs__", 3)
        if cat_kv:
            from ..kernels.flash_attention import decode_attention_append_cat

            # out arrives in cat layout [B, S, H*D] == merged heads.
            out, nk, nv = decode_attention_append_cat(
                q, past_k, past_v, past_lens, k_new=k, v_new=v,
                scale=scale, window=window, use_flash=_use_flash(ctx),
            )
            return (out, nk, nv)[:n_out]
        from ..kernels.flash_attention import decode_attention_append

        out, nk, nv = decode_attention_append(
            q, past_k, past_v, past_lens, k_new=k, v_new=v,
            scale=scale, window=window, use_flash=_use_flash(ctx),
        )
        out = _merge_heads(out)
        return (out, nk, nv)[:n_out]

    if past_lens is not None and cat_kv:
        # Cat-cache prefill: append the chunk's rows in cat form, then
        # attend straight off the cat cache. prefill_mha_cat runs an
        # UNROLLED per-head loop of lane-sliced dots inside a (slot,
        # q-block, key-block) grid — useful MACs only; 562us vs the
        # per-head GRID's 1223us per layer at the 96x128 admission wave.
        # (A folded block-diagonal variant was also tried: its Hkv-x MXU
        # redundancy made prefill 4.8 TFLOP where 0.4 is useful — the
        # fold only pays at S == 1, where M-padding dominates anyway.)
        from ..kernels.flash_attention import (
            cat_to_heads, decode_attention, decode_mha_xla, heads_to_cat,
            on_tpu, prefill_mha_cat,
        )

        if softcap or attn_bias_in is not None or head_sink is not None:
            raise OpError(
                "cat-layout KV caches do not support softcap/bias/sink"
            )
        kc = _slot_kv_update_cat(
            past_k, heads_to_cat(k).astype(past_k.dtype), past_lens
        )
        vc = _slot_kv_update_cat(
            past_v, heads_to_cat(v).astype(past_v.dtype), past_lens
        )
        Hkv = k.shape[1]
        n_out = attrs.get("__n_outputs__", 3)
        if _use_flash(ctx) and on_tpu() and q.shape[3] in (64, 128, 256):
            out = prefill_mha_cat(
                q, kc, vc, past_lens, scale=scale, window=window
            )
            return (_merge_heads(out), kc, vc)[:n_out]
        f = decode_attention if _use_flash(ctx) else decode_mha_xla
        out = f(q, cat_to_heads(kc, Hkv).astype(q.dtype),
                cat_to_heads(vc, Hkv).astype(q.dtype), past_lens,
                scale=scale, window=window)
        out = _merge_heads(out)
        return (out, kc, vc)[:n_out]

    if past_lens is not None:
        k = _slot_kv_update(past_k, k.astype(past_k.dtype), past_lens)
        v = _slot_kv_update(past_v, v.astype(past_v.dtype), past_lens)
        if softcap or attn_bias_in is not None or head_sink is not None:
            # decode kernel has no softcap/bias/sink path; keep the XLA
            # formulation.
            cap = past_k.shape[2]
            j = jnp.arange(cap)[None, None, None, :]
            qpos = past_lens[:, None, None, None] + jnp.arange(S)[None, None, :, None]
            valid = j <= qpos
            if window:
                valid &= j > qpos - window
            add_mask = jnp.where(valid, 0.0, -1e30).astype(jnp.float32)
            if attn_bias_in is not None:
                add_mask = add_mask + attn_bias_in.astype(jnp.float32)
            if head_sink is not None:
                out = _sdpa_with_sink(q, k, v, add_mask, scale=scale,
                                      softcap=softcap, sink=head_sink)
            else:
                from ..kernels.flash_attention import mha_xla

                out = mha_xla(q, k, v, add_mask, scale=scale, softcap=softcap)
        else:
            from ..kernels.flash_attention import decode_attention, decode_mha_xla

            if _use_flash(ctx):
                out = decode_attention(q, k, v, past_lens, scale=scale,
                                       window=window)
            else:
                out = decode_mha_xla(q, k, v, past_lens, scale=scale,
                                     window=window)
        out = _merge_heads(out)
        n_out = attrs.get("__n_outputs__", 1)
        if n_out >= 3:
            return (out, k, v)
        return out

    if past_k is not None and past_k.shape[2] > 0:
        if past_len == past_k.shape[2]:
            k = jnp.concatenate([past_k, k], axis=2)
            v = jnp.concatenate([past_v, v], axis=2)
        else:
            k = jax.lax.dynamic_update_slice(past_k, k.astype(past_k.dtype), (0, 0, past_len, 0))
            v = jax.lax.dynamic_update_slice(past_v, v.astype(past_v.dtype), (0, 0, past_len, 0))

    total = past_len + S
    kv_cap = k.shape[2]
    if window or attn_bias_in is not None or head_sink is not None:
        # Explicit per-row mask (causal + window + tail + optional bias).
        col = jnp.arange(kv_cap)[None, :]
        qpos = past_len + jnp.arange(S)[:, None]
        valid = (col <= qpos) & (col < total)
        if window:
            valid &= col > qpos - window
        mask = jnp.where(valid, 0.0, -1e30).astype(jnp.float32)
        if attn_bias_in is not None:
            mask = mask + attn_bias_in.astype(jnp.float32)
        if head_sink is not None:
            out = _sdpa_with_sink(q, k, v, mask, scale=scale,
                                  softcap=softcap, sink=head_sink)
        else:
            out = _attend(ctx, q, k, v, mask, scale=scale, causal=False,
                          softcap=softcap)
    elif kv_cap > total:
        # Preallocated cache: mask out the unwritten tail.
        mask = jnp.where(jnp.arange(kv_cap) < total, 0.0, -1e30)[None, :]
        mask = jnp.broadcast_to(mask, (S, kv_cap))
        out = _attend(ctx, q, k, v, mask, scale=scale, causal=True, softcap=softcap)
    else:
        out = _attend(ctx, q, k, v, None, scale=scale, causal=True, softcap=softcap)
    out = _merge_heads(out)
    n_out = attrs.get("__n_outputs__", 1)
    if n_out >= 3:
        return (out, k, v)
    return out


@register("QuantizedKVAttention")
def _quantized_kv_attention(ctx, inputs, attrs):
    """Self-attention over an INT8 KV cache (BASELINE north star: 'INT8
    KV-cache in HBM'). Engine-internal op for static-cache serving graphs.

    New K/V quantize per (slot, head, position) with absmax/127 scales at
    write time; reads dequantize on the fly (XLA fuses the dequant into the
    attention consumer, so HBM traffic for the cache is ~4x smaller than
    f32 while scores/outputs stay f32).

    inputs: q, k, v [B,S,H*D] f32; past_k_q8 [B,H,cap,D] s8;
            k_scales [B,H,cap,1] f32; past_v_q8; v_scales; past_lens [B]
    outputs: out [B,S,H*D], new_k_q8, new_k_scales, new_v_q8, new_v_scales
    """
    q = get_input(inputs, 0, "query")
    k = get_input(inputs, 1, "key")
    v = get_input(inputs, 2, "value")
    past_k_q8 = get_input(inputs, 3, "past_k_q8")
    k_scales = get_input(inputs, 4, "k_scales")
    past_v_q8 = get_input(inputs, 5, "past_v_q8")
    v_scales = get_input(inputs, 6, "v_scales")
    past_lens = jnp.asarray(get_input(inputs, 7, "past_lens"), jnp.int32)
    n_heads = attrs.get("num_heads")
    # GQA: K/V carry kv_num_heads (< num_heads) — the decode kernels
    # broadcast per group (same as GroupQueryAttention).
    kv_heads = attrs.get("kv_num_heads", n_heads)
    scale = attrs.get("scale")
    # bits=4: the cache is nibble-packed u8 [B,H,cap,D/2] with absmax/7
    # scales (kernels/flash_attention.pack_int4) — 2x the context capacity
    # per HBM byte of int8; the decode kernel unpacks in VMEM.
    bits = int(attrs.get("bits", 8))
    lws = int(attrs.get("local_window_size", -1))
    window = lws if lws > 0 else 0

    B, S, _ = q.shape
    q4 = _split_heads(q, n_heads)
    k4 = _split_heads(k, kv_heads)
    v4 = _split_heads(v, kv_heads)

    if bool(attrs.get("do_rotary", 0)):
        # Rotary on q/k BEFORE the cache quantize (llama-family serving
        # graphs; positions derive from past_lens like GroupQueryAttention).
        cos_cache = inputs[-2]
        sin_cache = inputs[-1]
        if cos_cache is None or sin_cache is None:
            raise OpError("QuantizedKVAttention: do_rotary needs cos/sin "
                          "caches as the last two inputs")
        pos = past_lens.reshape(B)[:, None] + jnp.arange(S)[None]
        interleaved = bool(attrs.get("rotary_interleaved", 0))
        q4 = _rotary(q4, cos_cache, sin_cache, pos, interleaved)
        k4 = _rotary(k4, cos_cache, sin_cache, pos, interleaved)

    def quantize(x4):
        if bits == 4:
            from ..kernels.flash_attention import pack_int4

            return pack_int4(x4)
        absmax = jnp.max(jnp.abs(x4), axis=-1, keepdims=True)  # [B,H,S,1]
        s = jnp.maximum(absmax / 127.0, 1e-8)
        q8 = jnp.clip(jnp.round(x4 / s), -127, 127).astype(jnp.int8)
        return q8, s.astype(jnp.float32)

    lens = past_lens.reshape(B)
    if window and bool(attrs.get("rten_recent_kv", 0)):
        raise OpError(
            "local_window_size with deferred KV is unsupported; build the "
            "serving graph with deferred_kv=False"
        )
    if bool(attrs.get("rten_recent_kv", 0)):
        # Deferred-KV (see GroupQueryAttention): decode rows stay f32 in
        # the recent window; the engine quantizes at commit time. The
        # kernel mixes the s8 big cache with the f32 window.
        recent_k = get_input(inputs, 8, "recent_k")
        recent_v = get_input(inputs, 9, "recent_v")
        step_t = get_input(inputs, 10, "step_t")
        cap = past_k_q8.shape[2]
        ks = k_scales.reshape(B, kv_heads, cap)
        vs = v_scales.reshape(B, kv_heads, cap)
        from ..kernels.flash_attention import decode_attention, decode_mha_xla

        f = decode_attention if _use_flash(ctx) else decode_mha_xla
        if S == 1:
            t = jnp.asarray(step_t, jnp.int32).reshape(())
            lens0 = lens - t
            from ..kernels.flash_attention import decode_attention_deferred

            out, rk_new, rv_new = decode_attention_deferred(
                q4, past_k_q8, past_v_q8, lens0, ks, vs, scale=scale,
                recent_k=recent_k, recent_v=recent_v, t=t,
                k_new=k4, v_new=v4, use_flash=_use_flash(ctx),
            )
            return (_merge_heads(out), past_k_q8, k_scales, past_v_q8,
                    v_scales, rk_new, rv_new)
        # Prefill: quantize + write the big cache directly.
        k_q8, k_s = quantize(k4)
        v_q8, v_s = quantize(v4)
        new_k_q8 = _slot_kv_update(past_k_q8, k_q8, lens)
        new_k_s = _slot_kv_update(k_scales, k_s, lens)
        new_v_q8 = _slot_kv_update(past_v_q8, v_q8, lens)
        new_v_s = _slot_kv_update(v_scales, v_s, lens)
        out = f(q4, new_k_q8, new_v_q8, lens,
                new_k_s.reshape(B, kv_heads, cap),
                new_v_s.reshape(B, kv_heads, cap), scale=scale)
        return (_merge_heads(out), new_k_q8, new_k_s, new_v_q8, new_v_s,
                recent_k, recent_v)

    if bool(attrs.get("rten_paged", 0)):
        # Paged int8 KV: pools [NB, Hkv, BS, D] (or cat [NB, BS, Hkv*D]
        # for kernel-append graphs) + scale pools [NB, Hkv, 1, BS]
        # addressed by the block table (input 8).
        if bits != 8:
            raise OpError("rten_paged quantized KV supports bits=8 only")
        bt = get_input(inputs, 8, "block_table")
        if past_k_q8.ndim == 3:
            from ..kernels.flash_attention import (
                cat_to_heads, decode_attention, decode_attention_append_cat,
                decode_mha_xla, heads_to_cat,
            )

            if S == 1 and bool(attrs.get("rten_kernel_append", 0)):
                # In-kernel quantize + append through the block table —
                # paged serving keeps the round-4 decode design (the
                # round-3 path paid a scatter + gather per step).
                out, nk, nv, nks, nvs = decode_attention_append_cat(
                    q4, past_k_q8, past_v_q8, lens, k_scales, v_scales,
                    k_new=k4, v_new=v4, scale=scale, window=window,
                    use_flash=_use_flash(ctx), block_table=bt,
                )
                return (out, nk, nks, nv, nvs)
            k_q8, k_s = quantize(k4)
            v_q8, v_s = quantize(v4)
            new_pk = _paged_kv_update_cat(
                past_k_q8, heads_to_cat(k_q8), lens, bt
            )
            new_pv = _paged_kv_update_cat(
                past_v_q8, heads_to_cat(v_q8), lens, bt
            )
            new_ks = _paged_scale_update(k_scales, k_s, lens, bt)
            new_vs = _paged_scale_update(v_scales, v_s, lens, bt)
            cap = bt.shape[1] * past_k_q8.shape[1]
            kf = cat_to_heads(_paged_gather_cat(new_pk, bt), kv_heads)
            vf = cat_to_heads(_paged_gather_cat(new_pv, bt), kv_heads)
            f = decode_attention if _use_flash(ctx) else decode_mha_xla
            out = f(q4, kf, vf, lens,
                    _paged_gather_scales_flat(new_ks, bt),
                    _paged_gather_scales_flat(new_vs, bt),
                    scale=scale, window=window)
            return (_merge_heads(out), new_pk, new_ks, new_pv, new_vs)
        from ..kernels.flash_attention import paged_attention

        k_q8, k_s = quantize(k4)
        v_q8, v_s = quantize(v4)
        new_pk = _paged_kv_update(past_k_q8, k_q8, lens, bt)
        new_ks = _paged_scale_update(k_scales, k_s, lens, bt)
        new_pv = _paged_kv_update(past_v_q8, v_q8, lens, bt)
        new_vs = _paged_scale_update(v_scales, v_s, lens, bt)
        out = paged_attention(
            q4, new_pk, new_pv, lens, bt, new_ks, new_vs, scale=scale,
            window=window, use_flash=_use_flash(ctx),
        )
        return (_merge_heads(out), new_pk, new_ks, new_pv, new_vs)

    if S == 1 and bool(attrs.get("rten_kernel_append", 0)):
        # In-kernel quantize + cache append (see GroupQueryAttention).
        if bits != 8:
            raise OpError("rten_kernel_append supports bits=8 only")
        if past_k_q8.ndim == 3:
            from ..kernels.flash_attention import decode_attention_append_cat

            # out arrives in cat layout [B, S, H*D] == merged heads.
            out, nk, nv, nks, nvs = decode_attention_append_cat(
                q4, past_k_q8, past_v_q8, lens, k_scales, v_scales,
                k_new=k4, v_new=v4, scale=scale, window=window,
                use_flash=_use_flash(ctx),
            )
            return (out, nk, nks, nv, nvs)
        from ..kernels.flash_attention import decode_attention_append

        out, nk, nv, nks, nvs = decode_attention_append(
            q4, past_k_q8, past_v_q8, lens, k_scales, v_scales,
            k_new=k4, v_new=v4, scale=scale, window=window,
            use_flash=_use_flash(ctx),
        )
        return (_merge_heads(out), nk, nks, nv, nvs)

    k_q8, k_s = quantize(k4)
    v_q8, v_s = quantize(v4)

    if past_k_q8.ndim == 3:
        # Cat-layout prefill (kernel_append graphs): append rows in cat
        # form, then attend straight off the cat cache (see
        # GroupQueryAttention).
        from ..kernels.flash_attention import (
            cat_to_heads, decode_attention, decode_mha_xla, heads_to_cat,
            on_tpu, prefill_mha_cat,
        )

        new_kc = _slot_kv_update_cat(past_k_q8, heads_to_cat(k_q8), lens)
        new_vc = _slot_kv_update_cat(past_v_q8, heads_to_cat(v_q8), lens)
        new_k_s = _slot_kv_update(k_scales, k_s, lens)
        new_v_s = _slot_kv_update(v_scales, v_s, lens)
        cap = past_k_q8.shape[1]
        if _use_flash(ctx) and on_tpu() and q4.shape[3] in (64, 128, 256):
            out = prefill_mha_cat(
                q4, new_kc, new_vc, lens, new_k_s, new_v_s,
                scale=scale, window=window,
            )
            return (_merge_heads(out), new_kc, new_k_s, new_vc, new_v_s)
        f = decode_attention if _use_flash(ctx) else decode_mha_xla
        out = f(q4, cat_to_heads(new_kc, kv_heads),
                cat_to_heads(new_vc, kv_heads), lens,
                new_k_s.reshape(B, kv_heads, cap),
                new_v_s.reshape(B, kv_heads, cap),
                scale=scale, window=window)
        return (_merge_heads(out), new_kc, new_k_s, new_vc, new_v_s)

    new_k_q8 = _slot_kv_update(past_k_q8, k_q8, lens)
    new_k_s = _slot_kv_update(k_scales, k_s, lens)
    new_v_q8 = _slot_kv_update(past_v_q8, v_q8, lens)
    new_v_s = _slot_kv_update(v_scales, v_s, lens)

    from ..kernels.flash_attention import decode_attention, decode_mha_xla

    cap = past_k_q8.shape[2]
    ks = new_k_s.reshape(B, kv_heads, cap)
    vs = new_v_s.reshape(B, kv_heads, cap)
    # Fused-dequant attention: the s8 cache is read at 1 byte/elem and
    # dequantized in VMEM (round-1 int8-KV lost to f32 because the dequant
    # materialized f32 copies of the whole cache each step).
    if _use_flash(ctx):
        out = decode_attention(q4, new_k_q8, new_v_q8, lens, ks, vs,
                               scale=scale, window=window)
    else:
        out = decode_mha_xla(q4, new_k_q8, new_v_q8, lens, ks, vs,
                             scale=scale, window=window)
    return (_merge_heads(out), new_k_q8, new_k_s, new_v_q8, new_v_s)


def _rotary(x, cos_cache, sin_cache, position_ids, interleaved):
    """Apply rotary embedding to [B,H,S,D] (rotates first rot_dim dims)."""
    cos = jnp.asarray(cos_cache)[position_ids]  # [B,S,rot/2]
    sin = jnp.asarray(sin_cache)[position_ids]
    rot = cos.shape[-1] * 2
    x_rot, x_pass = x[..., :rot], x[..., rot:]
    cos = cos[:, None]  # [B,1,S,rot/2]
    sin = sin[:, None]
    if interleaved:
        x1 = x_rot[..., 0::2]
        x2 = x_rot[..., 1::2]
        r1 = x1 * cos - x2 * sin
        r2 = x1 * sin + x2 * cos
        rotated = jnp.stack([r1, r2], axis=-1).reshape(x_rot.shape)
    else:
        half = rot // 2
        x1 = x_rot[..., :half]
        x2 = x_rot[..., half:]
        rotated = jnp.concatenate([x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1)
    return jnp.concatenate([rotated, x_pass], axis=-1) if x_pass.shape[-1] else rotated


def _rotary_impl(ctx, inputs, attrs):
    x = get_input(inputs, 0)
    cos_cache = get_input(inputs, 1, "cos_cache")
    sin_cache = get_input(inputs, 2, "sin_cache")
    position_ids = opt_input(inputs, 3)
    interleaved = bool(attrs.get("interleaved", attrs.get("rotary_interleaved", 0)))
    n_heads = attrs.get("num_heads", 0)

    three_d = x.ndim == 3
    if three_d:
        if not n_heads:
            raise OpError("RotaryEmbedding with 3D input requires num_heads")
        x4 = _split_heads(x, n_heads)
    else:
        x4 = x
    B, H, S, D = x4.shape
    if position_ids is None:
        position_ids = jnp.broadcast_to(jnp.arange(S)[None], (B, S))
    elif position_ids.ndim == 1:
        position_ids = jnp.broadcast_to(position_ids[None], (B, S))
    # Caches may arrive as full rot_dim (duplicated halves); ONNX spec says
    # [max_pos, rot_dim/2]. MS variant sometimes ships [max_pos, rot_dim]:
    # detect by comparing against rotary_embedding_dim when given.
    rot_dim = attrs.get("rotary_embedding_dim", 0)
    cos_cache = jnp.asarray(cos_cache)
    if rot_dim and cos_cache.shape[-1] == rot_dim:
        cos_cache = cos_cache[..., : rot_dim // 2]
        sin_cache = jnp.asarray(sin_cache)[..., : rot_dim // 2]
    out = _rotary(x4, cos_cache, sin_cache, position_ids, interleaved)
    return _merge_heads(out) if three_d else out


register("RotaryEmbedding")(_rotary_impl)
register("RotaryEmbeddingMS")(_rotary_impl)
