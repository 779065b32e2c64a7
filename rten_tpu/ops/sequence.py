"""Sequence ops (rten src/ops/sequence.rs, ValueType::Sequence).

Sequences are python lists of arrays at trace time — they never cross the
XLA boundary as a single value (the reference similarly keeps them as
Vec<Value>). Positions/indices must be trace-time constants.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .registry import OpError, get_input, opt_input, register, static_value


def _as_seq(v, what="sequence"):
    if not isinstance(v, list):
        raise OpError(f"{what} input must be a sequence")
    return v


def _pos(p, n, what="position"):
    i = int(static_value(p, what).reshape(()))
    if i < 0:
        i += n
    if not 0 <= i < n:
        raise OpError(f"{what} {i} out of range for sequence of {n}")
    return i


@register("SequenceEmpty")
def _sequence_empty(ctx, inputs, attrs):
    return []


@register("SequenceConstruct")
def _sequence_construct(ctx, inputs, attrs):
    return [x for x in inputs]


@register("SequenceLength")
def _sequence_length(ctx, inputs, attrs):
    return jnp.asarray(len(_as_seq(get_input(inputs, 0))), jnp.int32)


@register("SequenceAt")
def _sequence_at(ctx, inputs, attrs):
    seq = _as_seq(get_input(inputs, 0))
    return seq[_pos(get_input(inputs, 1, "position"), len(seq))]


@register("SequenceInsert")
def _sequence_insert(ctx, inputs, attrs):
    seq = list(_as_seq(get_input(inputs, 0)))
    val = get_input(inputs, 1)
    pos = opt_input(inputs, 2)
    if pos is None:
        seq.append(val)
    else:
        i = int(static_value(pos, "position").reshape(()))
        if i < 0:
            i += len(seq) + 1
        seq.insert(i, val)
    return seq


@register("SequenceErase")
def _sequence_erase(ctx, inputs, attrs):
    seq = list(_as_seq(get_input(inputs, 0)))
    pos = opt_input(inputs, 1)
    i = _pos(pos, len(seq)) if pos is not None else len(seq) - 1
    del seq[i]
    return seq


@register("ConcatFromSequence")
def _concat_from_sequence(ctx, inputs, attrs):
    seq = _as_seq(get_input(inputs, 0))
    axis = attrs.get("axis")
    if axis is None:
        raise OpError("ConcatFromSequence requires axis")
    if attrs.get("new_axis", 0):
        return jnp.stack(seq, axis=axis)
    return jnp.concatenate(seq, axis=axis)


@register("SplitToSequence")
def _split_to_sequence(ctx, inputs, attrs):
    x = get_input(inputs, 0)
    split = opt_input(inputs, 1)
    axis = attrs.get("axis", 0)
    keepdims = attrs.get("keepdims", 1)
    n = x.shape[axis]
    if split is None:
        parts = jnp.split(x, n, axis=axis)
        if not keepdims:
            parts = [jnp.squeeze(p, axis=axis) for p in parts]
        return parts
    sp = static_value(split, "split")
    if sp.ndim == 0:
        size = int(sp)
        indices = list(range(size, n, size))
    else:
        sizes = [int(s) for s in sp]
        indices = list(np.cumsum(sizes)[:-1])
    return jnp.split(x, indices, axis=axis)
