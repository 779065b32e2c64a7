"""int4 block-dequant matmul (MatMulNBits): f32 activations x int4 weights.

TPU analog of rten's `BlockQuantizedGemm` (rten-gemm/src/block_quant.rs:33):
weights stay packed as nibbles in HBM (8x less bandwidth than f32 — the
point of the op for memory-bound decode GEMV) and are dequantized per-tile
in VMEM right before the MXU dot.

Layout trick: the packed u8 array holds K-pairs (element k=2p in the low
nibble, k=2p+1 high). Rather than interleaving nibbles on-chip (an awkward
lane shuffle), the *contraction order* is permuted: within each K-tile the
kernel contracts [even K indices | odd K indices], and the wrapper feeds the
activations pre-split into even/odd columns (cheap XLA slice on the small
activation matrix). A dot product is invariant to a shared permutation of
the contraction axis. Per-block scales still align because a block of
``bs`` consecutive K indices maps to ``bs/2`` consecutive even (resp. odd)
positions.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import cdiv, on_tpu, pad_dim, round_up


def _unpack_zero_points(zero_points, N, n_blocks):
    """Zero points -> [N, n_blocks] int32 (default 8, the unsigned-int4 mid)."""
    if zero_points is None:
        return jnp.full((N, n_blocks), 8, jnp.int32)
    zp = jnp.asarray(zero_points)
    if zp.dtype == jnp.uint8:
        # ORT packs ceil(n_blocks/2) bytes PER COLUMN (each column padded to
        # a byte boundary) — unpack per row so odd n_blocks stays aligned.
        bytes_per_col = (n_blocks + 1) // 2
        zp = zp.reshape(N, bytes_per_col)
        lo = (zp & 0x0F).astype(jnp.int32)
        hi = ((zp >> 4) & 0x0F).astype(jnp.int32)
        zp = jnp.stack([lo, hi], axis=-1).reshape(N, bytes_per_col * 2)
        zp = zp[:, :n_blocks]
    return zp.reshape(N, n_blocks).astype(jnp.int32)


def _kernel(a_even_ref, a_odd_ref, b_ref, scale_ref, zp_ref, out_ref, acc_ref,
            *, block_size: int):
    # Weights arrive K-major ([BKh, BN]: N on lanes, packed-K on sublanes) so
    # that expanding per-block scales to per-element is a *sublane* reshape,
    # which Mosaic supports (lane-dim reshapes are not lowerable).
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # Widen to i32 before bit ops: Mosaic has no u8 vector shifts.
    b32 = b_ref[:].astype(jnp.int32)  # [BKh, BN] packed nibble pairs
    lo = b32 & 0x0F
    hi = (b32 >> 4) & 0x0F
    half = block_size // 2
    bkh, bn = b32.shape

    def expand(v):
        # [nb, BN] -> [nb*half, BN]: block value covers half a block of
        # packed bytes. Lane dim (BN) unchanged -> legal reshape.
        return jnp.broadcast_to(v[:, None, :], (bkh // half, half, bn)).reshape(
            bkh, bn
        )

    scale = expand(scale_ref[:])
    zp = expand(zp_ref[:].astype(jnp.float32))
    w_lo = lo.astype(jnp.float32) * scale - zp * scale  # [BKh, BN]
    w_hi = hi.astype(jnp.float32) * scale - zp * scale

    dn = (((1,), (0,)), ((), ()))  # [BM,BKh] x [BKh,BN]
    # HIGHEST: f32-accurate MXU passes; default bf16 passes cost ~1% error
    # vs the reference's exact f32 GEMM (accuracy parity, SURVEY.md section 7).
    acc_ref[:] += jax.lax.dot_general(
        a_even_ref[:], w_lo, dimension_numbers=dn,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ) + jax.lax.dot_general(
        a_odd_ref[:], w_hi, dimension_numbers=dn,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )

    @pl.when(kb == pl.num_programs(2) - 1)
    def _():
        out_ref[:] = acc_ref[:]


def int4_matmul_pallas(a2, b_packed_2d, scales2, zps2, *, K, N, block_size,
                       block_m=256, block_n=256, block_k=1024, interpret=False):
    """a2 [M,K] f32 x packed int4 weights [N, K/2] -> [M, N] f32."""
    M = a2.shape[0]
    n_blocks = scales2.shape[1]

    # K-tile: multiple of 2*128 (half-tiles need 128 lanes) and block_size.
    bk = min(block_k, round_up(K, 256))
    bk = round_up(bk, max(256, block_size))
    Kp = round_up(K, bk)
    bm = min(block_m, round_up(M, 8))
    bn = min(block_n, round_up(N, 128))
    Mp, Np = round_up(M, bm), round_up(N, bn)
    nb_tile = bk // block_size
    NBp = Kp // block_size

    a_p = pad_dim(pad_dim(a2.astype(jnp.float32), 0, Mp), 1, Kp)
    a_even = a_p[:, 0::2]  # [Mp, Kp/2]
    a_odd = a_p[:, 1::2]
    # K-major weight/scale layouts (N on lanes); for real models this
    # transpose happens once at weight-load time.
    b_p = pad_dim(pad_dim(b_packed_2d, 0, Np), 1, Kp // 2).T
    scales_p = pad_dim(pad_dim(scales2.astype(jnp.float32), 0, Np, 1.0), 1, NBp, 1.0).T
    zps_p = pad_dim(pad_dim(zps2, 0, Np), 1, NBp).T

    bkh = bk // 2
    grid = (Mp // bm, Np // bn, Kp // bk)
    out = pl.pallas_call(
        functools.partial(_kernel, block_size=block_size),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bkh), lambda m, n, k: (m, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, bkh), lambda m, n, k: (m, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((bkh, bn), lambda m, n, k: (k, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb_tile, bn), lambda m, n, k: (k, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb_tile, bn), lambda m, n, k: (k, n), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bm, bn), lambda m, n, k: (m, n), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * Np * Kp,
            bytes_accessed=4 * Mp * Kp + Np * Kp // 2 + 4 * Mp * Np,
            transcendentals=0,
        ),
        interpret=interpret,
    )(a_even, a_odd, b_p, scales_p, zps_p)
    return out[:M, :N]


def int4_matmul_xla(a2, b_packed_2d, scales2, zps2, *, K, N, block_size):
    """XLA reference: dequantize fully, then matmul (CPU fallback/golden)."""
    n_blocks = scales2.shape[1]
    b = b_packed_2d.reshape(N, n_blocks, block_size // 2)
    lo = (b & 0x0F).astype(jnp.int32)
    hi = ((b >> 4) & 0x0F).astype(jnp.int32)
    vals = jnp.stack([lo, hi], axis=-1).reshape(N, n_blocks, block_size)
    w = (vals - zps2[:, :, None]).astype(jnp.float32) * scales2[:, :, None].astype(
        jnp.float32
    )
    w = w.reshape(N, n_blocks * block_size)[:, :K]
    return jnp.matmul(
        a2.astype(jnp.float32), w.T, precision=jax.lax.Precision.HIGHEST
    )


def int4_matmul(a, b_packed, scales, zero_points, *, K, N, block_size):
    """MatMulNBits entry: a [..., K] x int4 packed weights -> [..., N]."""
    n_blocks = cdiv(K, block_size)
    b2 = jnp.asarray(b_packed).reshape(N, n_blocks * block_size // 2)
    scales2 = jnp.asarray(scales).reshape(N, n_blocks)
    zps2 = _unpack_zero_points(zero_points, N, n_blocks)

    lead = a.shape[:-1]
    M = int(np.prod(lead)) if lead else 1
    a2 = a.reshape(M, K)
    if on_tpu():
        # Weight rows span n_blocks*block_size K positions; pad activations
        # with zeros so padded weight columns contribute nothing.
        k_data = n_blocks * block_size
        out = int4_matmul_pallas(
            pad_dim(a2, 1, k_data), b2, scales2, zps2,
            K=k_data, N=N, block_size=block_size,
        )
    else:
        out = int4_matmul_xla(a2, b2, scales2, zps2, K=K, N=N, block_size=block_size)
    return out.reshape(*lead, N).astype(a.dtype if jnp.issubdtype(a.dtype, jnp.floating) else jnp.float32)
