"""Ring attention (context-parallel): sequence-sharded K/V chunks rotating
over the mesh must reproduce full attention exactly."""

import numpy as np
import pytest

from rten_tpu.parallel import MeshConfig, make_mesh
from rten_tpu.parallel.ring import ring_attention


def _full_attention(q, k, v, causal, scale=None):
    import jax.numpy as jnp

    from rten_tpu.kernels.flash_attention import mha_xla

    T = q.shape[2]
    mask = None
    if causal:
        qp = np.arange(T)[:, None]
        kp = np.arange(T)[None, :]
        mask = jnp.asarray(np.where(kp <= qp, 0.0, -1e30), jnp.float32)
    return np.asarray(mha_xla(q, k, v, mask, scale=scale))


@pytest.mark.parametrize("causal", [True, False])
def test_ring_matches_full_attention(causal):
    rng = np.random.default_rng(0)
    B, H, T, D = 2, 3, 32, 16
    q = rng.standard_normal((B, H, T, D)).astype(np.float32)
    k = rng.standard_normal((B, H, T, D)).astype(np.float32)
    v = rng.standard_normal((B, H, T, D)).astype(np.float32)
    mesh = make_mesh(MeshConfig(1, 8))
    got = np.asarray(ring_attention(q, k, v, mesh, causal=causal))
    want = _full_attention(q, k, v, causal)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_ring_gqa():
    rng = np.random.default_rng(1)
    B, Hq, Hkv, T, D = 1, 8, 2, 16, 8
    q = rng.standard_normal((B, Hq, T, D)).astype(np.float32)
    k = rng.standard_normal((B, Hkv, T, D)).astype(np.float32)
    v = rng.standard_normal((B, Hkv, T, D)).astype(np.float32)
    mesh = make_mesh(MeshConfig(1, 4))
    got = np.asarray(ring_attention(q, k, v, mesh, causal=True))
    want = _full_attention(q, k, v, True)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_ring_rejects_indivisible_seq():
    mesh = make_mesh(MeshConfig(1, 8))
    x = np.zeros((1, 1, 12, 8), np.float32)
    with pytest.raises(ValueError, match="divisible"):
        ring_attention(x, x, x, mesh)
