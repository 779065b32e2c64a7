"""Pallas TPU kernels: the performance-critical native core.

These are the TPU analogs of the reference's hand-written SIMD microkernels
(rten-gemm AVX-512/VNNI/SDOT int8 GEMM, rten-vecmath): fused
dequant+matmul on the MXU, int4 block-dequant matmul, and flash attention.

Every kernel has an XLA reference implementation used (a) as the CPU
fallback, and (b) as the golden in tests (Pallas interpret-mode vs XLA).
"""

from .common import on_tpu  # noqa: F401
from .int8_matmul import int8_matmul_dequant, int8_matmul_dequant_auto  # noqa: F401
from .int4_matmul import int4_matmul  # noqa: F401
