"""rten_tpu: a TPU-native quantized ONNX inference engine.

Built from scratch with the capabilities of robertknight/rten (see
SURVEY.md), designed for JAX/XLA/Pallas: graphs trace to single XLA
computations, hot quantized ops run as Pallas MXU kernels, and execution
shards over TPU meshes via jax.sharding.
"""

__version__ = "0.1.0"

from .dtypes import DataType  # noqa: F401
from .ir import Graph, GraphBuilder  # noqa: F401
from .runtime import Executor, RunConfig  # noqa: F401
