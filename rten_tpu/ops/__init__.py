"""Operator lowerings. Importing this package populates the registry."""

from . import registry  # noqa: F401
from .registry import OpError, REGISTRY, get_op, register  # noqa: F401

# Import op modules for their registration side effects.
from . import (  # noqa: F401
    conv,
    elementwise,
    gather,
    layout,
    matmul,
    norm,
    pool,
    quantize,
    reduce,
)

for _optional in (
    "attention",
    "contrib",
    "control_flow",
    "einsum",
    "fft",
    "grid_sample",
    "moe",
    "nms",
    "random",
    "resize",
    "rnn",
    "sequence",
):
    try:
        __import__(f"{__name__}.{_optional}")
    except ModuleNotFoundError as e:
        # Not-yet-implemented module groups are tolerated; real import bugs
        # inside an existing module are not.
        if e.name != f"{__name__}.{_optional}":
            raise
