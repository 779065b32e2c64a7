"""Multi-chip execution: device meshes + sharding plans.

The reference's only parallelism is a Rayon threadpool on one machine
(rten src/threading.rs; SURVEY.md section 2.6). The TPU-native replacement:
a `jax.sharding.Mesh` over ('data', 'model') axes, weights/KV-cache
annotated with NamedSharding, XLA GSPMD inserting the collectives
(all-gather for column-parallel outputs, reduce-scatter/psum for
row-parallel partials) over ICI.
"""

from .mesh import MeshConfig, make_mesh  # noqa: F401
from .pipeline import PipelineRunner, plan_pipeline  # noqa: F401
from .sharding import (  # noqa: F401
    GPT2_SHARDING_RULES,
    fsdp_weight_shardings,
    shard_constants,
    sharding_for_name,
    zero_init_state,
)
