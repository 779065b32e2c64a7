"""Worker process for the multi-process jax.distributed test.

Each worker owns 2 virtual CPU devices; N workers form one global mesh of
2N devices. Exercises: coordinator wiring (rten_tpu.parallel.distributed),
cross-process collectives (global sum), and a sharded Model.run through the
engine with a batch-sharded global input.
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=2 "
    + os.environ.get("XLA_FLAGS", "")
)

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    pid = int(sys.argv[1])
    nprocs = int(sys.argv[2])
    port = sys.argv[3]

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from rten_tpu.parallel.distributed import init_distributed, process_info

    init_distributed(f"localhost:{port}", nprocs, pid)

    info = process_info()
    assert info["process_count"] == nprocs, info
    assert info["process_index"] == pid, info
    assert info["local_devices"] == 2, info
    assert info["global_devices"] == 2 * nprocs, info

    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.array(jax.devices()), ("data",))
    B_local = 2  # one row per local device
    D, H = 8, 4

    # Global batch-sharded input: rows globally ordered by process.
    x_local = np.stack(
        [np.full((D,), 10 * pid + i, np.float32) for i in range(B_local)]
    )
    garr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data", None)), x_local
    )

    # 1. Cross-process collective: global sum must see every process's rows.
    total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(garr)
    want_total = sum(
        (10 * p + i) * D for p in range(nprocs) for i in range(B_local)
    )
    # Replicated output: every process reads its local shard.
    got_total = float(np.asarray(total.addressable_shards[0].data))
    assert got_total == want_total, (got_total, want_total)

    # 2. Sharded forward through the engine: every process builds the same
    #    model; the executor jit runs over the global mesh.
    from rten_tpu.dtypes import DataType
    from rten_tpu.ir.graph import Graph
    from rten_tpu.model import Model, ModelOptions

    rng = np.random.default_rng(0)  # same weights in every process
    w = rng.standard_normal((D, H)).astype(np.float32)
    g = Graph()
    xid = g.add_value("x", DataType.Float, ("batch", D))
    wid = g.add_constant("w", w)
    yid = g.add_value("y", DataType.Float, ("batch", H))
    g.add_op("MatMul", [xid, wid], [yid])
    g.input_ids, g.output_ids = [xid], [yid]
    m = Model(g, ModelOptions(optimize=False))

    out = m.run({"x": garr})[0]
    full = np.asarray(multihost_utils.process_allgather(out, tiled=True))
    assert full.shape == (nprocs * B_local, H), full.shape
    x_global = np.stack(
        [np.full((D,), 10 * p + i, np.float32)
         for p in range(nprocs) for i in range(B_local)]
    )
    np.testing.assert_allclose(full, x_global @ w, rtol=1e-5)

    print(f"WORKER_{pid}_OK", flush=True)


if __name__ == "__main__":
    main()
