"""Multi-host initialization (SURVEY.md section 5 'distributed comm backend').

The reference has no multi-process story; on TPU pods, JAX's distributed
runtime provides it. Call `init_distributed()` once per process before any
JAX computation; afterwards `jax.devices()` spans the pod slice and meshes
built by `parallel.make_mesh` shard across hosts (collectives ride ICI
within a slice, DCN across slices — XLA picks per the mesh layout).

On Cloud TPU the arguments auto-detect from the environment; set them
explicitly elsewhere.
"""

from __future__ import annotations

from typing import Optional


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids=None,
) -> None:
    import jax

    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    jax.distributed.initialize(**kwargs)


def process_info():
    import jax

    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }
