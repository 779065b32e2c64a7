"""Device mesh construction."""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
from jax.experimental import mesh_utils
from jax.sharding import Mesh


@dataclasses.dataclass
class MeshConfig:
    """data = batch replication axis, model = tensor-parallel axis."""

    data: int = 1
    model: int = 1

    @property
    def n_devices(self) -> int:
        return self.data * self.model


def make_mesh(config: Optional[MeshConfig] = None, devices=None) -> Mesh:
    """Build a ('data', 'model') mesh.

    Defaults to all visible devices on the model axis (TP-first: for LLM
    decode, TP over ICI is the latency win; DP only helps throughput).
    """
    if devices is None:
        devices = jax.devices()
    if config is None:
        config = MeshConfig(data=1, model=len(devices))
    if config.n_devices > len(devices):
        raise ValueError(
            f"mesh {config} needs {config.n_devices} devices, have {len(devices)}"
        )
    devs = mesh_utils.create_device_mesh(
        (config.data, config.model), devices=devices[: config.n_devices]
    )
    return Mesh(devs, ("data", "model"))
