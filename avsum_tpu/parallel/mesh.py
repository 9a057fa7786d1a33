"""Mesh construction and sharding policy.

TPU-native replacement for the distribution layer the reference lacks
(SURVEY.md §5.8). One ``jax.sharding.Mesh`` with three named axes:

- ``data``  — data parallelism over videos (batch axis)
- ``seq``   — sequence/context parallelism over the shot/frame axis
              (hour-scale videos, BASELINE config 5)
- ``model`` — reserved tensor-parallel axis for upgraded encoders
              (BASELINE config 4); size 1 for the flagship scorer

All collectives are emitted by XLA from sharding annotations
(``NamedSharding`` + ``jax.jit``) or explicitly inside ``shard_map`` blocks
(ring attention in :mod:`avsum_tpu.parallel.ring`). ICI carries the
intra-slice axes; DCN is handled by the runtime for multi-slice meshes.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS_DATA = "data"
AXIS_SEQ = "seq"
AXIS_MODEL = "model"

AXES = (AXIS_DATA, AXIS_SEQ, AXIS_MODEL)


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Logical mesh shape. ``data * seq * model`` must divide the device count
    (remaining devices are folded into the data axis when ``auto_data``)."""

    data: int = 1
    seq: int = 1
    model: int = 1
    auto_data: bool = True  # grow the data axis to absorb all devices

    @property
    def size(self) -> int:
        return self.data * self.seq * self.model

    def resolved(self, n_devices: int) -> "MeshConfig":
        """Return a config whose total size equals ``n_devices``."""
        fixed = self.seq * self.model
        if n_devices % fixed != 0:
            raise ValueError(
                f"seq*model={fixed} does not divide device count {n_devices}"
            )
        data = self.data
        if self.auto_data:
            data = n_devices // fixed
        if data * fixed != n_devices:
            raise ValueError(
                f"mesh {data}x{self.seq}x{self.model} != {n_devices} devices"
            )
        return dataclasses.replace(self, data=data, auto_data=False)


def build_mesh(
    config: MeshConfig = MeshConfig(),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a 3-axis mesh over ``devices`` (default: all local devices)."""
    if devices is None:
        devices = jax.devices()
    cfg = config.resolved(len(devices))
    dev_array = np.asarray(devices).reshape(cfg.data, cfg.seq, cfg.model)
    return Mesh(dev_array, AXES)


def host_cpu_mesh(n: int = 8, config: Optional[MeshConfig] = None) -> Mesh:
    """Mesh over host CPU devices for distributed-without-a-cluster tests
    (requires ``XLA_FLAGS=--xla_force_host_platform_device_count=N``)."""
    cpus = jax.devices("cpu")[:n]
    cfg = config if config is not None else MeshConfig()
    return build_mesh(cfg, cpus)


# ---------------------------------------------------------------------------
# Sharding policy: where each tensor family lives on the mesh.
# ---------------------------------------------------------------------------


def batch_spec(ndim: int, seq_axis: Optional[int] = 1) -> P:
    """Spec for a [B, S, ...] activation: batch over ``data``, sequence over
    ``seq`` (if a sequence axis exists), features replicated."""
    parts: list = [None] * ndim
    parts[0] = AXIS_DATA
    if seq_axis is not None and ndim > seq_axis:
        parts[seq_axis] = AXIS_SEQ
    return P(*parts)


def seq_sharded_spec(ndim: int, seq_axis: int = 0) -> P:
    """Spec for a single long video [S, ...]: shard the sequence axis only."""
    parts: list = [None] * ndim
    parts[seq_axis] = AXIS_SEQ
    return P(*parts)


def replicated() -> P:
    return P()


def shard_batch(x, mesh: Mesh, seq_axis: Optional[int] = 1):
    """Place a host array onto the mesh with batch/data + seq sharding.

    On a 1-device mesh plain placement is semantically identical and
    avoids a per-call reshard pathology some PJRT backends have with
    committed NamedSharding inputs (see train/steps.py::shard_batch_dict).
    """
    if mesh.size == 1:
        return jax.device_put(x, mesh.devices.flat[0])
    return jax.device_put(x, NamedSharding(mesh, batch_spec(np.ndim(x), seq_axis)))


def shard_replicated(x, mesh: Mesh):
    if mesh.size == 1:
        return jax.device_put(x, mesh.devices.flat[0])
    return jax.device_put(x, NamedSharding(mesh, P()))


def pad_to_multiple(n: int, m: int) -> int:
    """Smallest multiple of ``m`` that is >= ``n`` (static-shape padding)."""
    return int(math.ceil(n / m) * m) if n else m
