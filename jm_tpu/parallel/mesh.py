"""Device mesh / sharding helpers (SURVEY.md §2.5 parallelism axes).

Axes:
  dp — data parallel over frames/GOPs (closed-GOP independence;
       reference dependency: DPB reset at IDR, mbuffer.c:1727)
  sp — spatial parallel over MB rows within a frame (wavefront halo
       dependency cone, mb_access.c neighbors)

The production sp axis (MB-row sharding of the device P pipeline with
reference-plane bands + explicit halo-exchange collectives) lives in
parallel/sp_pipeline.py; this module keeps the generic mesh helpers.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_dp: int, n_sp: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if len(devices) < n_dp * n_sp:
        raise ValueError(f"need {n_dp * n_sp} devices, have {len(devices)}")
    arr = np.asarray(devices[: n_dp * n_sp]).reshape(n_dp, n_sp)
    return Mesh(arr, axis_names=("dp", "sp"))


def shard_mb_batch(mesh: Mesh):
    """Sharding for (F, N, 16, 16) frame-batched MB tensors: frames over
    dp, MB batch over sp."""
    return NamedSharding(mesh, P("dp", "sp"))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())
