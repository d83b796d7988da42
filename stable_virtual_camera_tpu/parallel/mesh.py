"""Device mesh construction for multi-chip sampling.

The reference is strictly single-GPU (SURVEY.md §2.8: no distributed backend
at all); multi-chip scaling here is a new, TPU-native capability:

  axes: ("data", "view")
    * "view" shards the frame/view axis of a chunk across chips over ICI —
      per-frame convs and per-frame attention stay local, the joint
      (T*h*w)-token attention and per-location time-mix gather over ICI
      (XLA GSPMD inserts the collectives),
    * "data" fans independent chunks/scenes out (data parallel, DCN-safe).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: int = 1, n_view: int | None = None, devices=None
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_view is None:
        n_view = len(devices) // n_data
    assert n_data * n_view <= len(devices), (
        f"mesh {n_data}x{n_view} needs more than {len(devices)} devices"
    )
    grid = np.array(devices[: n_data * n_view]).reshape(n_data, n_view)
    return Mesh(grid, ("data", "view"))


def make_mesh_tp(
    n_data: int = 1, n_view: int = 1, n_model: int | None = None, devices=None
) -> Mesh:
    """3-D mesh ("data", "view", "model"): chunks x frames x weight shards.
    The 'model' axis carries Megatron-style tensor parallelism
    (parallel/param_sharding.py + sharding.make_tensor_parallel_sampler) and
    FSDP weight sharding; `n_model=None` fills the remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_model is None:
        n_model = len(devices) // (n_data * n_view)
    assert n_data * n_view * n_model <= len(devices), (
        f"mesh {n_data}x{n_view}x{n_model} needs more than "
        f"{len(devices)} devices"
    )
    grid = np.array(devices[: n_data * n_view * n_model]).reshape(
        n_data, n_view, n_model
    )
    return Mesh(grid, ("data", "view", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def view_sharded(mesh: Mesh, rank: int = 4) -> NamedSharding:
    """Shard leading (frame) axis over 'view'."""
    return NamedSharding(mesh, P("view", *([None] * (rank - 1))))
