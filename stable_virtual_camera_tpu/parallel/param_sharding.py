"""Parameter sharding rules: FSDP (weight/optimizer-state sharding) and
tensor parallelism over a 'model' mesh axis.

The GSPMD recipe (How to Scale Your Model): pick a mesh, annotate the
shardings of the inputs — here the parameter and optimizer-state trees —
and let XLA insert the collectives. Sharding a weight over 'data' gives
ZeRO-3/FSDP semantics (XLA all-gathers the leaf just before use and
reduce-scatters its gradient); sharding over a dedicated 'model' axis gives
Megatron-style tensor parallelism of every matmul touching that weight.
No model code changes: the same flax UNet runs under any of these layouts.

What this buys at flagship scale: the 1.3B UNet's AdamW state is ~3 fp32
trees ≈ 16 GB — FSDP over 8 chips cuts the per-chip optimizer+weight
footprint ~8x, which is the difference between fitting and not fitting
training on one v5e host.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def partition_spec(shape, n: int, axis_name: str, min_size: int = 2) -> P:
    """Shard the largest dimension divisible by `n` (ties -> later dim, i.e.
    output channels for conv/dense kernels); replicate when nothing fits.
    `min_size` shards per device keeps tiny leaves (norm scales, biases)
    replicated instead of fragmented."""
    best, best_size = None, 0
    for d, s in enumerate(shape):
        if s % n == 0 and s // n >= min_size and s >= best_size:
            best, best_size = d, s
    if best is None:
        return P()
    return P(*(axis_name if i == best else None for i in range(len(shape))))


def tree_partition_specs(tree, mesh: Mesh, axis_name: str, min_size: int = 2):
    """PartitionSpec pytree for an arbitrary parameter / optimizer-state
    tree (works on concrete arrays and on jax.eval_shape structs)."""
    n = mesh.shape[axis_name]

    def spec(leaf):
        shape = np.shape(leaf) if not hasattr(leaf, "shape") else leaf.shape
        return partition_spec(tuple(shape), n, axis_name, min_size)

    return jax.tree.map(spec, tree)


def tree_shardings(tree, mesh: Mesh, axis_name: str, min_size: int = 2):
    """NamedSharding pytree (device_put-able / jit in_shardings-able)."""
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s),
        tree_partition_specs(tree, mesh, axis_name, min_size),
    )


def shard_tree(tree, mesh: Mesh, axis_name: str, min_size: int = 2):
    """device_put the tree with its derived shardings (host -> sharded HBM)."""
    return jax.device_put(tree, tree_shardings(tree, mesh, axis_name, min_size))
