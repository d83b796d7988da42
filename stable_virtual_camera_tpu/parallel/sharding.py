"""View-axis sharded sampling step.

Strategy ("pick a mesh, annotate shardings, let XLA insert collectives"):
params replicated, every per-frame tensor sharded on axis 0 over 'view'.
The UNet's per-frame convs and per-frame spatial attention then run fully
locally; the joint multiview attention (reshape to (b, T*h*w, c)) and the
time-mix (reshape to (b*s, T, c)) force XLA to all-gather the frame axis over
ICI exactly where the reference's single-GPU model needed all-frame attention.

This gives the large-T single-forward regime (T=80-96 semi-dense, reference
docs/CLI_USAGE.md:80-81) headroom beyond one chip's HBM.
"""

from __future__ import annotations

from functools import partial

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from stable_virtual_camera_tpu.sampling.sampler import (
    ChunkConditioning,
    euler_edm_sample,
    euler_edm_step,
)


def _cond_shardings(mesh: Mesh) -> ChunkConditioning:
    vs = lambda rank: NamedSharding(mesh, P("view", *([None] * (rank - 1))))  # noqa: E731
    return ChunkConditioning(
        crossattn=vs(3),
        concat=vs(4),
        dense=vs(4),
        replace=vs(4),
        scale=vs(1),
    )


def make_sharded_step(network_fn, mesh: Mesh, num_frames: int):
    """Jitted single Euler step with view-axis shardings annotated.

    Constraint: 2*num_frames and num_frames must be divisible by the 'view'
    axis size (frames distribute evenly).
    """
    n_view = mesh.shape["view"]
    assert num_frames % n_view == 0, (
        f"num_frames={num_frames} must divide over view axis {n_view}"
    )
    x_sh = NamedSharding(mesh, P("view", None, None, None))
    scalar = NamedSharding(mesh, P())
    return jax.jit(
        partial(euler_edm_step, network_fn, num_frames=num_frames),
        in_shardings=(x_sh, (scalar,) * 5, _cond_shardings(mesh), scalar),
        out_shardings=x_sh,
    )


def make_sharded_sampler(network_fn, mesh: Mesh, num_frames: int):
    """Jitted full lax.scan sampling loop with view-axis shardings."""
    n_view = mesh.shape["view"]
    assert num_frames % n_view == 0
    x_sh = NamedSharding(mesh, P("view", None, None, None))
    scalar = NamedSharding(mesh, P())
    plan_sh = {
        k: scalar
        for k in (
            "sigma_hat_raw",
            "sigma_hat_quant",
            "t_indices",
            "sigma_next",
            "noise_coeff",
            "init_scale",
        )
    }
    return jax.jit(
        partial(euler_edm_sample, network_fn, num_frames=num_frames),
        in_shardings=(x_sh, plan_sh, _cond_shardings(mesh), scalar),
        out_shardings=x_sh,
    )


def make_batched_sampler(network_fn, num_frames: int):
    """vmap the whole sampling loop over a leading chunk axis — independent
    chunks (e.g. every second-pass chunk, whose conditioning depends only on
    fixed anchors) denoise concurrently in one program."""
    import jax.numpy as jnp  # noqa: F401

    def run(noises, plan_arrays, conds, keys):
        # noises: (N, T, h, w, 4); conds: ChunkConditioning with leading N;
        # keys: (N, 2) uint32
        return jax.vmap(
            lambda n, c, k: euler_edm_sample(
                network_fn, n, plan_arrays, c, k, num_frames=num_frames
            ),
            in_axes=(0, 0, 0),
        )(noises, conds, keys)

    return jax.jit(run)


def make_data_parallel_sampler(network_fn, mesh: Mesh, num_frames: int):
    """Batched sampler with the chunk axis sharded over the mesh's 'data'
    axis — each device group denoises different chunks (the reference's only
    scaling story was sequential chunking; this is the TPU fan-out)."""
    n_data = mesh.shape["data"]

    def chunk_sh(rank: int) -> NamedSharding:
        return NamedSharding(mesh, P("data", *([None] * (rank - 1))))

    cond_sh = ChunkConditioning(
        crossattn=chunk_sh(4),
        concat=chunk_sh(5),
        dense=chunk_sh(5),
        replace=chunk_sh(5),
        scale=chunk_sh(2),
    )
    scalar = NamedSharding(mesh, P())
    plan_sh = {
        k: scalar
        for k in (
            "sigma_hat_raw", "sigma_hat_quant", "t_indices", "sigma_next",
            "noise_coeff", "init_scale",
        )
    }

    def run(noises, plan_arrays, conds, keys):
        assert noises.shape[0] % n_data == 0, (
            f"chunk count {noises.shape[0]} must divide data axis {n_data}"
        )
        return jax.vmap(
            lambda n, c, k: euler_edm_sample(
                network_fn, n, plan_arrays, c, k, num_frames=num_frames
            ),
            in_axes=(0, 0, 0),
        )(noises, conds, keys)

    return jax.jit(
        run,
        in_shardings=(chunk_sh(5), plan_sh, cond_sh, chunk_sh(2)),
        out_shardings=chunk_sh(5),
    )


def make_tensor_parallel_sampler(
    apply_fn,
    params_template,
    mesh: Mesh,
    num_frames: int,
    model_axis: str = "model",
    min_size: int = 2,
):
    """Full sampling loop with Megatron-style TENSOR-PARALLEL parameters.

    `apply_fn(params, x, concat, t_vec, crossattn, dense, num_frames)` is the
    params-first network; every weight leaf is sharded over `model_axis`
    (largest divisible dimension — output channels for dense/conv kernels,
    parallel/param_sharding.py) and GSPMD partitions each matmul/conv over
    the axis, inserting the all-reduces. Composes with the 'view' frame axis
    when the mesh has one that divides num_frames: frames shard over 'view',
    weights over 'model', the 2-D equivalent of Megatron TP x sequence
    parallelism. Params that do not fit the axis stay replicated.
    """
    from functools import partial as _partial

    from stable_virtual_camera_tpu.parallel.param_sharding import (
        tree_shardings,
    )

    param_sh = tree_shardings(params_template, mesh, model_axis, min_size)
    scalar = NamedSharding(mesh, P())
    n_view = mesh.shape.get("view", 1)
    if n_view > 1 and num_frames % n_view == 0:
        x_sh = NamedSharding(mesh, P("view", None, None, None))
        cond_sh = _cond_shardings(mesh)
    else:
        x_sh = scalar
        cond_sh = ChunkConditioning(*((scalar,) * 5))
    plan_sh = {
        k: scalar
        for k in (
            "sigma_hat_raw", "sigma_hat_quant", "t_indices", "sigma_next",
            "noise_coeff", "init_scale",
        )
    }

    def run(params, noise, plan_arrays, cond, key):
        return euler_edm_sample(
            _partial(apply_fn, params), noise, plan_arrays, cond, key,
            num_frames=num_frames,
        )

    return jax.jit(
        run,
        in_shardings=(param_sh, x_sh, plan_sh, cond_sh, scalar),
        out_shardings=x_sh,
    )
