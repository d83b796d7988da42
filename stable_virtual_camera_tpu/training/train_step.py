"""Diffusion fine-tuning for the multiview UNet.

The reference is inference-only (SURVEY.md §1: no training code); this module
adds the natural training capability for the same model family: discrete-
timestep epsilon-prediction MSE under the model's own DDPM discretization
(sqrt-linear betas, log-SNR-shifted sigmas, EpsScaling preconditioning — the
exact quantities the sampler uses at inference), with optax optimizers and a
single jitted, multi-chip-shardable train step.

Parameterization: with c_skip=1, c_out=-sigma, c_in=1/sqrt(sigma^2+1)
(seva/sampling.py:46-54), the network predicts epsilon; the loss is
||net(x_sigma * c_in, t, cond) - eps||^2 averaged over frames/pixels.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from stable_virtual_camera_tpu.sampling.discretization import DDPMDiscretization


@dataclass
class TrainBatch:
    """One chunk-shaped training example (frame axis = T views).

    latents:   (T, h, w, 4)  clean VAE latents of all views
    concat:    (T, h, w, 7)  input-mask ++ Plücker conditioning
    crossattn: (T, 1, ctx)   CLIP embedding
    dense:     (T, h, w, 6)  Plücker FiLM map
    loss_mask: (T,)          1.0 for frames that contribute to the loss
                             (input views are replace-conditioned at inference
                             and typically excluded)
    """

    latents: Any
    concat: Any
    crossattn: Any
    dense: Any
    loss_mask: Any


jax.tree_util.register_pytree_node(
    TrainBatch,
    lambda b: ((b.latents, b.concat, b.crossattn, b.dense, b.loss_mask), None),
    lambda _, xs: TrainBatch(*xs),
)


def diffusion_loss(
    params,
    batch: TrainBatch,
    key: jax.Array,
    *,
    network_fn: Callable,
    registered_sigmas: jnp.ndarray,  # (1000,) ascending
    num_frames: int,
) -> jnp.ndarray:
    """Epsilon-prediction MSE at a shared random discrete timestep.

    One timestep per chunk (all frames share the noise level, exactly as the
    sampler denoises all T frames at one sigma per step)."""
    t_key, eps_key = jax.random.split(key)
    t_idx = jax.random.randint(t_key, (), 0, registered_sigmas.shape[0])
    sigma = registered_sigmas[t_idx]

    x0 = batch.latents
    eps = jax.random.normal(eps_key, x0.shape, x0.dtype)
    x_sigma = x0 + sigma * eps
    c_in = jax.lax.rsqrt(sigma**2 + 1.0)

    t_vec = jnp.full((num_frames,), t_idx, jnp.int32)
    pred_eps = network_fn(
        params, x_sigma * c_in, batch.concat, t_vec, batch.crossattn, batch.dense,
        num_frames,
    ).astype(jnp.float32)

    per_frame = jnp.mean((pred_eps - eps.astype(jnp.float32)) ** 2, axis=(1, 2, 3))
    mask = batch.loss_mask.astype(jnp.float32)
    return jnp.sum(per_frame * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def make_network_fn(unet):
    """params-first network callable matching the sampler's convention."""

    from stable_virtual_camera_tpu.models.unet import assemble_network_input

    def network_fn(params, x, concat, t_vec, crossattn, dense, num_frames):
        return unet.apply(
            {"params": params},
            assemble_network_input(x, concat),
            t_vec,
            crossattn,
            dense,
            num_frames=num_frames,
        )

    return network_fn


def ema_update(ema_params, params, decay: float):
    """Shadow-parameter EMA: ema <- decay*ema + (1-decay)*params, computed in
    fp32 and cast back (bf16 shadows would stop absorbing ~1e-3 updates).
    Standard practice for diffusion models — samples come from the EMA
    weights, not the raw optimizer iterates; the reference's released
    checkpoint is itself such an EMA snapshot (inference-only repo)."""
    decay = jnp.float32(decay)

    def one(e, p):
        e32 = e.astype(jnp.float32)
        return (e32 + (p.astype(jnp.float32) - e32) * (1.0 - decay)).astype(e.dtype)

    return jax.tree.map(one, ema_params, params)


def _make_loss_fn(unet, num_frames, discretization, remat):
    discretization = discretization or DDPMDiscretization()
    registered = jnp.asarray(discretization.registered_sigmas())
    network_fn = make_network_fn(unet)
    if remat:
        network_fn = jax.checkpoint(network_fn, static_argnums=(6,))
    return partial(
        diffusion_loss,
        network_fn=network_fn,
        registered_sigmas=registered,
        num_frames=num_frames,
    )


def make_train_step(
    unet,
    optimizer: optax.GradientTransformation,
    num_frames: int,
    discretization: DDPMDiscretization | None = None,
    remat: bool = False,
    ema_decay: float | None = None,
):
    """Returns jitted `step(params, opt_state, batch, key) ->
    (params, opt_state, loss)` with params/opt_state donated — or, with
    `ema_decay` set, `step(params, opt_state, ema_params, batch, key) ->
    (params, opt_state, ema_params, loss)` maintaining shadow-EMA weights
    inside the same jitted program (all three states donated).

    `remat=True` wraps the network forward in `jax.checkpoint`: the backward
    pass recomputes activations instead of holding them, trading ~1 extra
    forward of FLOPs for the activation footprint — what makes the 1.3B
    model's T=21 backward fit one chip's HBM. Numerics are identical
    (same ops, same order)."""
    loss_fn = _make_loss_fn(unet, num_frames, discretization, remat)

    if ema_decay is None:

        @partial(jax.jit, donate_argnums=(0, 1))
        def step(params, opt_state, batch: TrainBatch, key):
            loss, grads = jax.value_and_grad(loss_fn)(params, batch, key)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        return step

    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def ema_step(params, opt_state, ema_params, batch: TrainBatch, key):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, key)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        ema_params = ema_update(ema_params, params, ema_decay)
        return params, opt_state, ema_params, loss

    return ema_step


def make_train_step_ema(
    unet,
    optimizer: optax.GradientTransformation,
    num_frames: int,
    ema_decay: float = 0.9999,
    discretization: DDPMDiscretization | None = None,
    remat: bool = False,
):
    """Named convenience for make_train_step(..., ema_decay=...)."""
    return make_train_step(
        unet, optimizer, num_frames,
        discretization=discretization, remat=remat, ema_decay=ema_decay,
    )


def make_sharded_train_step(
    unet,
    optimizer: optax.GradientTransformation,
    num_frames: int,
    mesh,
    discretization: DDPMDiscretization | None = None,
    remat: bool = False,
    ema_decay: float | None = None,
):
    """Training step jitted over a ("data","view") mesh: the frame axis of the
    batch shards over 'view' (same layout as sharded sampling), params and
    optimizer state replicated; GSPMD inserts the gradient all-reduces.
    With `ema_decay`, the step carries replicated EMA shadow params exactly
    like make_train_step(ema_decay=...)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    loss_fn = _make_loss_fn(unet, num_frames, discretization, remat)

    repl = NamedSharding(mesh, P())
    vs = lambda rank: NamedSharding(mesh, P("view", *([None] * (rank - 1))))  # noqa: E731
    batch_sh = TrainBatch(
        latents=vs(4), concat=vs(4), crossattn=vs(3), dense=vs(4), loss_mask=vs(1)
    )

    if ema_decay is None:

        def _step(params, opt_state, batch, key):
            loss, grads = jax.value_and_grad(loss_fn)(params, batch, key)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        return jax.jit(
            _step,
            in_shardings=(None, None, batch_sh, repl),
            out_shardings=(None, None, repl),
            donate_argnums=(0, 1),
        )

    def _ema_step(params, opt_state, ema_params, batch, key):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, key)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        ema_params = ema_update(ema_params, params, ema_decay)
        return params, opt_state, ema_params, loss

    return jax.jit(
        _ema_step,
        in_shardings=(None, None, None, batch_sh, repl),
        out_shardings=(None, None, None, repl),
        donate_argnums=(0, 1, 2),
    )


def make_fsdp_train_step(
    unet,
    optimizer: optax.GradientTransformation,
    num_frames: int,
    mesh,
    params_template,
    shard_axis: str = "data",
    discretization: DDPMDiscretization | None = None,
    remat: bool = False,
    ema_decay: float | None = None,
    min_size: int = 2,
):
    """ZeRO-3/FSDP training step: every parameter, optimizer-state and EMA
    leaf is sharded leaf-wise over `shard_axis` (largest divisible dim,
    parallel/param_sharding.py) instead of replicated — XLA all-gathers each
    weight just before use and reduce-scatters its gradient. Cuts the
    per-chip weight+AdamW footprint ~axis-fold (the 1.3B model's fp32 AdamW
    state alone is ~16 GB). The batch's frame axis still shards over 'view'
    when the mesh has one.

    Returns `(step, init)`: `init(params)` device_puts the params into their
    sharded layout and builds the matching sharded optimizer state;
    `step` has the make_train_step signature (plus EMA with `ema_decay`).

    `init` takes OWNERSHIP of its input: leaves whose layout is unchanged
    (replicated small leaves) may alias the input buffers, and the step
    donates its state — keep using the returned tree only, or pass a copy
    (`jax.tree.map(jnp.copy, params)`) if the original must stay alive.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from stable_virtual_camera_tpu.parallel.param_sharding import (
        tree_shardings,
    )

    loss_fn = _make_loss_fn(unet, num_frames, discretization, remat)
    param_sh = tree_shardings(params_template, mesh, shard_axis, min_size)
    opt_sh = tree_shardings(
        jax.eval_shape(optimizer.init, params_template), mesh, shard_axis,
        min_size,
    )
    repl = NamedSharding(mesh, P())
    vs = lambda rank: NamedSharding(mesh, P("view", *([None] * (rank - 1))))  # noqa: E731
    batch_sh = TrainBatch(
        latents=vs(4), concat=vs(4), crossattn=vs(3), dense=vs(4), loss_mask=vs(1)
    )

    def init(params):
        params = jax.device_put(params, param_sh)
        opt_state = jax.jit(optimizer.init, out_shardings=opt_sh)(params)
        return params, opt_state

    if ema_decay is None:

        def _step(params, opt_state, batch, key):
            loss, grads = jax.value_and_grad(loss_fn)(params, batch, key)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        step = jax.jit(
            _step,
            in_shardings=(param_sh, opt_sh, batch_sh, repl),
            out_shardings=(param_sh, opt_sh, repl),
            donate_argnums=(0, 1),
        )
        return step, init

    def _ema_step(params, opt_state, ema_params, batch, key):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, key)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        ema_params = ema_update(ema_params, params, ema_decay)
        return params, opt_state, ema_params, loss

    step = jax.jit(
        _ema_step,
        in_shardings=(param_sh, opt_sh, param_sh, batch_sh, repl),
        out_shardings=(param_sh, opt_sh, param_sh, repl),
        donate_argnums=(0, 1, 2),
    )
    return step, init


def synthetic_batch(spec, T: int, h: int, w: int, key) -> TrainBatch:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    mask = np.zeros((T,), np.float32)
    mask[1:] = 1.0  # frame 0 as "input view"
    concat = jax.random.normal(k2, (T, h, w, 7)) * 0.1
    return TrainBatch(
        latents=jax.random.normal(k1, (T, h, w, 4)),
        concat=concat,
        crossattn=jax.random.normal(k3, (T, 1, spec.context_dim)) * 0.1,
        dense=concat[..., 1:],
        loss_mask=jnp.asarray(mask),
    )
