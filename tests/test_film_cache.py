"""Per-chunk FiLM cache: the resize+dense_proj of the Plücker map is a
per-sigma-step constant (it depends only on chunk conditioning), so the
sampler hoists it out of the 50-step scan (sampler.UNetDenoiser._bound_network
/ SevaUNet film_only walk). These tests pin that the hoisted path is
numerically identical to the inline recompute the reference performs every
step (reference seva/modules/layers.py:125-131 inside every denoiser call).
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stable_virtual_camera_tpu.config import SevaSpec
from stable_virtual_camera_tpu.models.unet import SevaUNet
from stable_virtual_camera_tpu.sampling.discretization import DDPMDiscretization
from stable_virtual_camera_tpu.sampling.sampler import (
    ChunkConditioning,
    UNetDenoiser,
    make_sampling_plan,
)


def _jitted_fns(unet, T):
    """Jitted forward / film-walk closures: un-jitted flax apply runs
    op-by-op on this 1-core CPU (minutes); jit + the persistent compile
    cache makes these seconds."""
    fwd = jax.jit(
        lambda p, x, t, c, d: unet.apply(p, x, t, c, d, num_frames=T)
    )
    fwd_film = jax.jit(
        lambda p, x, t, c, d, film: unet.apply(
            p, x, t, c, d, num_frames=T, film=film
        )
    )
    walk = jax.jit(
        lambda p, d, _n: unet.apply(
            p, None, None, None, d, num_frames=_n, film_only=True
        ),
        static_argnums=2,
    )
    return fwd, fwd_film, walk


@pytest.fixture(scope="module")
def tiny():
    spec = SevaSpec.tiny()
    T, h, w = spec.num_frames, 16, 16
    unet = SevaUNet(spec)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2 * T, h, w, spec.in_channels)), jnp.float32)
    t_idx = jnp.full((2 * T,), 7, jnp.int32)
    ctx = jnp.asarray(rng.normal(size=(2 * T, 1, spec.context_dim)), jnp.float32)
    plucker = rng.normal(size=(T, h, w, 6)).astype(np.float32)
    dense = jnp.asarray(np.concatenate([plucker, plucker], 0))
    params = jax.jit(
        lambda k: unet.init(k, x, t_idx, ctx, dense, num_frames=T)
    )(jax.random.PRNGKey(0))
    return spec, unet, params, (x, t_idx, ctx, dense, T), _jitted_fns(unet, T)


def test_film_only_walk_covers_every_resblock(tiny):
    spec, unet, params, (x, t_idx, ctx, dense, T), (_, _, walk) = tiny
    films = walk(params, dense[:T], T)
    res_names = {
        n
        for n, sub in params["params"].items()
        if isinstance(sub, dict) and "dense_proj" in sub
    }
    assert set(films) == res_names and res_names
    for name, f in films.items():
        # 2*C_in of that block, at that block's resolution, batch T (half)
        assert f.shape[0] == T and f.shape[-1] % 2 == 0, name


def test_film_cached_forward_matches_inline(tiny):
    spec, unet, params, (x, t_idx, ctx, dense, T), (fwd, fwd_film, walk) = tiny
    ref = fwd(params, x, t_idx, ctx, dense)
    films = walk(params, dense[:T], T)
    out = fwd_film(params, x, t_idx, ctx, dense, films)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=1e-6, rtol=1e-6
    )


def test_film_full_batch_cache_matches_too(tiny):
    # a (2T, ...) cache (no CFG-half sharing) must also reproduce the inline
    # path — the broadcast apply is shape-driven
    spec, unet, params, (x, t_idx, ctx, dense, T), (fwd, fwd_film, walk) = tiny
    ref = fwd(params, x, t_idx, ctx, dense)
    films = walk(params, dense, 2 * T)
    out = fwd_film(params, x, t_idx, ctx, dense, films)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=1e-6, rtol=1e-6
    )


def _sample_cond(spec, T, h, w, rng):
    plucker = rng.normal(size=(T, h, w, 6)).astype(np.float32)
    crossattn = rng.normal(size=(T, 1, spec.context_dim)).astype(np.float32)
    mask = np.zeros((T, h, w, 1), np.float32)
    mask[:2] = 1.0
    replace = rng.normal(size=(T, h, w, 5)).astype(np.float32) * mask
    cat = lambda a, b: jnp.asarray(np.concatenate([a, b], 0))  # noqa: E731
    return ChunkConditioning(
        crossattn=cat(np.zeros_like(crossattn), crossattn),
        concat=cat(
            np.concatenate([np.zeros_like(mask), plucker], -1),
            np.concatenate([mask, plucker], -1),
        ),
        dense=cat(plucker, plucker),  # ChunkConditioning contract: SAME halves
        replace=cat(np.zeros_like(replace), replace),
        scale=jnp.full((T,), 2.0, jnp.float32),
    )


def test_denoiser_sample_film_on_equals_off(tiny, monkeypatch):
    spec, unet, params, (_, _, _, _, T), _ = tiny
    h = w = 16
    rng = np.random.default_rng(1)
    cond = _sample_cond(spec, T, h, w, rng)
    plan = make_sampling_plan(DDPMDiscretization(), 3, s_noise=0.0)
    noise = jnp.asarray(rng.normal(size=(T, h, w, 4)).astype(np.float32))
    key = jax.random.PRNGKey(3)

    monkeypatch.setenv("SVC_FILM_CACHE", "0")
    d_off = UNetDenoiser(unet, params["params"])
    x_off = np.asarray(d_off.sample(noise, plan, cond, key))

    monkeypatch.setenv("SVC_FILM_CACHE", "1")
    d_on = UNetDenoiser(unet, params["params"])
    x_on = np.asarray(d_on.sample(noise, plan, cond, key))

    assert np.isfinite(x_on).all()
    np.testing.assert_allclose(x_on, x_off, atol=1e-5, rtol=1e-5)


def test_film_cache_alt_topology():
    """A second architecture (different depth/mults/attention resolutions,
    3 levels -> two Down/Upsamples) pins the film_only walk's shape
    stand-ins — Downsample ceil-div, Upsample 2x, skip concat — against the
    real walk beyond the flagship topology."""
    spec = SevaSpec(
        model_channels=32,
        num_frames=2,
        num_res_blocks=1,
        attention_resolutions=(2, 1),
        channel_mult=(1, 2, 2),
        num_head_channels=16,
        transformer_depth=(1, 2, 1),
        context_dim=32,
        unflatten_names=("middle_ds4", "output_ds2"),
    )
    T, h, w = spec.num_frames, 16, 16
    unet = SevaUNet(spec)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2 * T, h, w, spec.in_channels)), jnp.float32)
    t_idx = jnp.full((2 * T,), 5, jnp.int32)
    ctx = jnp.asarray(rng.normal(size=(2 * T, 1, spec.context_dim)), jnp.float32)
    plucker = rng.normal(size=(T, h, w, 6)).astype(np.float32)
    dense = jnp.asarray(np.concatenate([plucker, plucker], 0))
    params = jax.jit(
        lambda k: unet.init(k, x, t_idx, ctx, dense, num_frames=T)
    )(jax.random.PRNGKey(1))

    fwd, fwd_film, walk = _jitted_fns(unet, T)
    ref = fwd(params, x, t_idx, ctx, dense)
    films = walk(params, dense[:T], T)
    out = fwd_film(params, x, t_idx, ctx, dense, films)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=1e-6, rtol=1e-6
    )


def test_film_composes_with_w8a8(tiny, monkeypatch):
    # quantized compute convs + exact FiLM cache: same contract, same tree.
    # NB: fresh jitted closures — w8a8_enabled() is read at trace time, so
    # the fixture's cached bf16 traces must not be reused here.
    spec, unet, params, (x, t_idx, ctx, dense, T), _ = tiny
    monkeypatch.setenv("SVC_QUANT", "w8a8")
    fwd, fwd_film, walk = _jitted_fns(unet, T)
    ref = fwd(params, x, t_idx, ctx, dense)
    films = walk(params, dense[:T], T)
    out = fwd_film(params, x, t_idx, ctx, dense, films)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5
    )
