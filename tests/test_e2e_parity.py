"""End-to-end sampling parity: the reference's EulerEDMSampler +
DiscreteDenoiser + CFG running the REAL (tiny random) torch UNet vs our jitted
scan running the converted weights — same init noise, same conditioning,
zero injected noise. This exercises the full denoiser wiring (preconditioning,
replace-conditioning, CFG doubling, guidance, Euler updates) through the
actual network rather than a mock."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from stable_virtual_camera_tpu.config import SevaSpec
from stable_virtual_camera_tpu.models.convert import convert_seva_state_dict
from stable_virtual_camera_tpu.models.unet import SevaUNet, assemble_network_input
from stable_virtual_camera_tpu.sampling import guidance
from stable_virtual_camera_tpu.sampling.discretization import DDPMDiscretization
from stable_virtual_camera_tpu.sampling.sampler import (
    ChunkConditioning,
    euler_edm_sample,
    make_sampling_plan,
    plan_to_device,
)

from conftest import random_c2ws


@pytest.mark.slow
def test_full_sampling_matches_reference(ref, rng):
    import contextlib

    import seva.modules.transformer as ref_transformer

    @contextlib.contextmanager
    def _null(*args, **kwargs):
        yield

    orig_sdpa = ref_transformer.sdpa_kernel
    ref_transformer.sdpa_kernel = _null
    try:
        _run(ref, rng)
    finally:
        ref_transformer.sdpa_kernel = orig_sdpa


def _run(ref, rng):
    spec = SevaSpec(
        model_channels=32, num_frames=3, num_head_channels=16, context_dim=64
    )
    T, H, W = spec.num_frames, 32, 32  # latent-resolution grid
    num_steps = 4
    cfg, cfg_min = 2.0, 1.2

    torch.manual_seed(0)
    model = ref.model.Seva(
        ref.model.SevaParams(
            model_channels=32, num_frames=3, num_head_channels=16, context_dim=64
        )
    ).eval()
    wrapper = ref.model.SGMWrapper(model)

    c2w = random_c2ws(rng, T).astype(np.float32)
    K = np.repeat(np.eye(3, dtype=np.float32)[None], T, axis=0)
    input_mask = np.zeros(T, dtype=bool)
    input_mask[0] = True

    noise = rng.normal(size=(T, 4, H, W)).astype(np.float32)
    crossattn_c = rng.normal(size=(T, 1, spec.context_dim)).astype(np.float32)
    plucker = rng.normal(size=(T, 6, H, W)).astype(np.float32)
    latents = (
        rng.normal(size=(T, 4, H, W)).astype(np.float32)
        * input_mask[:, None, None, None]
    )
    concat_c = np.concatenate(
        [np.broadcast_to(input_mask[:, None, None, None], (T, 1, H, W)), plucker], 1
    ).astype(np.float32)
    concat_u = np.concatenate([np.zeros((T, 1, H, W), np.float32), plucker], 1)
    replace_c = np.concatenate(
        [latents, np.broadcast_to(input_mask[:, None, None, None], (T, 1, H, W))], 1
    ).astype(np.float32)

    # ---- reference path (torch) ----
    disc_t = ref.sampling.DDPMDiscretization()
    denoiser_t = ref.sampling.DiscreteDenoiser(discretization=disc_t, device="cpu")
    guider = ref.sampling.MultiviewCFG(cfg_min=cfg_min)
    sampler_t = ref.sampling.EulerEDMSampler(
        discretization=disc_t, guider=guider, num_steps=num_steps,
        s_churn=0.0, s_tmin=0.0, s_tmax=999.0, s_noise=0.0,
        device="cpu", verbose=False,
    )
    c = {
        "crossattn": torch.from_numpy(crossattn_c),
        "concat": torch.from_numpy(concat_c),
        "dense_vector": torch.from_numpy(plucker),
        "replace": torch.from_numpy(replace_c),
    }
    uc = {
        "crossattn": torch.zeros_like(c["crossattn"]),
        "concat": torch.from_numpy(concat_u),
        "dense_vector": c["dense_vector"],
        "replace": torch.zeros_like(c["replace"]),
    }
    with torch.no_grad():
        x_t = sampler_t(
            lambda inp, sigma, cond: denoiser_t(
                wrapper, inp, sigma, cond, num_frames=T
            ),
            torch.from_numpy(noise.copy()),
            scale=cfg,
            cond=c,
            uc=uc,
            verbose=False,
            c2w=torch.from_numpy(c2w),
            K=torch.from_numpy(K),
            input_frame_mask=torch.from_numpy(input_mask),
        ).numpy()

    # ---- ours (converted weights, jitted scan) ----
    params = convert_seva_state_dict(model.state_dict(), spec)
    unet = SevaUNet(spec, dtype=jnp.float32, param_dtype=jnp.float32)

    def network_fn(x, concat, t_vec, crossattn, dense, num_frames):
        return unet.apply(
            {"params": params},
            assemble_network_input(x, concat),
            t_vec,
            crossattn,
            dense,
            num_frames=num_frames,
        )

    plan = make_sampling_plan(DDPMDiscretization(), num_steps, s_noise=0.0)
    scale_vec = guidance.compute_scale_vector(
        guidance.GUIDER_MULTIVIEW, cfg, T, c2w, K, input_mask, cfg_min
    )
    nhwc = lambda a: jnp.asarray(np.moveaxis(a, 1, -1))  # noqa: E731
    cond = ChunkConditioning(
        crossattn=jnp.concatenate(
            [jnp.zeros_like(jnp.asarray(crossattn_c)), jnp.asarray(crossattn_c)], 0
        ),
        concat=jnp.concatenate([nhwc(concat_u), nhwc(concat_c)], 0),
        dense=jnp.concatenate([nhwc(plucker), nhwc(plucker)], 0),
        replace=jnp.concatenate([jnp.zeros_like(nhwc(replace_c)), nhwc(replace_c)], 0),
        scale=jnp.asarray(scale_vec),
    )
    x_j = euler_edm_sample(
        network_fn,
        nhwc(noise.copy()),
        plan_to_device(plan),
        cond,
        jax.random.PRNGKey(0),
        num_frames=T,
    )
    x_j = np.moveaxis(np.asarray(x_j), -1, 1)

    # fp32 end-to-end through 4 real UNet evaluations x 2 CFG halves
    np.testing.assert_allclose(x_j, x_t, atol=5e-3, rtol=1e-3)
    # and they agree far better than chance (outputs have unit-ish scale)
    assert np.abs(x_j - x_t).mean() < 5e-4
