"""Golden-parity tests of the sampling stack vs the reference oracle:
discretization sigmas, CFG scale rules, and the full Euler-EDM loop with a
mock denoiser network implemented identically in torch and JAX."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from stable_virtual_camera_tpu.sampling import guidance
from stable_virtual_camera_tpu.sampling.discretization import (
    DDPMDiscretization,
    sigma_to_idx,
)
from stable_virtual_camera_tpu.sampling.sampler import (
    ChunkConditioning,
    euler_edm_sample,
    make_sampling_plan,
    plan_to_device,
)

from conftest import random_c2ws


def test_sigmas_match_reference(ref):
    ours = DDPMDiscretization()
    theirs = ref.sampling.DDPMDiscretization()
    for n in [10, 25, 50, 1000]:
        np.testing.assert_allclose(
            ours(n), theirs(n).numpy(), rtol=1e-6, atol=1e-6
        )
    np.testing.assert_allclose(
        ours.registered_sigmas(),
        theirs(1000, do_append_zero=False, flip=True).numpy(),
        rtol=1e-6,
    )


def test_sigma_quantization_matches_reference(ref):
    ours = DDPMDiscretization()
    registered = ours.registered_sigmas()
    denoiser = ref.sampling.DiscreteDenoiser(
        discretization=ref.sampling.DDPMDiscretization(), device="cpu"
    )
    sigmas = np.array([0.002, 0.1, 1.0, 37.0, 700.0], dtype=np.float32)
    ours_idx = sigma_to_idx(sigmas, registered)
    theirs_idx = denoiser.sigma_to_idx(torch.from_numpy(sigmas)).numpy()
    np.testing.assert_array_equal(ours_idx, theirs_idx)


@pytest.mark.parametrize("guider_type", [0, 1, 2])
def test_cfg_scale_matches_reference(ref, rng, guider_type):
    T = 7
    scale, cfg_min = 3.0, 1.2
    c2w = random_c2ws(rng, T)
    # make frames 0 and 3 exact input poses
    input_mask = np.zeros(T, dtype=bool)
    input_mask[[0, 3]] = True
    K = np.repeat(np.eye(3)[None], T, axis=0)

    ours = guidance.compute_scale_vector(
        guider_type, scale, T, c2w, K, input_mask, cfg_min
    )

    # extract the reference's effective per-frame scale by blending
    # uncond=0, cond=1
    x = torch.cat([torch.zeros(T, 4, 2, 2), torch.ones(T, 4, 2, 2)], dim=0)
    if guider_type == 0:
        g = ref.sampling.VanillaCFG()
        out = g(x, sigma=1.0, scale=scale)
    elif guider_type == 1:
        g = ref.sampling.MultiviewCFG(cfg_min=cfg_min)
        out = g(
            x,
            1.0,
            scale,
            torch.from_numpy(c2w).float(),
            torch.from_numpy(K).float(),
            torch.from_numpy(input_mask),
        )
    else:
        g = ref.sampling.MultiviewTemporalCFG(T, cfg_min=cfg_min)
        out = g(
            x,
            1.0,
            scale,
            torch.from_numpy(c2w).float(),
            torch.from_numpy(K).float(),
            torch.from_numpy(input_mask),
        )
    theirs = out[:, 0, 0, 0].numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


class _TorchMockNet(torch.nn.Module):
    """Deterministic stand-in denoiser network exercising every conditioning
    channel; mirrored exactly by `_jax_mock_net`."""

    def forward(self, x, t, c, num_frames=None):
        x11 = torch.cat([x, c["concat"]], dim=1)
        tt = (t.float() / 1000.0)[:, None, None, None]
        return (
            0.1 * torch.tanh(x11[:, :4])
            + 0.03 * tt
            + 0.05 * x11[:, 4:5]
            + 0.01 * c["dense_vector"].mean(dim=1, keepdim=True)
            + 0.02 * c["crossattn"].mean(dim=(1, 2))[:, None, None, None]
        )


def _jax_mock_net(x, concat, t_vec, crossattn, dense, num_frames):
    tt = (t_vec.astype(jnp.float32) / 1000.0)[:, None, None, None]
    return (
        0.1 * jnp.tanh(x)
        + 0.03 * tt
        + 0.05 * concat[..., :1]
        + 0.01 * dense.mean(axis=-1, keepdims=True)
        + 0.02 * crossattn.mean(axis=(1, 2))[:, None, None, None]
    )


@pytest.mark.parametrize("guider_type", [0, 1])
def test_euler_sampler_matches_reference(ref, rng, guider_type):
    T, h, w = 4, 6, 6
    num_steps = 10
    cfg, cfg_min = 2.0, 1.2

    c2w = random_c2ws(rng, T).astype(np.float32)
    K = np.repeat(np.eye(3, dtype=np.float32)[None], T, axis=0)
    input_mask = np.zeros(T, dtype=bool)
    input_mask[0] = True

    noise = rng.normal(size=(T, 4, h, w)).astype(np.float32)
    crossattn_c = rng.normal(size=(T, 1, 16)).astype(np.float32)
    plucker = rng.normal(size=(T, 6, h, w)).astype(np.float32)
    latents = rng.normal(size=(T, 4, h, w)).astype(np.float32) * input_mask[
        :, None, None, None
    ]
    concat_c = np.concatenate(
        [np.broadcast_to(input_mask[:, None, None, None], (T, 1, h, w)), plucker],
        axis=1,
    ).astype(np.float32)
    concat_u = np.concatenate([np.zeros((T, 1, h, w), np.float32), plucker], axis=1)
    replace_c = np.concatenate(
        [latents, np.broadcast_to(input_mask[:, None, None, None], (T, 1, h, w))],
        axis=1,
    ).astype(np.float32)

    # ---- reference path ----
    disc_t = ref.sampling.DDPMDiscretization()
    denoiser_t = ref.sampling.DiscreteDenoiser(discretization=disc_t, device="cpu")
    if guider_type == 0:
        guider = ref.sampling.VanillaCFG()
        guider_kwargs = {}
    else:
        guider = ref.sampling.MultiviewCFG(cfg_min=cfg_min)
        guider_kwargs = dict(
            c2w=torch.from_numpy(c2w),
            K=torch.from_numpy(K),
            input_frame_mask=torch.from_numpy(input_mask),
        )
    sampler_t = ref.sampling.EulerEDMSampler(
        discretization=disc_t,
        guider=guider,
        num_steps=num_steps,
        s_churn=0.0,
        s_tmin=0.0,
        s_tmax=999.0,
        s_noise=0.0,  # zero injected noise so RNG scheme differences vanish
        device="cpu",
        verbose=False,
    )
    net_t = _TorchMockNet()
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
    x_t = sampler_t(
        lambda inp, sigma, cond: denoiser_t(net_t, inp, sigma, cond, num_frames=T),
        torch.from_numpy(noise.copy()),
        scale=cfg,
        cond=c,
        uc=uc,
        verbose=False,
        **guider_kwargs,
    ).numpy()

    # ---- ours ----
    disc = DDPMDiscretization()
    plan = make_sampling_plan(disc, num_steps, s_noise=0.0)
    scale_vec = guidance.compute_scale_vector(
        guider_type, cfg, T, c2w, K, input_mask, cfg_min
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
        _jax_mock_net,
        nhwc(noise.copy()),
        plan_to_device(plan),
        cond,
        jax.random.PRNGKey(0),
        num_frames=T,
    )
    x_j = np.moveaxis(np.asarray(x_j), -1, 1)

    np.testing.assert_allclose(x_j, x_t, atol=2e-4, rtol=1e-4)


# ---------------------------------------------------------------------------
# In-scan progress/abort (the single-dispatch GradioTrackedSampler equivalent)
# ---------------------------------------------------------------------------


def _make_tiny_cond(rng, T, h, w):
    crossattn = rng.normal(size=(T, 1, 16)).astype(np.float32)
    plucker = rng.normal(size=(T, h, w, 6)).astype(np.float32)
    mask_map = np.zeros((T, h, w, 1), np.float32)
    mask_map[0] = 1.0
    replace = rng.normal(size=(T, h, w, 5)).astype(np.float32) * mask_map
    return ChunkConditioning(
        crossattn=jnp.concatenate(
            [jnp.zeros_like(jnp.asarray(crossattn)), jnp.asarray(crossattn)], 0
        ),
        concat=jnp.asarray(
            np.concatenate(
                [
                    np.concatenate([np.zeros_like(mask_map), plucker], -1),
                    np.concatenate([mask_map, plucker], -1),
                ],
                0,
            )
        ),
        dense=jnp.concatenate([jnp.asarray(plucker)] * 2, 0),
        replace=jnp.concatenate(
            [jnp.zeros_like(jnp.asarray(replace)), jnp.asarray(replace)], 0
        ),
        scale=jnp.full((T,), 2.0, jnp.float32),
    )


def test_tracked_scan_matches_untracked_and_reports_progress(rng):
    from stable_virtual_camera_tpu.sampling import sampler as sampler_mod

    T, h, w, n = 3, 4, 4, 8
    plan = plan_to_device(make_sampling_plan(DDPMDiscretization(), n))
    cond = _make_tiny_cond(rng, T, h, w)
    noise = jnp.asarray(rng.normal(size=(T, h, w, 4)).astype(np.float32))
    key = jax.random.PRNGKey(3)

    ref_x = euler_edm_sample(_jax_mock_net, noise, plan, cond, key, num_frames=T)

    ticks = []
    handle = sampler_mod.register_tick(lambda i, total: ticks.append((i, total)), None)
    try:
        run = jax.jit(
            lambda noise, plan, cond, key, handle: euler_edm_sample(
                _jax_mock_net, noise, plan, cond, key, num_frames=T,
                tick_handle=handle,
            )
        )
        x = run(noise, plan, cond, key, jnp.int32(handle))
        x.block_until_ready()
    finally:
        sampler_mod.unregister_tick(handle)

    np.testing.assert_allclose(np.asarray(x), np.asarray(ref_x), rtol=1e-6, atol=1e-6)
    assert ticks == [(i + 1, n) for i in range(n)]


def test_tracked_scan_abort_short_circuits(rng):
    import threading

    from stable_virtual_camera_tpu.sampling import sampler as sampler_mod

    T, h, w, n, k_abort = 3, 4, 4, 8, 3
    disc = DDPMDiscretization()
    plan_full = make_sampling_plan(disc, n)
    cond = _make_tiny_cond(rng, T, h, w)
    noise = jnp.asarray(rng.normal(size=(T, h, w, 4)).astype(np.float32))
    key = jax.random.PRNGKey(3)

    ev = threading.Event()

    def progress(i, total):
        if i == k_abort:
            ev.set()

    handle = sampler_mod.register_tick(progress, ev)
    try:
        x = jax.jit(
            lambda noise, plan, cond, key, handle: euler_edm_sample(
                _jax_mock_net, noise, plan, cond, key, num_frames=T,
                tick_handle=handle,
            )
        )(noise, plan_to_device(plan_full), cond, key, jnp.int32(handle))
        x.block_until_ready()
    finally:
        sampler_mod.unregister_tick(handle)
    assert ev.is_set()

    # aborted after step k -> remaining steps are identity, so the result
    # equals running only the first k steps of the schedule
    import dataclasses

    plan_k = dataclasses.replace(
        plan_full,
        sigma_hat_raw=plan_full.sigma_hat_raw[:k_abort],
        sigma_hat_quant=plan_full.sigma_hat_quant[:k_abort],
        t_indices=plan_full.t_indices[:k_abort],
        sigma_next=plan_full.sigma_next[:k_abort],
        noise_coeff=plan_full.noise_coeff[:k_abort],
    )
    ref_x = euler_edm_sample(
        _jax_mock_net, noise, plan_to_device(plan_k), cond, key, num_frames=T
    )
    np.testing.assert_allclose(np.asarray(x), np.asarray(ref_x), rtol=1e-6, atol=1e-6)


def test_denoiser_sample_tracked_path_and_abort(rng):
    """UNetDenoiser.sample with progress/abort uses the in-scan path (on CPU,
    which supports io_callback) and honors the None-on-abort contract."""
    import threading

    from stable_virtual_camera_tpu.sampling.sampler import UNetDenoiser

    class DummyModule:
        def apply(self, variables, net_in, t_vec, crossattn, dense, num_frames):
            tt = (t_vec.astype(jnp.float32) / 1000.0)[:, None, None, None]
            return (
                0.1 * jnp.tanh(net_in[..., :4])
                + 0.03 * tt
                + 0.05 * net_in[..., 4:5]
                + variables["params"]["w"]
            )

    T, h, w, n = 3, 4, 4, 6
    den = UNetDenoiser(DummyModule(), {"w": jnp.float32(0.01)})
    plan = make_sampling_plan(DDPMDiscretization(), n)
    cond = _make_tiny_cond(rng, T, h, w)
    noise = jnp.asarray(rng.normal(size=(T, h, w, 4)).astype(np.float32))
    key = jax.random.PRNGKey(0)

    fast = den.sample(noise, plan, cond, key)
    ticks = []
    tracked = den.sample(
        noise, plan, cond, key, progress_cb=lambda i, total: ticks.append(i)
    )
    assert ticks == list(range(1, n + 1))
    np.testing.assert_allclose(
        np.asarray(tracked), np.asarray(fast), rtol=1e-6, atol=1e-6
    )

    ev = threading.Event()
    ev.set()  # aborted before sampling -> None
    assert den.sample(noise, plan, cond, key, abort_event=ev) is None


def test_denoiser_coarse_fallback_single_dispatch(rng, monkeypatch):
    """Backends without host callbacks (the axon relay) keep the
    single-dispatch scan: progress ticks once per chunk, abort polls between
    chunks, result == fast path; the per-step dispatch loop is debug-only."""
    import threading

    from stable_virtual_camera_tpu.sampling import sampler as sampler_mod
    from stable_virtual_camera_tpu.sampling.sampler import UNetDenoiser

    class DummyModule:
        def apply(self, variables, net_in, t_vec, crossattn, dense, num_frames):
            tt = (t_vec.astype(jnp.float32) / 1000.0)[:, None, None, None]
            return (
                0.1 * jnp.tanh(net_in[..., :4])
                + 0.03 * tt
                + 0.05 * net_in[..., 4:5]
                + variables["params"]["w"]
            )

    monkeypatch.setattr(sampler_mod, "io_callback_supported", lambda: False)

    T, h, w, n = 3, 4, 4, 6
    den = UNetDenoiser(DummyModule(), {"w": jnp.float32(0.01)})
    plan = make_sampling_plan(DDPMDiscretization(), n)
    cond = _make_tiny_cond(rng, T, h, w)
    noise = jnp.asarray(rng.normal(size=(T, h, w, 4)).astype(np.float32))
    key = jax.random.PRNGKey(0)

    fast = den.sample(noise, plan, cond, key)
    ticks = []
    out = den.sample(
        noise, plan, cond, key, progress_cb=lambda i, total: ticks.append((i, total))
    )
    assert ticks == [(n, n)]  # chunk-granular: one tick per chunk
    np.testing.assert_allclose(np.asarray(out), np.asarray(fast), rtol=0, atol=0)

    ev = threading.Event()
    ev.set()
    assert den.sample(noise, plan, cond, key, abort_event=ev) is None


def test_sample_from_key_matches_eager_derivation(rng):
    """The engine dispatch diet: sample_from_key folds the chunk key, splits
    and draws the initial noise INSIDE the jitted program. Must be bitwise
    identical to the eager derivation + sample(noise, ...) path."""
    from stable_virtual_camera_tpu.sampling.sampler import UNetDenoiser

    class DummyModule:
        def apply(self, variables, net_in, t_vec, crossattn, dense, num_frames):
            tt = (t_vec.astype(jnp.float32) / 1000.0)[:, None, None, None]
            return (
                0.1 * jnp.tanh(net_in[..., :4])
                + 0.03 * tt
                + 0.05 * net_in[..., 4:5]
                + variables["params"]["w"]
            )

    T, h, w, n = 3, 4, 4, 6
    den = UNetDenoiser(DummyModule(), {"w": jnp.float32(0.01)})
    plan = make_sampling_plan(DDPMDiscretization(), n)
    cond = _make_tiny_cond(rng, T, h, w)
    base_key = jax.random.PRNGKey(23)

    for pass_id, chunk_id in [(0, 0), (1, 2), (2, 7)]:
        # the eager reference derivation (what the engine used to run)
        key = jax.random.fold_in(jax.random.fold_in(base_key, pass_id), chunk_id)
        key_init, key_loop = jax.random.split(key)
        noise = jax.random.normal(key_init, (T, h, w, 4), jnp.float32)
        ref_x = den.sample(noise, plan, cond, key_loop)

        got = den.sample_from_key(
            (T, h, w, 4), plan, cond, base_key,
            np.array([pass_id, chunk_id], np.int32),
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref_x), rtol=1e-5, atol=1e-5
        )


def test_sample_from_key_tracked_and_coarse(rng, monkeypatch):
    """Progress/abort work through the keyed path too: in-scan ticks on
    callback-capable backends, chunk-granular ticks on the coarse fallback,
    None on pre-set abort — all bitwise equal to the plain keyed scan."""
    import threading

    from stable_virtual_camera_tpu.sampling import sampler as sampler_mod
    from stable_virtual_camera_tpu.sampling.sampler import UNetDenoiser

    class DummyModule:
        def apply(self, variables, net_in, t_vec, crossattn, dense, num_frames):
            return 0.1 * jnp.tanh(net_in[..., :4]) + variables["params"]["w"]

    T, h, w, n = 3, 4, 4, 5
    den = UNetDenoiser(DummyModule(), {"w": jnp.float32(0.01)})
    plan = make_sampling_plan(DDPMDiscretization(), n)
    cond = _make_tiny_cond(rng, T, h, w)
    base_key = jax.random.PRNGKey(5)
    pc = np.array([2, 1], np.int32)

    fast = den.sample_from_key((T, h, w, 4), plan, cond, base_key, pc)

    ticks = []
    tracked = den.sample_from_key(
        (T, h, w, 4), plan, cond, base_key, pc,
        progress_cb=lambda i, total: ticks.append(i),
    )
    assert ticks == list(range(1, n + 1))
    np.testing.assert_allclose(
        np.asarray(tracked), np.asarray(fast), rtol=1e-5, atol=1e-5
    )

    monkeypatch.setattr(sampler_mod, "io_callback_supported", lambda: False)
    den2 = UNetDenoiser(DummyModule(), {"w": jnp.float32(0.01)})
    coarse_ticks = []
    coarse = den2.sample_from_key(
        (T, h, w, 4), plan, cond, base_key, pc,
        progress_cb=lambda i, total: coarse_ticks.append((i, total)),
    )
    assert coarse_ticks == [(n, n)]
    np.testing.assert_array_equal(np.asarray(coarse), np.asarray(fast))

    ev = threading.Event()
    ev.set()
    assert (
        den.sample_from_key((T, h, w, 4), plan, cond, base_key, pc, abort_event=ev)
        is None
    )


def test_sample_from_key_fused_post_matches_separate_decode(rng):
    """post=(name, fn, params) traces a postprocess (the VAE uint8 decode in
    the engine, runner SVC_FUSED_DECODE) into the keyed program. The fused
    one-dispatch output must match post(sample_from_key(...)) run as two
    programs to within one uint8 quantization step (compile variation), and
    the tracked (progress/abort) path must honor post too."""
    from stable_virtual_camera_tpu.sampling.sampler import UNetDenoiser

    class DummyModule:
        def apply(self, variables, net_in, t_vec, crossattn, dense, num_frames):
            tt = (t_vec.astype(jnp.float32) / 1000.0)[:, None, None, None]
            return (
                0.1 * jnp.tanh(net_in[..., :4])
                + 0.03 * tt
                + variables["params"]["w"]
            )

    T, h, w, n = 3, 4, 4, 4
    den = UNetDenoiser(DummyModule(), {"w": jnp.float32(0.01)})
    plan = make_sampling_plan(DDPMDiscretization(), n)
    cond = _make_tiny_cond(rng, T, h, w)
    base_key = jax.random.PRNGKey(7)
    pc = np.array([2, 1], np.int32)

    def post_fn(p, x):  # a decode stand-in: affine + uint8 quantization
        v = jnp.clip((jnp.tanh(x * p["s"]) + 1.0) * 127.5, 0, 255)
        return v.astype(jnp.uint8)

    pparams = {"s": jnp.float32(0.7)}

    lat = den.sample_from_key((T, h, w, 4), plan, cond, base_key, pc)
    want = np.asarray(jax.jit(post_fn)(pparams, lat))

    got = np.asarray(
        den.sample_from_key(
            (T, h, w, 4), plan, cond, base_key, pc,
            post=("u8", post_fn, pparams),
        )
    )
    assert got.dtype == np.uint8
    assert np.max(np.abs(got.astype(int) - want.astype(int))) <= 1

    ticks = []
    tracked = den.sample_from_key(
        (T, h, w, 4), plan, cond, base_key, pc,
        progress_cb=lambda i, n_: ticks.append((i, n_)),
        post=("u8", post_fn, pparams),
    )
    tracked = np.asarray(tracked)
    assert tracked.dtype == np.uint8
    assert np.max(np.abs(tracked.astype(int) - want.astype(int))) <= 1
    assert ticks, "progress callback never fired"
