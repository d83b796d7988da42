"""Multi-chip sharding tests on the virtual 8-device CPU mesh: the
view-sharded sampling step compiles, runs, and matches the unsharded result."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stable_virtual_camera_tpu.config import SevaSpec
from stable_virtual_camera_tpu.models.unet import SevaUNet, assemble_network_input
from stable_virtual_camera_tpu.parallel.mesh import make_mesh
from stable_virtual_camera_tpu.parallel.sharding import (
    make_sharded_sampler,
    make_sharded_step,
)
from stable_virtual_camera_tpu.sampling.discretization import DDPMDiscretization
from stable_virtual_camera_tpu.sampling.sampler import (
    ChunkConditioning,
    euler_edm_sample,
    make_sampling_plan,
    plan_to_device,
)


@pytest.fixture(scope="module")
def setup():
    assert jax.device_count() >= 8, "expected 8 virtual CPU devices"
    spec = SevaSpec(
        model_channels=32, num_frames=8, num_head_channels=16, context_dim=64
    )
    T, h, w = spec.num_frames, 16, 16
    unet = SevaUNet(spec, dtype=jnp.float32, param_dtype=jnp.float32)
    params = unet.init(
        jax.random.PRNGKey(0),
        jnp.zeros((2 * T, h, w, spec.in_channels)),
        jnp.zeros((2 * T,), jnp.int32),
        jnp.zeros((2 * T, 1, spec.context_dim)),
        jnp.zeros((2 * T, h, w, spec.dense_in_channels)),
        num_frames=T,
    )["params"]

    def network_fn(x, concat, t_vec, crossattn, dense, num_frames):
        return unet.apply(
            {"params": params},
            assemble_network_input(x, concat),
            t_vec,
            crossattn,
            dense,
            num_frames=num_frames,
        )

    rng = np.random.default_rng(0)
    noise = jnp.asarray(rng.normal(size=(T, h, w, 4)).astype(np.float32))
    cond = ChunkConditioning(
        crossattn=jnp.asarray(rng.normal(size=(2 * T, 1, 64)).astype(np.float32)),
        concat=jnp.asarray(rng.normal(size=(2 * T, h, w, 7)).astype(np.float32)),
        dense=jnp.asarray(rng.normal(size=(2 * T, h, w, 6)).astype(np.float32)),
        replace=jnp.asarray(
            (rng.normal(size=(2 * T, h, w, 5)) * 0.1).astype(np.float32)
        ),
        scale=jnp.full((T,), 2.0, jnp.float32),
    )
    plan = make_sampling_plan(DDPMDiscretization(), 3, s_noise=0.0)
    return spec, network_fn, noise, cond, plan


def test_sharded_sampler_matches_unsharded(setup):
    spec, network_fn, noise, cond, plan = setup
    T = spec.num_frames
    mesh = make_mesh(n_data=1, n_view=8)
    key = jax.random.PRNGKey(0)

    ref = euler_edm_sample(
        network_fn, noise, plan_to_device(plan), cond, key, num_frames=T
    )

    with mesh:
        sharded = make_sharded_sampler(network_fn, mesh, T)
        out = sharded(noise, plan_to_device(plan), cond, key)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4, rtol=1e-3)


def test_sharded_step_runs_2d_mesh(setup):
    spec, network_fn, noise, cond, plan = setup
    T = spec.num_frames
    mesh = make_mesh(n_data=2, n_view=4)
    pa = plan_to_device(plan)
    per_step = tuple(
        pa[k][0]
        for k in (
            "sigma_hat_raw",
            "sigma_hat_quant",
            "t_indices",
            "sigma_next",
            "noise_coeff",
        )
    )
    with mesh:
        step = make_sharded_step(network_fn, mesh, T)
        out = step(noise, per_step, cond, jax.random.PRNGKey(1))
    assert np.isfinite(np.asarray(out)).all()


def test_ring_attention_matches_full():
    """Ring attention over the 8-device mesh == plain full attention."""
    from stable_virtual_camera_tpu.ops.attention import attention_xla
    from stable_virtual_camera_tpu.parallel.ring_attention import (
        make_ring_self_attention,
    )

    rng = np.random.default_rng(0)
    B, L, H, D = 2, 512, 4, 64  # L shards over 8 devices -> 64 local tokens
    q = jnp.asarray(rng.normal(size=(B, L, H, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, L, H, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, L, H, D)).astype(np.float32))

    ref = attention_xla(q, k, v)
    mesh = make_mesh(n_data=1, n_view=8)
    with mesh:
        attn = make_ring_self_attention(mesh)
        out = attn(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_data_parallel_sampler_matches_sequential(setup):
    """Batched chunks sharded over 'data' == looping chunks one at a time."""
    from stable_virtual_camera_tpu.parallel.sharding import (
        make_data_parallel_sampler,
    )
    from stable_virtual_camera_tpu.sampling.sampler import plan_to_device

    spec, network_fn, noise, cond, plan = setup
    T = spec.num_frames
    N = 4
    keys = jax.random.split(jax.random.PRNGKey(7), N)
    noises = jnp.stack([noise * (1 + 0.01 * i) for i in range(N)])
    conds = jax.tree_util.tree_map(
        lambda x: jnp.stack([x] * N), cond
    )
    pa = plan_to_device(plan)

    seq = jnp.stack(
        [
            euler_edm_sample(network_fn, noises[i], pa, cond, keys[i], num_frames=T)
            for i in range(N)
        ]
    )

    mesh = make_mesh(n_data=4, n_view=2)
    with mesh:
        dp = make_data_parallel_sampler(network_fn, mesh, T)
        out = dp(noises, pa, conds, keys)
    np.testing.assert_allclose(np.asarray(out), np.asarray(seq), atol=5e-4, rtol=1e-3)


def test_sharded_joint_attention_is_ring(setup):
    """Ring-integrated UNet: the sharded sampler matches the unsharded result
    AND the compiled HLO rotates K/V with collective-permute (ring over ICI)
    instead of relying solely on all-gather for the joint t*h*w attention
    (VERDICT.md next-round item 4; capability point docs/CLI_USAGE.md:80-81)."""
    from stable_virtual_camera_tpu.models.unet import SevaUNet, assemble_network_input

    spec, _, noise, cond, plan = setup
    T = spec.num_frames
    mesh = make_mesh(n_data=1, n_view=8)

    ring_unet = SevaUNet(
        spec, dtype=jnp.float32, param_dtype=jnp.float32,
        ring_mesh=mesh, ring_axis="view",
    )
    params = ring_unet.init(
        jax.random.PRNGKey(0),
        jnp.zeros((2 * T, 16, 16, spec.in_channels)),
        jnp.zeros((2 * T,), jnp.int32),
        jnp.zeros((2 * T, 1, spec.context_dim)),
        jnp.zeros((2 * T, 16, 16, spec.dense_in_channels)),
        num_frames=T,
    )["params"]
    plain_unet = SevaUNet(spec, dtype=jnp.float32, param_dtype=jnp.float32)

    def ring_fn(x, concat, t_vec, crossattn, dense, num_frames):
        return ring_unet.apply(
            {"params": params}, assemble_network_input(x, concat),
            t_vec, crossattn, dense, num_frames=num_frames,
        )

    def plain_fn(x, concat, t_vec, crossattn, dense, num_frames):
        return plain_unet.apply(
            {"params": params}, assemble_network_input(x, concat),
            t_vec, crossattn, dense, num_frames=num_frames,
        )

    key = jax.random.PRNGKey(0)
    ref = euler_edm_sample(
        plain_fn, noise, plan_to_device(plan), cond, key, num_frames=T
    )
    with mesh:
        sharded = make_sharded_sampler(ring_fn, mesh, T)
        lowered = sharded.lower(noise, plan_to_device(plan), cond, key)
        hlo = lowered.compile().as_text()
        out = sharded(noise, plan_to_device(plan), cond, key)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4, rtol=1e-3)
    assert "collective-permute" in hlo, "joint attention did not lower to a ring"


def test_engine_mesh_integration(tmp_path):
    """ModelBundle with a ('data','view') mesh: the engine's sampling
    programs shard frames over 'view' (sampling/sampler.UNetDenoiser) and
    produce the same scene outputs as the unsharded engine — the CLI's
    --mesh_view path."""
    import os.path as osp

    from conftest import random_c2ws
    from stable_virtual_camera_tpu.config import EngineOptions, VersionConfig
    from stable_virtual_camera_tpu.engine.runner import SceneEngine
    from stable_virtual_camera_tpu.models.io import random_bundle

    def run(mesh, subdir):
        bundle = random_bundle(image_hw=(64, 64), mesh=mesh)
        T = bundle.spec.num_frames
        rng = np.random.default_rng(0)
        n = 5
        imgs = (rng.uniform(0, 255, size=(n, 64, 64, 3))).astype(np.uint8)
        c2ws = random_c2ws(rng, n).astype(np.float32)[:, :3]
        Ks = np.repeat(
            np.array([[1.2, 0, 0.5], [0, 1.2, 0.5], [0, 0, 1]], np.float32)[None],
            n, 0,
        )
        version = VersionConfig(H=64, W=64, T=T)
        options = EngineOptions().update(dict(
            num_steps=2, cfg=2.0, guider_types=1, chunk_strategy="nearest-gt",
            sampler_verbose=False, video_save_fps=5.0, encoding_t=0, decoding_t=0,
        ))
        engine = SceneEngine(bundle, version, options)
        gen = engine.run_one_scene(
            "img2img",
            {"img": [im for im in imgs], "input_indices": [0, 1]},
            {"c2w": c2ws, "K": [k for k in Ks],
             "input_indices": list(range(n))},
            save_path=str(tmp_path / subdir),
            use_traj_prior=False,
            seed=3,
        )
        videos = list(gen)
        assert videos
        import cv2

        cap = cv2.VideoCapture(osp.join(str(tmp_path / subdir), "samples-rgb.mp4"))
        frames = []
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            frames.append(frame)
        return np.stack(frames)

    base = run(None, "plain")
    mesh = make_mesh(n_data=1, n_view=3)  # tiny spec T=3
    sharded = run(mesh, "sharded")
    # mp4 round trip is lossy; compare decoded frames with a loose budget
    assert base.shape == sharded.shape
    assert np.mean(np.abs(base.astype(int) - sharded.astype(int))) < 2.0
