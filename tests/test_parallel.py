"""Multi-chip sharding tests on the virtual 8-device CPU mesh: the
view-sharded sampling step compiles, runs, and matches the unsharded result."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # engine-scale: minutes on this 1-core box

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
    plucker = rng.normal(size=(T, h, w, 6)).astype(np.float32)
    cond = ChunkConditioning(
        crossattn=jnp.asarray(rng.normal(size=(2 * T, 1, 64)).astype(np.float32)),
        concat=jnp.asarray(rng.normal(size=(2 * T, h, w, 7)).astype(np.float32)),
        # ChunkConditioning contract: the CFG halves share one Plücker map
        # (the FiLM cache relies on it)
        dense=jnp.asarray(np.concatenate([plucker, plucker], 0)),
        replace=jnp.asarray(
            (rng.normal(size=(2 * T, h, w, 5)) * 0.1).astype(np.float32)
        ),
        scale=jnp.full((T,), 2.0, jnp.float32),
    )
    plan = make_sampling_plan(DDPMDiscretization(), 3, s_noise=0.0)
    return spec, network_fn, noise, cond, plan, unet, params


def test_sharded_sampler_matches_unsharded(setup):
    spec, network_fn, noise, cond, plan, _, _ = setup
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


def test_sharded_sampler_w8a8_within_quant_noise_of_exact(setup, monkeypatch):
    """W8A8 composes with view sharding. NOTE the invariant: int8 rounding is
    DISCONTINUOUS, so the fp32 reduction-order differences GSPMD introduces in
    the gathered joint-attention layers flip occasional round() decisions and
    the flips cascade — sharded-quantized and unsharded-quantized outputs are
    two valid quantizations that need not match elementwise (verified by
    bisection: every module before the first unflatten layer IS exactly
    equal). The meaningful check is that the sharded quantized sampler stays
    within quantization noise of the EXACT (unquantized) result, same bound
    as the unsharded quant test (tests/test_quant.py)."""
    spec, network_fn, noise, cond, plan, _, _ = setup
    T = spec.num_frames
    key = jax.random.PRNGKey(0)

    exact = np.asarray(
        euler_edm_sample(
            network_fn, noise, plan_to_device(plan), cond, key, num_frames=T
        )
    )
    monkeypatch.setenv("SVC_QUANT", "w8a8")
    mesh = make_mesh(n_data=1, n_view=8)
    with mesh:
        sharded = make_sharded_sampler(network_fn, mesh, T)
        out = np.asarray(sharded(noise, plan_to_device(plan), cond, key))
    assert np.isfinite(out).all()
    rel = np.linalg.norm(out - exact) / np.linalg.norm(exact)
    assert 0 < rel < 0.10, rel
    corr = np.corrcoef(out.ravel(), exact.ravel())[0, 1]
    assert corr > 0.995, corr


def test_sharded_step_runs_2d_mesh(setup):
    spec, network_fn, noise, cond, plan, _, _ = setup
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

    spec, network_fn, noise, cond, plan, _, _ = setup
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

    spec, _, noise, cond, plan, _, _ = setup
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


def test_engine_data_parallel_second_pass(tmp_path):
    """Second-pass chunks fan out over the mesh 'data' axis in groups
    (runner.py second pass + sampler.sample_many) and produce the same frames
    as the serial engine — the CLI's --mesh_data path. The scenario yields 5
    chunks with n_data=2: two full DP groups plus a final padded partial
    group (one chunk repeated to fill the data axis, padding dropped)."""
    import glob
    import os.path as osp

    import cv2
    from conftest import random_c2ws
    from stable_virtual_camera_tpu.config import EngineOptions, VersionConfig
    from stable_virtual_camera_tpu.engine.runner import SceneEngine
    from stable_virtual_camera_tpu.models.io import random_bundle

    def run(mesh, subdir):
        bundle = random_bundle(image_hw=(64, 64), mesh=mesh)
        rng = np.random.default_rng(11)
        n = 7  # 1 input + 6 ordered targets
        imgs = (rng.uniform(0, 255, size=(n, 64, 64, 3))).astype(np.uint8)
        c2ws = random_c2ws(rng, n).astype(np.float32)[:, :3]
        Ks = np.repeat(
            np.array([[1.2, 0, 0.5], [0, 1.2, 0.5], [0, 0, 1]], np.float32)[None],
            n, 0,
        )
        prior_c2ws = c2ws[[2, 3, 4, 5, 6]]
        options = EngineOptions().update(dict(
            num_steps=2, cfg=[2.0, 2.0], cfg_min=1.2, guider_types=[1, 2],
            chunk_strategy="interp", chunk_strategy_first_pass="gt",
            sampler_verbose=False, video_save_fps=5.0,
            encoding_t=0, decoding_t=0, save_first_pass=False,
        ))
        engine = SceneEngine(bundle, VersionConfig(H=64, W=64, T=3), options)
        save_path = str(tmp_path / subdir)
        videos = list(engine.run_one_scene(
            "img2trajvid",
            {"img": [im for im in imgs], "input_indices": [0],
             "prior_indices": [1.5, 2.5, 3.5, 4.5, 5.5]},
            {"c2w": c2ws, "K": [k for k in Ks], "input_indices": list(range(n))},
            save_path=save_path,
            use_traj_prior=True,
            traj_prior_Ks=None,
            traj_prior_c2ws=prior_c2ws,
            seed=2,
        ))
        assert osp.exists(videos[-1])
        pngs = sorted(glob.glob(osp.join(save_path, "samples-rgb", "*.png")))
        assert len(pngs) == 6
        return np.stack([cv2.imread(p) for p in pngs])

    serial = run(None, "dp_serial")
    dp = run(make_mesh(n_data=2, n_view=1), "dp_mesh")
    # PNGs are lossless; DP uses the same per-chunk keys as the serial loop,
    # so frames agree to quantization (vmap compiles a different program, so
    # bitwise float equality is not guaranteed)
    assert serial.shape == dp.shape
    assert np.max(np.abs(serial.astype(int) - dp.astype(int))) <= 1


def test_engine_mesh_fanout_economy(tmp_path):
    """The baseline's full 134-frame Advanced workload (economy anchors +
    anchor delivery) end-to-end on the virtual 8-device mesh: the second
    pass's 7 chunks fan out over a 4-wide 'data' axis as TWO sample_many
    dispatches (4 + 3-padded-to-4) and the output frames match the serial
    engine. This is the max multi-chip evidence obtainable on this box; the
    projected chip-scaling table lives in benchmark/mesh_fanout_sim.py."""
    import glob
    import os.path as osp

    import cv2
    from stable_virtual_camera_tpu.apps.renderer import (
        HeadlessRenderer,
        preprocess_basic,
    )
    from stable_virtual_camera_tpu.config import VersionConfig
    from stable_virtual_camera_tpu.models.io import random_bundle
    from stable_virtual_camera_tpu.sampling.sampler import UNetDenoiser

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, size=(64, 64, 3), dtype=np.uint8)
    dispatches = {"many": 0, "serial": 0}
    orig_many = UNetDenoiser.sample_many
    orig_one = UNetDenoiser.sample_from_key

    def run(mesh, subdir):
        dispatches.update(many=0, serial=0)
        bundle = random_bundle(image_hw=(64, 64), mesh=mesh)
        r = HeadlessRenderer(bundle, work_dir=str(tmp_path / subdir))
        r.version = VersionConfig(H=64, W=64, T=21)
        plan = r.prepare(
            preprocess_basic(img, shorter=64), preset_traj="orbit",
            num_frames=134, zoom_factor=0.5, chunk_strategy="interp-gt",
            cfg=4.0, num_steps=2, seed=23, min_anchor_fill=False,
            deliver_anchors=True,
        )
        assert (plan["first_pass_chunks"], plan["second_pass_chunks"]) == (1, 7)
        videos = list(r.run(plan))
        out_dir = osp.dirname(videos[-1])
        pngs = sorted(glob.glob(osp.join(out_dir, "samples-rgb", "*.png")))
        assert len(pngs) == 134
        return np.stack([cv2.imread(p) for p in pngs])

    def count_many(self, *a, **kw):
        dispatches["many"] += 1
        return orig_many(self, *a, **kw)

    def count_one(self, *a, **kw):
        dispatches["serial"] += 1
        return orig_one(self, *a, **kw)

    UNetDenoiser.sample_many = count_many
    UNetDenoiser.sample_from_key = count_one
    try:
        serial = run(None, "fanout_serial")
        assert dispatches["many"] == 0
        n_serial = dispatches["serial"]
        dp = run(make_mesh(n_data=4, n_view=1), "fanout_dp4")
        # 1 first-pass serial scan + ceil(7/4)=2 batched second-pass groups
        assert dispatches["many"] == 2
        assert dispatches["serial"] == n_serial - 7 + 0
    finally:
        UNetDenoiser.sample_many = orig_many
        UNetDenoiser.sample_from_key = orig_one
    assert serial.shape == dp.shape
    # same per-chunk keys; programs differ (vmap+shard) so frames agree to
    # one uint8 quantization step
    assert np.max(np.abs(serial.astype(int) - dp.astype(int))) <= 1


def test_engine_semi_dense_large_T_on_mesh(tmp_path):
    """The T=80-96 semi-dense regime, engine-level, on the virtual mesh: >=9
    input views grow the first-pass context window in place
    (infer_prior_stats, reference seva/eval.py:363-420) and the engine runs
    that large-T single forward view-sharded over all 8 devices (T_first=16
    here at tiny scale; 16 and 8 both divide the view axis, so no bucket
    falls back to single-device)."""
    import glob
    import os.path as osp

    from conftest import random_c2ws
    from stable_virtual_camera_tpu.config import EngineOptions, VersionConfig
    from stable_virtual_camera_tpu.engine.prior import infer_prior_stats
    from stable_virtual_camera_tpu.engine.runner import SceneEngine
    from stable_virtual_camera_tpu.models.io import random_bundle

    mesh = make_mesh(n_data=1, n_view=8)
    bundle = random_bundle(image_hw=(64, 64), mesh=mesh)
    n_in, n_tgt = 10, 30
    n = n_in + n_tgt
    rng = np.random.default_rng(21)
    imgs = (rng.uniform(0, 255, size=(n, 64, 64, 3))).astype(np.uint8)
    c2ws = random_c2ws(rng, n).astype(np.float32)[:, :3]
    Ks = np.repeat(
        np.array([[1.2, 0, 0.5], [0, 1.2, 0.5], [0, 0, 1]], np.float32)[None], n, 0
    )
    options = EngineOptions().update(dict(
        num_steps=2, cfg=[2.0, 2.0], cfg_min=1.2, guider_types=[1, 2],
        chunk_strategy="interp", chunk_strategy_first_pass="gt-nearest",
        sampler_verbose=False, video_save_fps=5.0,
        encoding_t=0, decoding_t=0, save_first_pass=False,
    ))
    version = VersionConfig(H=64, W=64, T=8)
    num_anchors = infer_prior_stats(version.T, n_in, n_tgt, version, options)
    # the semi-dense branch rewrote T in place: first pass = inputs + anchors
    assert version.T == [16, 8] and num_anchors == 6

    anchor_indices = np.linspace(n_in, n - 1, num_anchors).tolist()
    anchor_c2ws = c2ws[[round(i) for i in anchor_indices]]

    engine = SceneEngine(bundle, version, options)
    save_path = str(tmp_path / "semidense")
    videos = list(engine.run_one_scene(
        "img2trajvid",
        {"img": [im for im in imgs], "input_indices": list(range(n_in)),
         "prior_indices": anchor_indices},
        {"c2w": c2ws, "K": [k for k in Ks], "input_indices": list(range(n))},
        save_path=save_path,
        use_traj_prior=True,
        traj_prior_Ks=None,
        traj_prior_c2ws=anchor_c2ws,
        seed=4,
    ))
    assert osp.exists(videos[-1])
    pngs = glob.glob(osp.join(save_path, "samples-rgb", "*.png"))
    assert len(pngs) == n_tgt
    # every shape bucket ran sharded (no silent single-device fallback)
    assert bundle.denoiser._warned_unsharded == set()


def test_sharded_denoiser_progress_uses_coarse_scan(setup):
    """View-sharded UNetDenoiser.sample with a progress callback routes to
    the coarse single-dispatch scan (io_callback placement under pjit is
    per-device): one tick per chunk, result == the no-progress sharded path."""
    from stable_virtual_camera_tpu.sampling.sampler import UNetDenoiser

    spec, network_fn, noise, cond, plan, _, _ = setup
    T = spec.num_frames

    class DummyModule:
        def apply(self, variables, net_in, t_vec, crossattn, dense, num_frames):
            tt = (t_vec.astype(jnp.float32) / 1000.0)[:, None, None, None]
            return (
                0.1 * jnp.tanh(net_in[..., :4])
                + 0.03 * tt
                + variables["params"]["w"]
            )

    mesh = make_mesh(n_data=1, n_view=8)
    den = UNetDenoiser(DummyModule(), {"w": jnp.float32(0.01)}, mesh=mesh)
    key = jax.random.PRNGKey(0)
    with mesh:
        fast = den.sample(noise, plan, cond, key)
        ticks = []
        tracked = den.sample(
            noise, plan, cond, key,
            progress_cb=lambda i, t: ticks.append((i, t)),
        )
    assert ticks == [(plan.num_steps, plan.num_steps)]
    np.testing.assert_allclose(np.asarray(tracked), np.asarray(fast), rtol=0, atol=0)


def test_tensor_parallel_sampler_matches_unsharded(setup):
    """Megatron-style TP: params sharded over the 'model' axis of a 3-D
    (data, view, model) mesh, frames over 'view' — numerics match the
    unsharded sampler and the weight leaves really are distributed."""
    from stable_virtual_camera_tpu.parallel.mesh import make_mesh_tp
    from stable_virtual_camera_tpu.parallel.sharding import (
        make_tensor_parallel_sampler,
    )

    spec, network_fn, noise, cond, plan, unet, params = setup
    T = spec.num_frames

    def apply_fn(p, x, concat, t_vec, crossattn, dense, num_frames):
        return unet.apply(
            {"params": p}, assemble_network_input(x, concat),
            t_vec, crossattn, dense, num_frames=num_frames,
        )

    key = jax.random.PRNGKey(3)
    ref = euler_edm_sample(
        network_fn, noise, plan_to_device(plan), cond, key, num_frames=T
    )

    mesh = make_mesh_tp(n_data=1, n_view=2, n_model=4)
    with mesh:
        tp = make_tensor_parallel_sampler(apply_fn, params, mesh, T)
        out = tp(params, noise, plan_to_device(plan), cond, key)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-4, rtol=1e-3)

    # The big kernels must actually shard over 'model' (not stay replicated).
    from stable_virtual_camera_tpu.parallel.param_sharding import (
        tree_partition_specs,
    )

    from jax.sharding import PartitionSpec as P

    specs = jax.tree.leaves(
        tree_partition_specs(params, mesh, "model"),
        is_leaf=lambda x: isinstance(x, P),
    )
    sharded = [s for s in specs if any(e is not None for e in s)]
    assert len(sharded) > len(specs) // 2, (
        f"only {len(sharded)}/{len(specs)} leaves sharded over 'model'"
    )


def test_denoiser_tp_mesh_matches_unsharded(setup):
    """UNetDenoiser on a 3-D (data,view,model) mesh: the engine-facing
    sampler path runs tensor-parallel weights and matches the single-device
    result (CLI --mesh_model)."""
    from stable_virtual_camera_tpu.parallel.mesh import make_mesh_tp
    from stable_virtual_camera_tpu.sampling.sampler import UNetDenoiser

    spec, _, noise, cond, plan, unet, params = setup
    T = spec.num_frames

    plain = UNetDenoiser(unet, params)
    ref = plain.sample(noise, plan, cond, jax.random.PRNGKey(2))

    mesh = make_mesh_tp(n_data=1, n_view=2, n_model=4)
    tp = UNetDenoiser(unet, params, mesh=mesh)
    out = tp.sample(noise, plan, cond, jax.random.PRNGKey(2))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-4, rtol=1e-3)
