"""Default-tier coverage for env-flag-gated engine paths.

Round-4 lesson (StageTimer NameError shipped in a gated path): every
env-flag path needs at least one test in the DEFAULT selection, not just the
slow tier. These run a minimal two-pass scene (tiny spec, 2 steps, few
frames) so the whole file stays cheap on the 1-core CPU box.

Covered flags / branches:
  * SVC_FUSED_DECODE=1 + SVC_COND_CACHE=0 + stream_save=False in one flagged
    render, compared frame-for-frame against the default render.
  * the sharded-bucket fused-decode fallback in `sample_chunk`
    (engine/runner.py dtype sniff: a view-sharded bucket drops the fused
    post, so the returned array is latents, not uint8).
  * `VaeApplier._chunked` empty-batch shape correctness.
  * `deliver_anchors` pose verification: ordinal aliasing WITHOUT pose
    identity must fall back to re-denoising (ADVICE r4 medium #2).
"""

import glob
import os.path as osp

import numpy as np
import pytest

from stable_virtual_camera_tpu.config import EngineOptions, VersionConfig
from stable_virtual_camera_tpu.engine.runner import SceneEngine
from stable_virtual_camera_tpu.models.io import random_bundle

from conftest import random_c2ws


@pytest.fixture(scope="module")
def bundle():
    return random_bundle(image_hw=(64, 64))


def _scene(rng, n):
    imgs = (rng.uniform(0, 255, size=(n, 64, 64, 3))).astype(np.uint8)
    c2ws = random_c2ws(rng, n).astype(np.float32)[:, :3]
    Ks = np.repeat(
        np.array(
            [[1.2, 0.0, 0.5], [0.0, 1.2, 0.5], [0.0, 0.0, 1.0]], np.float32
        )[None],
        n,
        axis=0,
    )
    return imgs, c2ws, Ks


def _run_two_pass(bundle, tmp_path, subdir, *, options_kw=None, seed=23):
    rng = np.random.default_rng(7)
    imgs, c2ws, Ks = _scene(rng, 5)
    base = dict(
        num_steps=2,
        cfg=[2.0, 2.0],
        guider_types=[1, 2],
        chunk_strategy="nearest",
        chunk_strategy_first_pass="gt",
        sampler_verbose=False,
        encoding_t=0,
        decoding_t=0,
        save_first_pass=False,
    )
    base.update(options_kw or {})
    options = EngineOptions().update(base)
    engine = SceneEngine(bundle, VersionConfig(H=64, W=64, T=3), options)
    prior_c2ws = random_c2ws(np.random.default_rng(3), 2).astype(np.float32)[
        :, :3
    ]
    save_path = osp.join(str(tmp_path), subdir)
    paths = list(
        engine.run_one_scene(
            "img2trajvid",
            {
                "img": [im for im in imgs],
                "input_indices": [0],
                "prior_indices": [1.5, 3.5],
            },
            {
                "c2w": c2ws,
                "K": [k for k in Ks],
                "input_indices": list(range(len(imgs))),
            },
            save_path=save_path,
            use_traj_prior=True,
            traj_prior_Ks=None,
            traj_prior_c2ws=prior_c2ws,
            seed=seed,
        )
    )
    assert paths
    return save_path


def _frames(save_path):
    import imageio.v3 as iio

    pngs = sorted(glob.glob(osp.join(save_path, "samples-rgb", "*.png")))
    assert pngs
    return np.stack([iio.imread(p) for p in pngs])


def test_flagged_paths_match_default(bundle, tmp_path, monkeypatch):
    """One flagged render exercising SVC_FUSED_DECODE=1, SVC_COND_CACHE=0
    and stream_save=False together must reproduce the default render's
    frames to one uint8 quantization step."""
    monkeypatch.setenv("SVC_FUSED_DECODE", "0")
    monkeypatch.setenv("SVC_COND_CACHE", "1")
    base = _frames(_run_two_pass(bundle, tmp_path, "default"))

    monkeypatch.setenv("SVC_FUSED_DECODE", "1")
    monkeypatch.setenv("SVC_COND_CACHE", "0")
    flagged = _frames(
        _run_two_pass(
            bundle, tmp_path, "flagged", options_kw=dict(stream_save=False)
        )
    )
    assert flagged.shape == base.shape
    assert np.max(np.abs(flagged.astype(int) - base.astype(int))) <= 1


def test_sharded_bucket_drops_fused_post(tmp_path, monkeypatch):
    """With a ('data','view') mesh whose view axis divides T, the fused
    uint8 decode is dropped by sample_from_key (sharded buckets keep the
    separate decode) and sample_chunk's dtype sniff must route the latents
    through decode_async — same frames as the unsharded fused run."""
    from stable_virtual_camera_tpu.parallel.mesh import make_mesh

    monkeypatch.setenv("SVC_FUSED_DECODE", "1")
    plain = random_bundle(image_hw=(64, 64))
    base = _frames(_run_two_pass(plain, tmp_path, "plain_fused"))

    sharded = random_bundle(image_hw=(64, 64), mesh=make_mesh(n_data=1, n_view=3))
    out = _frames(_run_two_pass(sharded, tmp_path, "sharded_fused"))
    assert out.shape == base.shape
    assert np.max(np.abs(out.astype(int) - base.astype(int))) <= 1


def test_single_chip_chunk_batch(bundle, tmp_path, monkeypatch):
    """SVC_CHUNK_BATCH=2 (single-chip multi-chunk batched scan): B
    independent second-pass chunks vmap into one program with the same
    per-chunk keys — frames match the serial engine to one uint8
    quantization step (vmap+batched program vs per-chunk program compile
    variation, same tolerance as the mesh fan-out test)."""
    base = _frames(_run_two_pass(bundle, tmp_path, "serial_cb"))
    monkeypatch.setenv("SVC_CHUNK_BATCH", "2")
    batched = _frames(_run_two_pass(bundle, tmp_path, "batched_cb"))
    assert batched.shape == base.shape
    assert np.max(np.abs(batched.astype(int) - base.astype(int))) <= 1


def test_nonsquare_two_pass(tmp_path):
    """Non-square (Basic-workload-shaped) render: 128x64 images -> 16x8
    latents through the full two-pass engine. The published Basic workload
    is 768x576 (reference docs/GR_USAGE.md:64-69, demo_gr.py:140-177
    snapping); this is its tiny-scale shape analogue — rectangular latents
    through every attention layout (per-frame, joint t*h*w, time-mix)."""
    import imageio.v3 as iio

    rng = np.random.default_rng(5)
    n = 5
    imgs = (rng.uniform(0, 255, size=(n, 64, 128, 3))).astype(np.uint8)
    c2ws = random_c2ws(rng, n).astype(np.float32)[:, :3]
    Ks = np.repeat(
        np.array(
            [[1.2, 0.0, 0.5], [0.0, 1.8, 0.5], [0.0, 0.0, 1.0]], np.float32
        )[None],
        n,
        axis=0,
    )
    options = EngineOptions().update(
        dict(
            num_steps=2,
            cfg=[2.0, 2.0],
            guider_types=[1, 2],
            chunk_strategy="nearest",
            chunk_strategy_first_pass="gt",
            sampler_verbose=False,
            encoding_t=0,
            decoding_t=0,
            save_first_pass=False,
        )
    )
    bundle = random_bundle(image_hw=(64, 128))
    engine = SceneEngine(bundle, VersionConfig(H=64, W=128, T=3), options)
    prior_c2ws = random_c2ws(np.random.default_rng(3), 2).astype(np.float32)[
        :, :3
    ]
    save_path = osp.join(str(tmp_path), "nonsquare")
    paths = list(
        engine.run_one_scene(
            "img2trajvid",
            {
                "img": [im for im in imgs],
                "input_indices": [0],
                "prior_indices": [1.5, 3.5],
            },
            {
                "c2w": c2ws,
                "K": [k for k in Ks],
                "input_indices": list(range(n)),
            },
            save_path=save_path,
            use_traj_prior=True,
            traj_prior_Ks=None,
            traj_prior_c2ws=prior_c2ws,
            seed=23,
        )
    )
    assert paths
    pngs = sorted(
        __import__("glob").glob(osp.join(save_path, "samples-rgb", "*.png"))
    )
    assert len(pngs) == 4
    assert iio.imread(pngs[0]).shape == (64, 128, 3)


def test_vae_chunked_empty_batch_shape(bundle):
    """Zero-input encode/decode must return shape-correct empty arrays
    (r4 VERDICT weak #5: the old path returned a bare (0,) array)."""
    empty_imgs = np.zeros((0, 64, 64, 3), np.float32)
    lat = bundle.vae.encode(empty_imgs)
    assert lat.shape == (0, 8, 8, 4)
    out = bundle.vae.decode(np.zeros((0, 8, 8, 4), np.float32))
    assert out.shape == (0, 64, 64, 3)
    # cached wrapper with the cache disabled hits the same path
    lat2 = bundle.vae.encode_cached(empty_imgs)
    assert lat2.shape == (0, 8, 8, 4)


def test_deliver_pose_mismatch_falls_back(bundle, tmp_path):
    """deliver_anchors with a prior trajectory whose integer indices alias
    target ordinals but whose POSES differ must refuse delivery: outputs
    equal the deliver_anchors=False render exactly."""
    rng = np.random.default_rng(11)
    imgs, c2ws, Ks = _scene(rng, 5)
    # one INTEGER prior index (2.0) aliases a target ordinal at a DIFFERENT
    # pose (a direct caller's separate prior trajectory); the fractional
    # anchors keep every T=3 interp gap at <=1 target so the plan stays
    # feasible
    prior_c2ws = random_c2ws(np.random.default_rng(99), 5).astype(np.float32)[
        :, :3
    ]

    def run(subdir, deliver):
        options = EngineOptions().update(
            dict(
                num_steps=2,
                cfg=[2.0, 2.0],
                guider_types=[1, 2],
                chunk_strategy="interp",
                chunk_strategy_first_pass="gt",
                sampler_verbose=False,
                encoding_t=0,
                decoding_t=0,
                save_first_pass=False,
                deliver_anchors=deliver,
            )
        )
        engine = SceneEngine(bundle, VersionConfig(H=64, W=64, T=3), options)
        save_path = osp.join(str(tmp_path), subdir)
        list(
            engine.run_one_scene(
                "img2trajvid",
                {
                    "img": [im for im in imgs],
                    "input_indices": [0],
                    "prior_indices": [0.5, 1.5, 2.0, 2.5, 3.5],
                },
                {
                    "c2w": c2ws,
                    "K": [k for k in Ks],
                    "input_indices": list(range(len(imgs))),
                },
                save_path=save_path,
                use_traj_prior=True,
                traj_prior_Ks=None,
                traj_prior_c2ws=prior_c2ws,
                seed=23,
            )
        )
        return _frames(save_path)

    honest = run("no_deliver", deliver=False)
    guarded = run("deliver_mismatch", deliver=True)
    assert honest.shape == guarded.shape  # nothing was spliced
    np.testing.assert_array_equal(honest, guarded)
