"""End-to-end engine tests with a tiny random ModelBundle: single-pass and
two-pass sampling produce the right files/shapes and are deterministic."""

import os.path as osp

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # engine-scale: minutes on this 1-core box

from stable_virtual_camera_tpu.config import EngineOptions, VersionConfig
from stable_virtual_camera_tpu.engine.runner import SceneEngine
from stable_virtual_camera_tpu.models.io import random_bundle

from conftest import random_c2ws


@pytest.fixture(scope="module")
def bundle():
    return random_bundle(image_hw=(64, 64))


def _scene(rng, n=6):
    imgs = (rng.uniform(0, 255, size=(n, 64, 64, 3))).astype(np.uint8)
    c2ws = random_c2ws(rng, n).astype(np.float32)[:, :3]
    Ks = np.repeat(
        np.array(
            [[1.2, 0.0, 0.5], [0.0, 1.2, 0.5], [0.0, 0.0, 1.0]], dtype=np.float32
        )[None],
        n,
        axis=0,
    )
    return imgs, c2ws, Ks


def _options(**kw):
    base = dict(
        num_steps=3,
        cfg=2.0,
        cfg_min=1.2,
        guider_types=1,
        chunk_strategy="nearest-gt",
        sampler_verbose=False,
        video_save_fps=5.0,
        encoding_t=0,
        decoding_t=0,
    )
    base.update(kw)
    return EngineOptions().update(base)


def _run(bundle, tmp_path, options, use_traj_prior=False, prior_indices=None,
         prior_c2ws=None, seed=23, subdir="out"):
    rng = np.random.default_rng(7)
    imgs, c2ws, Ks = _scene(rng)
    engine = SceneEngine(bundle, VersionConfig(H=64, W=64, T=3), options)
    image_cond = {
        "img": [im for im in imgs],
        "input_indices": [0],
        "prior_indices": prior_indices,
    }
    camera_cond = {
        "c2w": c2ws,
        "K": [k for k in Ks],
        "input_indices": list(range(len(imgs))),
    }
    save_path = osp.join(str(tmp_path), subdir)
    paths = list(
        engine.run_one_scene(
            "img2trajvid" if use_traj_prior else "img2vid",
            image_cond,
            camera_cond,
            save_path=save_path,
            use_traj_prior=use_traj_prior,
            traj_prior_Ks=None,
            traj_prior_c2ws=prior_c2ws,
            seed=seed,
        )
    )
    return save_path, paths


def test_single_pass_end_to_end(bundle, tmp_path):
    save_path, paths = _run(bundle, tmp_path, _options())
    assert osp.exists(paths[-1])
    assert osp.exists(osp.join(save_path, "samples-rgb.mp4"))
    assert osp.exists(osp.join(save_path, "input", ".mp4")) or osp.exists(
        osp.join(save_path, "input")
    )
    from stable_virtual_camera_tpu.utils.video import read_video

    frames = read_video(osp.join(save_path, "samples-rgb.mp4"))
    assert frames.shape[0] == 5  # 6 views - 1 input


def test_two_pass_end_to_end(bundle, tmp_path):
    rng = np.random.default_rng(3)
    prior_c2ws = random_c2ws(rng, 2).astype(np.float32)[:, :3]
    options = _options(
        chunk_strategy="nearest", chunk_strategy_first_pass="gt",
        guider_types=[1, 2], cfg=[2.0, 2.0],
    )
    save_path, paths = _run(
        bundle,
        tmp_path,
        options,
        use_traj_prior=True,
        prior_indices=[1.5, 3.5],
        prior_c2ws=prior_c2ws,
    )
    assert len(paths) == 2  # first-pass video + final video
    assert osp.exists(paths[0]) and osp.exists(paths[1])


def test_determinism(bundle, tmp_path):
    from stable_virtual_camera_tpu.utils.video import read_video

    p1, _ = _run(bundle, tmp_path, _options(), seed=5, subdir="a")
    p2, _ = _run(bundle, tmp_path, _options(), seed=5, subdir="b")
    p3, _ = _run(bundle, tmp_path, _options(), seed=9, subdir="c")
    a = read_video(osp.join(p1, "samples-rgb.mp4"))
    b = read_video(osp.join(p2, "samples-rgb.mp4"))
    c = read_video(osp.join(p3, "samples-rgb.mp4"))
    np.testing.assert_array_equal(a, b)
    assert np.abs(a.astype(int) - c.astype(int)).mean() > 0.5  # seed changes output


def test_two_pass_with_T_pair(bundle, tmp_path):
    """First/second pass with different context windows (T list), as the
    semi-dense regime produces (reference seva/eval.py:387,420)."""
    rng = np.random.default_rng(3)
    prior_c2ws = random_c2ws(rng, 3).astype(np.float32)[:, :3]
    options = _options(
        chunk_strategy="nearest", chunk_strategy_first_pass="gt",
        guider_types=[1, 2], cfg=[2.0, 2.0],
    )
    rng2 = np.random.default_rng(7)
    imgs, c2ws, Ks = _scene(rng2)
    from stable_virtual_camera_tpu.config import VersionConfig
    from stable_virtual_camera_tpu.engine.runner import SceneEngine

    engine = SceneEngine(bundle, VersionConfig(H=64, W=64, T=[4, 3]), options)
    image_cond = {
        "img": [im for im in imgs],
        "input_indices": [0],
        "prior_indices": [1.2, 2.5, 4.0],
    }
    camera_cond = {
        "c2w": c2ws,
        "K": [k for k in Ks],
        "input_indices": list(range(len(imgs))),
    }
    save_path = osp.join(str(tmp_path), "tpair")
    paths = list(
        engine.run_one_scene(
            "img2trajvid", image_cond, camera_cond, save_path=save_path,
            use_traj_prior=True, traj_prior_Ks=None, traj_prior_c2ws=prior_c2ws,
            seed=1,
        )
    )
    assert osp.exists(paths[-1])


def test_two_pass_interp_strategy(bundle, tmp_path):
    """Second pass with the `interp` chunk strategy (ordered targets
    bracketed between anchors)."""
    rng = np.random.default_rng(11)
    imgs, c2ws, Ks = _scene(rng, n=7)  # 1 input + 6 ordered targets
    # T=3 allows one target per anchor gap: anchors between every target
    prior_c2ws = c2ws[[2, 3, 4, 5, 6]]
    options = _options(
        chunk_strategy="interp", chunk_strategy_first_pass="gt",
        guider_types=[1, 2], cfg=[2.0, 2.0],
    )
    from stable_virtual_camera_tpu.config import VersionConfig
    from stable_virtual_camera_tpu.engine.runner import SceneEngine

    engine = SceneEngine(bundle, VersionConfig(H=64, W=64, T=3), options)
    image_cond = {
        "img": [im for im in imgs],
        "input_indices": [0],
        "prior_indices": [1.5, 2.5, 3.5, 4.5, 5.5],
    }
    camera_cond = {
        "c2w": c2ws,
        "K": [k for k in Ks],
        "input_indices": list(range(len(imgs))),
    }
    save_path = osp.join(str(tmp_path), "interp")
    paths = list(
        engine.run_one_scene(
            "img2trajvid", image_cond, camera_cond, save_path=save_path,
            use_traj_prior=True, traj_prior_Ks=None,
            traj_prior_c2ws=prior_c2ws, seed=2,
        )
    )
    assert osp.exists(paths[-1])
    from stable_virtual_camera_tpu.utils.video import read_video

    frames = read_video(osp.join(save_path, "samples-rgb.mp4"))
    assert frames.shape[0] == 6


def test_l_short_resizing(bundle, tmp_path):
    """L_short keeps aspect ratio; H/W are rewritten in the version config
    (reference seva/eval.py:1375-1398)."""
    from stable_virtual_camera_tpu.config import EngineOptions, VersionConfig
    from stable_virtual_camera_tpu.engine.runner import SceneEngine
    from PIL import Image

    rng = np.random.default_rng(5)
    img_path = tmp_path / "in.png"
    Image.fromarray(
        rng.uniform(0, 255, (96, 128, 3)).astype(np.uint8)
    ).save(img_path)

    options = EngineOptions().update(dict(L_short=64, sampler_verbose=False))
    version = VersionConfig(H=64, W=64, T=3, f=8)
    engine = SceneEngine(bundle, version, options)
    K = np.array([[100.0, 0, 64], [0, 100.0, 48], [0, 0, 1.0]], np.float32)
    image_cond = {"img": [str(img_path)], "input_indices": [0],
                  "prior_indices": None}
    camera_cond = {"c2w": np.eye(4, dtype=np.float32)[None, :3],
                   "K": [K], "input_indices": [0]}
    engine._prepare_images(image_cond, camera_cond)
    # 96x128 with shorter side -> 64 (stride 64): W = 128*64/96=85 -> snaps 64
    assert version.H == 64
    assert version.W % 64 == 0


def test_conditioning_caches_match_uncached(bundle):
    """encode_cached/embed_cached return what encode/embed return (same
    values up to compile-variation ulps from batch regrouping), hit the
    cache on repeats, and reset with clear_cache."""
    rng = np.random.default_rng(3)
    imgs = rng.uniform(-1, 1, size=(5, 64, 64, 3)).astype(np.float32)

    bundle.vae.clear_cache()
    ref = bundle.vae.encode(imgs)
    got = bundle.vae.encode_cached(imgs)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
    assert len(bundle.vae._enc_cache) == 5
    # repeat in a different order with one new frame: only the new one misses
    re = bundle.vae.encode_cached(imgs[[3, 1, 4, 0, 2]])
    np.testing.assert_allclose(re, got[[3, 1, 4, 0, 2]], rtol=0, atol=0)
    extra = rng.uniform(-1, 1, size=(1, 64, 64, 3)).astype(np.float32)
    both = bundle.vae.encode_cached(np.concatenate([imgs[:2], extra], 0))
    np.testing.assert_array_equal(both[:2], got[:2])
    assert len(bundle.vae._enc_cache) == 6
    bundle.vae.clear_cache()
    assert len(bundle.vae._enc_cache) == 0

    clip_imgs = rng.uniform(0, 1, size=(3, 64, 64, 3)).astype(np.float32)
    bundle.clip.clear_cache()
    ref_e = bundle.clip.embed(clip_imgs)
    got_e = bundle.clip.embed_cached(clip_imgs)
    np.testing.assert_allclose(got_e, ref_e, rtol=1e-5, atol=1e-5)
    re_e = bundle.clip.embed_cached(clip_imgs[[2, 0]])
    np.testing.assert_array_equal(re_e, got_e[[2, 0]])


def test_two_pass_economy_anchors(bundle, tmp_path):
    """min_anchor_fill=False (economy anchors, a TPU addition): the first pass
    runs at the shrunk T bucket with the feasibility-minimum anchor count, the
    second pass needs fewer chunks, and every target frame is still delivered."""
    from stable_virtual_camera_tpu.engine.prior import infer_prior_stats
    from stable_virtual_camera_tpu.utils.video import read_video

    rng = np.random.default_rng(11)
    # N=6 keeps the economy count (min+slack = 4) below the fill count (5)
    # at this tiny T; larger N at T=6 converges the two modes
    num_inputs, N, T = 1, 6, 6
    imgs = (rng.uniform(0, 255, size=(num_inputs + N, 64, 64, 3))).astype(np.uint8)
    c2ws = random_c2ws(rng, num_inputs + N).astype(np.float32)[:, :3]
    Ks = np.repeat(
        np.array(
            [[1.2, 0.0, 0.5], [0.0, 1.2, 0.5], [0.0, 0.0, 1.0]], dtype=np.float32
        )[None],
        num_inputs + N,
        axis=0,
    )

    results = {}
    for fill in (True, False):
        version = VersionConfig(H=64, W=64, T=T)
        options = _options(
            chunk_strategy="interp-gt", chunk_strategy_first_pass="gt-nearest",
            guider_types=[1, 2], cfg=[2.0, 2.0], min_anchor_fill=fill,
        )
        num_anchors = infer_prior_stats(T, num_inputs, N, version, options)
        anchor_idx = np.linspace(num_inputs, num_inputs + N - 1, num_anchors)
        engine = SceneEngine(bundle, version, options)
        save_path = osp.join(str(tmp_path), f"fill_{fill}")
        paths = list(
            engine.run_one_scene(
                "img2trajvid",
                {
                    "img": [im for im in imgs],
                    "input_indices": list(range(num_inputs)),
                    "prior_indices": anchor_idx.tolist(),
                },
                {
                    "c2w": c2ws,
                    "K": [k for k in Ks],
                    "input_indices": list(range(num_inputs + N)),
                },
                save_path=save_path,
                use_traj_prior=True,
                traj_prior_Ks=None,
                traj_prior_c2ws=c2ws[[round(i) for i in anchor_idx]],
                seed=23,
            )
        )
        frames = read_video(osp.join(save_path, "samples-rgb.mp4"))
        results[fill] = (num_anchors, version.T, frames.shape[0])

    assert results[True][0] > results[False][0]  # fewer anchors in economy mode
    assert results[False][1] == [results[False][0] + num_inputs, T]  # shrunk bucket
    assert results[True][2] == results[False][2] == N  # all targets delivered


def test_fused_decode_matches_default(bundle, tmp_path, monkeypatch):
    """SVC_FUSED_DECODE=1 (VAE uint8 decode traced into the second pass's
    keyed sampling program — one dispatch per chunk) produces the same
    frames as the default scan-then-decode path to one uint8 quantization
    step (compile variation across program boundaries)."""
    import glob

    import imageio.v3 as iio

    rng = np.random.default_rng(3)
    prior_c2ws = random_c2ws(rng, 2).astype(np.float32)[:, :3]
    kw = dict(
        chunk_strategy="nearest", chunk_strategy_first_pass="gt",
        guider_types=[1, 2], cfg=[2.0, 2.0],
    )

    def frames(subdir):
        save_path, _ = _run(
            bundle, tmp_path, _options(**kw), use_traj_prior=True,
            prior_indices=[1.5, 3.5], prior_c2ws=prior_c2ws, subdir=subdir,
        )
        pngs = sorted(glob.glob(osp.join(save_path, "samples-rgb", "*.png")))
        assert pngs
        return np.stack([iio.imread(p) for p in pngs])

    monkeypatch.setenv("SVC_FUSED_DECODE", "0")
    base = frames("unfused")
    monkeypatch.setenv("SVC_FUSED_DECODE", "1")
    fused = frames("fused")
    assert fused.shape == base.shape
    assert np.max(np.abs(fused.astype(int) - base.astype(int))) <= 1
