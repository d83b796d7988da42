"""The checked-in golden scene (assets/golden_scene): an on-disk demo asset
mirroring the reference's `assets/basic` golden-path role (reference
demo_gr.py:56-98) — parser + engine e2e with NO synthesized inputs.

The scene is 3 ray-marched 64x64 views of a textured sphere on an orbit
(real parallax, deterministic pixels) in reconfusion format with a 1-input
train/test split."""

import os.path as osp

import numpy as np
import pytest

ASSET = osp.join(osp.dirname(__file__), "..", "assets", "golden_scene", "scene0")


def test_golden_scene_parses():
    from stable_virtual_camera_tpu.data.parsers import ReconfusionParser

    parser = ReconfusionParser(ASSET)
    assert len(parser.image_paths) == 3
    assert all(p is not None and osp.exists(p) for p in parser.image_paths)
    split = parser.splits_per_num_input_frames[1]
    assert split["train_ids"] == [0] and split["test_ids"] == [1, 2]
    c2ws = np.asarray(parser.camtoworlds)
    assert c2ws.shape == (3, 4, 4)
    # cameras orbit at radius 3 looking at the origin (OpenCV convention
    # after the parser's OpenGL flip)
    np.testing.assert_allclose(
        np.linalg.norm(c2ws[:, :3, 3], axis=-1), 3.06, atol=0.01
    )
    for K in parser.Ks_dict.values():
        np.testing.assert_allclose(np.asarray(K)[0, 0], 80.0)


def test_golden_scene_engine_e2e(tmp_path):
    """Asset-driven two-pass render through the SceneEngine (tiny random
    weights): images, poses and intrinsics all come from disk."""
    import imageio.v3 as iio

    from stable_virtual_camera_tpu.config import EngineOptions, VersionConfig
    from stable_virtual_camera_tpu.data.parsers import ReconfusionParser
    from stable_virtual_camera_tpu.engine.runner import SceneEngine
    from stable_virtual_camera_tpu.models.io import random_bundle

    parser = ReconfusionParser(ASSET)
    imgs = [iio.imread(p) for p in parser.image_paths]
    c2ws = np.asarray(parser.camtoworlds, np.float32)[:, :3]
    K = np.asarray(parser.Ks_dict[parser.camera_ids[0]], np.float32)
    Ks = np.repeat(K[None], len(imgs), 0)

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
    bundle = random_bundle(image_hw=(64, 64))
    engine = SceneEngine(bundle, VersionConfig(H=64, W=64, T=3), options)
    save_path = osp.join(str(tmp_path), "golden")
    paths = list(
        engine.run_one_scene(
            "img2trajvid",
            {
                "img": [im for im in imgs],
                "input_indices": [0],
                "prior_indices": [1.5],
            },
            {
                "c2w": c2ws,
                "K": [k for k in Ks],
                "input_indices": [0, 1, 2],
            },
            save_path=save_path,
            use_traj_prior=True,
            traj_prior_Ks=None,
            traj_prior_c2ws=c2ws[1:2],
            seed=23,
        )
    )
    assert paths and osp.exists(osp.join(save_path, "samples-rgb.mp4"))
    import glob

    pngs = sorted(glob.glob(osp.join(save_path, "samples-rgb", "*.png")))
    assert len(pngs) == 2  # both held-out test views rendered
    frame = iio.imread(pngs[0])
    assert frame.shape == (64, 64, 3)


@pytest.mark.slow
def test_golden_scene_cli(tmp_path):
    """The demo-compatible CLI end-to-end over the on-disk asset — the
    golden-path smoke the reference runs via its bundled assets."""
    from stable_virtual_camera_tpu.apps import cli as cli_mod

    data_dir = osp.dirname(ASSET)
    cli_mod.main(
        data_path=data_dir,
        task="img2trajvid",
        use_traj_prior=True,
        random_model=True,
        work_dir=str(tmp_path),
        num_steps=2,
        guider_types=[1, 2],
        cfg=[2.0, 2.0],
        sampler_verbose=False,
    )
    import glob

    vids = glob.glob(osp.join(str(tmp_path), "**", "samples-rgb.mp4"),
                     recursive=True)
    assert vids
