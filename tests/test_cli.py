"""CLI smoke test: a tiny reconfusion scene on disk driven end-to-end through
the demo-compatible CLI with a random tiny bundle."""

import json
import os.path as osp

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # engine-scale: minutes on this 1-core box
from PIL import Image

from conftest import random_c2ws


@pytest.fixture()
def reconfusion_scene(tmp_path, rng):
    """Write a minimal reconfusion-format scene: 6 frames, 1 input."""
    scene = tmp_path / "data" / "scene0"
    scene.mkdir(parents=True)
    n = 6
    c2ws_cv = random_c2ws(rng, n)  # OpenCV convention
    c2ws_gl = c2ws_cv.copy()
    c2ws_gl[:, :, [1, 2]] *= -1  # parser flips back
    frames = []
    for i in range(n):
        img = (rng.uniform(0, 255, (64, 64, 3))).astype(np.uint8)
        name = f"images/frame_{i:03d}.png"
        (scene / "images").mkdir(exist_ok=True)
        Image.fromarray(img).save(scene / name)
        frames.append(
            {
                "file_path": f"./{name}",
                "transform_matrix": c2ws_gl[i].tolist(),
                "fl_x": 80.0,
                "fl_y": 80.0,
                "cx": 32.0,
                "cy": 32.0,
                "w": 64,
                "h": 64,
            }
        )
    with open(scene / "transforms.json", "w") as f:
        json.dump({"frames": frames}, f)
    with open(scene / "train_test_split_1.json", "w") as f:
        json.dump({"train_ids": [0], "test_ids": list(range(1, n))}, f)
    return scene


def test_cli_img2trajvid_smoke(reconfusion_scene, tmp_path):
    from stable_virtual_camera_tpu.apps import cli

    work_dir = str(tmp_path / "work")
    cli.main(
        data_path=str(reconfusion_scene.parent),
        task="img2trajvid",
        use_traj_prior=True,
        random_model=True,
        work_dir=work_dir,
        num_steps=2,
        guider_types=[1, 2],
        cfg=[2.0, 2.0],
        sampler_verbose=False,
        save_first_pass=True,
    )
    out_dir = osp.join(work_dir, "img2trajvid", "scene0")
    assert osp.exists(osp.join(out_dir, "samples-rgb.mp4"))
    assert osp.exists(osp.join(out_dir, "transforms.json"))
    with open(osp.join(out_dir, "transforms.json")) as f:
        tj = json.load(f)
    assert len(tj["frames"]) == 6


def test_dataset_over_reconfusion(reconfusion_scene):
    from stable_virtual_camera_tpu.data import Dataset, get_parser

    parser = get_parser("reconfusion", data_dir=str(reconfusion_scene))
    assert len(parser.image_paths) == 6
    assert parser.camtoworlds.shape == (6, 4, 4)
    train = Dataset(parser, split="train", num_input_frames=1)
    test = Dataset(parser, split="test", num_input_frames=1)
    assert len(train) == 1 and len(test) == 5
    item = test[0]
    assert item["image"].shape == (64, 64, 3)
    assert item["K"].shape == (3, 3)


def test_cli_img2trajvid_s_prob_smoke(tmp_path, rng):
    """Single unposed image -> preset orbit trajectory (two-pass), through the
    CLI's parse_task (reference demo.py:81-118)."""
    from PIL import Image

    from stable_virtual_camera_tpu.apps import cli

    data = tmp_path / "imgs"
    data.mkdir()
    Image.fromarray(
        rng.uniform(0, 255, (64, 64, 3)).astype(np.uint8)
    ).save(data / "scene_a.png")

    work_dir = str(tmp_path / "work")
    cli.main(
        data_path=str(data),
        task="img2trajvid_s-prob",
        use_traj_prior=True,
        random_model=True,
        work_dir=work_dir,
        num_steps=2,
        guider_types=[1, 2],
        cfg=[2.0, 2.0],
        traj_prior="orbit",
        num_targets=4,
        sampler_verbose=False,
    )
    out_dir = osp.join(work_dir, "img2trajvid_s-prob", "scene_a")
    assert osp.exists(osp.join(out_dir, "samples-rgb.mp4"))
    from stable_virtual_camera_tpu.utils.video import read_video

    assert read_video(osp.join(out_dir, "samples-rgb.mp4")).shape[0] == 4


def test_cli_img2img_single_pass(reconfusion_scene, tmp_path):
    from stable_virtual_camera_tpu.apps import cli

    work_dir = str(tmp_path / "work2")
    cli.main(
        data_path=str(reconfusion_scene.parent),
        task="img2img",
        random_model=True,
        work_dir=work_dir,
        num_steps=2,
        chunk_strategy="nearest-gt",
        sampler_verbose=False,
    )
    out_dir = osp.join(work_dir, "img2img", "scene0")
    assert osp.exists(osp.join(out_dir, "samples-rgb.mp4"))
    assert osp.exists(osp.join(out_dir, "transforms.json"))
