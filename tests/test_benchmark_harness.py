"""Benchmark harness tests: evaluate_split scoring and the reconfusion
export tool roundtrip."""

import json

import numpy as np
import pytest
from PIL import Image

from conftest import random_c2ws


@pytest.fixture()
def scene_with_preds(tmp_path, rng):
    scene = tmp_path / "scene"
    (scene / "images").mkdir(parents=True)
    pred_dir = tmp_path / "pred" / "samples-rgb"
    pred_dir.mkdir(parents=True)
    n = 5
    c2ws = random_c2ws(rng, n)
    c2ws[:, :, [1, 2]] *= -1
    frames = []
    test_ids = [1, 2, 3, 4]
    for i in range(n):
        img = (rng.uniform(0, 255, (64, 64, 3))).astype(np.uint8)
        name = f"images/frame_{i:03d}.png"
        Image.fromarray(img).save(scene / name)
        frames.append(
            {
                "file_path": f"./{name}",
                "transform_matrix": c2ws[i].tolist(),
                "fl_x": 80.0, "fl_y": 80.0, "cx": 32.0, "cy": 32.0,
                "w": 64, "h": 64,
            }
        )
        if i in test_ids:
            noisy = np.clip(
                img.astype(int) + rng.integers(-12, 13, img.shape), 0, 255
            ).astype(np.uint8)
            Image.fromarray(noisy).save(
                pred_dir / f"{test_ids.index(i):03d}.png"
            )
    with open(scene / "transforms.json", "w") as f:
        json.dump({"frames": frames}, f)
    with open(scene / "train_test_split_1.json", "w") as f:
        json.dump({"train_ids": [0], "test_ids": test_ids}, f)
    return scene, tmp_path / "pred"


def test_evaluate_split(scene_with_preds):
    from benchmark.metrics import evaluate_split

    scene, pred = scene_with_preds
    res = evaluate_split(str(pred), str(scene), num_input_frames=1)
    assert res["num_frames"] == 4
    assert 25 < res["psnr"] < 40  # +-12 uniform noise
    assert 0 < res["ssim"] <= 1


def test_export_reconfusion_roundtrip(tmp_path, rng):
    import sys

    sys.path.insert(0, "/root/repo")
    from benchmark.export_reconfusion import build_transforms, create_train_test_split

    sub = tmp_path / "capture"
    sub.mkdir()
    n = 12
    c2ws = random_c2ws(rng, n)
    for i in range(n):
        img = (rng.uniform(0, 255, (32, 32, 3))).astype(np.uint8)
        Image.fromarray(img).save(sub / f"frame_{i:03d}.png")
        with open(sub / f"frame_{i:03d}.json", "w") as f:
            json.dump(
                {
                    "K": [[1.2, 0, 0.5], [0, 1.2, 0.5], [0, 0, 1]],
                    "c2w": c2ws[i].tolist(),
                },
                f,
            )
    frames = build_transforms(str(sub))
    assert len(frames) == n
    split_path = sub / "train_test_split_3.json"
    create_train_test_split(frames, 3, str(split_path))
    with open(split_path) as f:
        split = json.load(f)
    assert len(split["train_ids"]) == 3
    assert set(split["train_ids"]).isdisjoint(split["test_ids"])
    assert len(split["test_ids"]) == n - 3

    # the exported scene parses back through the benchmark parser
    from stable_virtual_camera_tpu.data.parsers import ReconfusionParser

    parser = ReconfusionParser(str(sub))
    assert parser.camtoworlds.shape == (n, 4, 4)
    # OpenGL flip roundtrips back to the original OpenCV poses
    np.testing.assert_allclose(parser.camtoworlds, c2ws, atol=1e-8)
