"""Benchmark harness tests: evaluate_split scoring and the reconfusion
export tool roundtrip."""

import json

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # engine-scale: minutes on this 1-core box
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


def test_benchmark_entries_table():
    """The 17-entry table is machine-readable and matches the reference's
    documented per-entry processing (reference benchmark/README.md:6-148,
    docs/CLI_USAGE.md:60-110)."""
    from benchmark.entries import ENTRIES, cli_flags, eval_kwargs

    assert len(ENTRIES) == 17
    # center-crop-to-576 entries have no L_short; V-splits are the inverse
    for path, e in ENTRIES.items():
        assert (e.center_crop_input == 576) != (e.l_short == 576), path
    # V splits: L_short input + center-crop post + T=25
    for path in ("re10k-viewcrafter", "co3d-viewcrafter", "tnt-viewcrafter"):
        e = ENTRIES[path]
        assert e.l_short == 576 and e.post_center_crop == 576 and e.T == 25
        assert cli_flags(e, 2)["T"] == 25 and cli_flags(e, 2)["L_short"] == 576
    # 4DiM + pixelSplat post-resize to 256
    assert ENTRIES["re10k-4dim"].post_resize == 256
    assert ENTRIES["re10k-pixelsplat"].post_resize == 256
    assert eval_kwargs(ENTRIES["re10k-4dim"]) == {
        "center_crop": None, "resize_to": 256,
    }
    # RE10K single-view cfg rule
    assert cli_flags(ENTRIES["re10k"], 1)["cfg"] == 6.0
    assert "cfg" not in cli_flags(ENTRIES["re10k"], 3)
    # single-view camera-scale sweep: 20 values 0.1..2.0
    sweep = cli_flags(ENTRIES["llff"], 1)["camera_scale_sweep"]
    assert len(sweep) == 20 and sweep[0] == 0.1 and sweep[-1] == 2.0
    # semi-dense T extension only at 32 views
    assert "T" not in cli_flags(ENTRIES["dl3dv140"], 3)
    assert cli_flags(ENTRIES["dl3dv140"], 32)["T"] == 90
    assert cli_flags(ENTRIES["tnt-longlrm"], 32)["T"] == 80
    # CO3D orbit prior + nearest-gt
    f = cli_flags(ENTRIES["co3d"], 3)
    assert f["use_traj_prior"] and f["traj_prior"] == "orbit"
    assert f["chunk_strategy"] == "nearest-gt"


@pytest.fixture()
def benchmark_tree(tmp_path, rng):
    """A benchmark_dir with one synthetic re10k scene (reconfusion format),
    mirroring how the reference's benchmark.zip unpacks."""
    scene = tmp_path / "benchmark" / "re10k" / "scene000"
    (scene / "images").mkdir(parents=True)
    n = 5
    c2ws = random_c2ws(rng, n)
    c2ws[:, :, [1, 2]] *= -1  # parser flips OpenGL -> OpenCV
    frames = []
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
    with open(scene / "transforms.json", "w") as f:
        json.dump({"frames": frames}, f)
    with open(scene / "train_test_split_1.json", "w") as f:
        json.dump({"train_ids": [0], "test_ids": list(range(1, n))}, f)
    return tmp_path / "benchmark"


def test_run_eval_dry_run(benchmark_tree, tmp_path, monkeypatch):
    """The one-command weights -> generate -> score path, end-to-end with a
    random tiny model (VERDICT r2 next-item 4): the day real weights exist,
    only --checkpoint_dir changes."""
    import benchmark.entries as entries_mod
    from benchmark.run_eval import run_eval

    # 2-value sweep instead of the 20-value reference sweep (single-view rule)
    monkeypatch.setattr(
        entries_mod, "SINGLE_VIEW_CAMERA_SCALES", [1.0, 2.0]
    )

    out_json = str(tmp_path / "scores.json")
    results = run_eval(
        benchmark_dir=str(benchmark_tree),
        random_model=True,
        entries=["re10k"],
        work_dir=str(tmp_path / "work"),
        sweep=True,
        out=out_json,
        num_steps=2,
        sampler_verbose=False,
    )
    scores = results["re10k"]
    assert scores["num_scenes"] == 1
    assert "psnr" in scores and "ssim" in scores
    assert 0 < scores["ssim"] <= 1
    # the sweep kept the best-psnr camera scale of the two
    assert scores["per_scene"][0]["camera_scale"] in (1.0, 2.0)
    # entries without data are reported as skipped, not errors
    results2 = run_eval(
        benchmark_dir=str(benchmark_tree),
        random_model=True,
        entries=["llff"],
        work_dir=str(tmp_path / "work2"),
    )
    assert "skipped" in results2["llff"]

    with open(out_json) as f:
        assert "re10k" in json.load(f)
