"""End-to-end scenario benchmark: the baseline's OWN workload.

BASELINE.md's 0.54 f/s H100+compile number is a full Advanced-mode render —
134 frames @ 576x576, both passes, chunk boundaries, autoregressive first
pass, save I/O (docs/GR_USAGE.md:68-69: 16 s first + 234 s second). The
driver headline bench (bench.py) times one 21-frame chunk's
denoise+decode+cond; this script runs the full scenario through the CLI
(synthetic reconfusion scene on disk, full-scale bf16 random weights via
--random_model full) and reports frames / total wall seconds — directly
comparable to 134/250 = 0.54.

Usage (real TPU): python benchmark/e2e_bench.py [--frames 134] [--steps 50]
First run pays one-time compiles for both pass shapes (several minutes).
"""

from __future__ import annotations

import argparse
import json
import os
import os.path as osp
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
from PIL import Image


def write_scene(root: str, n_input: int, n_test: int, hw: int) -> None:
    """Minimal reconfusion-format scene: orbit cameras, noise images for the
    inputs (the model is random anyway — timing is shape-dependent only)."""
    from stable_virtual_camera_tpu.core.camera import get_default_intrinsics
    from stable_virtual_camera_tpu.core.trajectories import get_preset_pose_fov

    scene = osp.join(root, "scene0")
    os.makedirs(osp.join(scene, "images"), exist_ok=True)
    n = n_input + n_test
    c2ws, fovs = get_preset_pose_fov(  # (N, 4, 4), (N,)
        "orbit", n, start_w2c=np.eye(4), look_at=np.array([0.0, 0.0, 1.0])
    )
    K = np.asarray(get_default_intrinsics(float(fovs[0]), aspect_ratio=1.0))[0]
    # reconfusion transforms.json uses OpenGL; the parser flips back
    c2ws_gl = np.asarray(c2ws).copy()
    c2ws_gl[:, :, [1, 2]] *= -1
    rng = np.random.default_rng(0)
    frames = []
    for i in range(n):
        name = f"images/frame_{i:03d}.png"
        if i < n_input:
            Image.fromarray(
                rng.uniform(0, 255, (hw, hw, 3)).astype(np.uint8)
            ).save(osp.join(scene, name))
        frames.append(
            {
                "file_path": f"./{name}" if i < n_input else None,
                "transform_matrix": c2ws_gl[i].tolist(),
                "fl_x": float(K[0, 0]) * hw,
                "fl_y": float(K[1, 1]) * hw,
                "cx": hw / 2.0,
                "cy": hw / 2.0,
                "w": hw,
                "h": hw,
            }
        )
    import json as _json

    with open(osp.join(scene, "transforms.json"), "w") as f:
        _json.dump({"frames": frames}, f)
    with open(osp.join(scene, f"train_test_split_{n_input}.json"), "w") as f:
        _json.dump(
            {
                "train_ids": list(range(n_input)),
                "test_ids": list(range(n_input, n)),
            },
            f,
        )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=134)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--hw", type=int, default=576)
    ap.add_argument("--inputs", type=int, default=3)
    ap.add_argument("--work_dir", default="/tmp/e2e_bench_work")
    ap.add_argument("--scene_dir", default="/tmp/e2e_bench_scene")
    ap.add_argument("--random_model", default="full", choices=["full", "tiny"])
    ap.add_argument(
        "--T",
        type=int,
        default=None,
        help="context-window override (tiny CPU validation: pass 5 to reuse "
        "the test suite's compiled T=5 bucket; the full run keeps T=21)",
    )
    args = ap.parse_args()

    for d in (args.work_dir, args.scene_dir):
        shutil.rmtree(d, ignore_errors=True)
    write_scene(args.scene_dir, args.inputs, args.frames, args.hw)

    from stable_virtual_camera_tpu.apps import cli

    t0 = time.perf_counter()
    cli.main(
        data_path=args.scene_dir,
        task="img2trajvid",
        use_traj_prior=True,
        random_model=args.random_model,
        work_dir=args.work_dir,
        num_steps=args.steps,
        guider_types=[1, 2],
        cfg=[4.0, 2.0],
        sampler_verbose=False,
        **({"T": args.T} if args.T else {}),
    )
    total = time.perf_counter() - t0
    fps = args.frames / total
    print(
        json.dumps(
            {
                "metric": "frames_per_sec_e2e_advanced",
                "value": round(fps, 4),
                "unit": "frames/sec",
                "vs_baseline": round(fps / 0.54, 3),
                "detail": {
                    "frames": args.frames,
                    "total_s": round(total, 1),
                    "steps": args.steps,
                    "hw": args.hw,
                    "includes_compile": True,
                },
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
