"""Convert a dataset of per-frame (image, {K, c2w}) json pairs into the
reconfusion benchmark format, with K-means train/test splits.

Capability parity with reference benchmark/export_reconfusion_example.py:
same transforms.json layout (OpenGL-flipped poses, pixel intrinsics) and the
same split rule — train views are the frames closest to K-means centers over
(position, viewdir) 6-vectors, test views are the strided remainder. K-means
via scipy (sklearn is not bundled in this image).

Usage:
  python benchmark/export_reconfusion.py --subfolder DIR --n 3 [--stride 1]
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np
from PIL import Image


def build_transforms(subfolder: str) -> list[dict]:
    frames = []
    for file in sorted(os.listdir(subfolder)):
        if not file.endswith(".json") or file.startswith(
            ("transforms", "train_test_split")
        ):
            continue
        with open(os.path.join(subfolder, file)) as f:
            data = json.load(f)
        image_path = os.path.join(subfolder, file.replace(".json", ".png"))
        if not os.path.exists(image_path):
            print(f"Image file not found for {file}, skipping...")
            continue
        with Image.open(image_path) as img:
            w, h = img.size
        K = data["K"]
        transform_matrix = np.array(data["c2w"])
        transform_matrix[..., [1, 2]] *= -1  # OpenCV -> OpenGL
        frames.append(
            {
                "fl_x": K[0][0] * w,
                "fl_y": K[1][1] * h,
                "cx": K[0][2] * w,
                "cy": K[1][2] * h,
                "w": w,
                "h": h,
                "file_path": f"./{os.path.relpath(image_path, subfolder)}",
                "transform_matrix": transform_matrix.tolist(),
            }
        )
    with open(os.path.join(subfolder, "transforms.json"), "w") as f:
        json.dump({"orientation_override": "none", "frames": frames}, f, indent=4)
    return frames


def kmeans_train_ids(frames: list[dict], n: int, seed: int = 42) -> list[int]:
    """Train views = frames nearest the K-means centers of (pos, dir)."""
    from scipy.cluster.vq import kmeans2

    feats = []
    for frame in frames:
        m = np.array(frame["transform_matrix"])
        pos = m[:3, 3]
        direction = m[:3, 2] / np.linalg.norm(m[:3, 2])
        feats.append(np.concatenate([pos, direction]))
    feats = np.array(feats)
    centers, _ = kmeans2(feats, n, seed=seed, minit="++")
    train_ids = []
    for center in centers:
        train_ids.append(int(np.argmin(np.linalg.norm(feats - center, axis=1))))
    return train_ids


def create_train_test_split(
    frames: list[dict], n: int, output_path: str, stride: int = 1
) -> None:
    train_ids = kmeans_train_ids(frames, n)
    remaining = sorted(set(range(len(frames))) - set(train_ids))
    test_ids = [int(i) for i in remaining[::stride]]
    with open(output_path, "w") as f:
        json.dump({"train_ids": sorted(train_ids), "test_ids": test_ids}, f, indent=4)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--subfolder", required=True)
    parser.add_argument("--n", type=int, required=True)
    parser.add_argument("--stride", type=int, default=1)
    args = parser.parse_args()
    frames = build_transforms(args.subfolder)
    create_train_test_split(
        frames,
        args.n,
        os.path.join(args.subfolder, f"train_test_split_{args.n}.json"),
        args.stride,
    )
