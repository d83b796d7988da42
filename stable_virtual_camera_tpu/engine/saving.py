"""Output writers: mp4 videos, per-frame PNGs, nerfstudio transforms.json.

Capability parity with reference seva/eval.py:952-1034 (`save_output`,
`create_transforms_simple`). Media-keyed sample dicts follow the reference's
"name/media" convention ("image" = mp4 + PNGs, "video" = mp4, "raw" = array
dump — we use .npy instead of torch .pt).
"""

from __future__ import annotations

import json
import os
import os.path as osp

import imageio.v3 as iio
import numpy as np

from stable_virtual_camera_tpu.utils.video import write_video


def to_uint8(value: np.ndarray) -> np.ndarray:
    """(N, H, W, 3) [-1, 1] float -> uint8. Already-uint8 frames (device-side
    quantization, AutoEncoderKL.decode_uint8 — byte-identical math) pass
    through untouched."""
    value = np.asarray(value)
    if value.dtype == np.uint8:
        return value
    v = (value.astype(np.float32) + 1.0) / 2.0
    return np.clip(v * 255.0, 0, 255).astype(np.uint8)


class StreamingFrameWriter:
    """Per-frame PNG writes on a background thread, overlapped with the
    device's denoise scans.

    `save_output`'s "image" media writes one PNG per frame after every chunk
    has finished; on a long trajectory that is seconds of pure host work at
    the tail of the render. A second-pass chunk knows each of its frames'
    FINAL index at flush time, so the PNG encodes can ride the idle host
    time under the next chunk's scan instead (the engine then passes
    `skip_png_keys` to `save_output` so nothing is written twice). Bytes on
    disk are identical to the synchronous path; `drain()` re-raises the
    first worker error."""

    def __init__(self, dir_path: str):
        import queue
        import threading

        self.dir = dir_path
        os.makedirs(dir_path, exist_ok=True)
        self._q: "queue.Queue" = queue.Queue()
        self._err: BaseException | None = None
        self._t = threading.Thread(
            target=self._run, name="svc-frame-writer", daemon=True
        )
        self._t.start()

    def submit(self, indices, frames) -> None:
        """Queue frames (any float/uint8 layout `to_uint8` accepts) to be
        written as `<dir>/<index:03d>.png`."""
        frames = to_uint8(np.asarray(frames))
        for i, frame in zip(indices, frames):
            self._q.put((int(i), frame))

    def _run(self) -> None:
        while True:
            item = self._q.get()
            if item is None:
                return
            try:
                i, frame = item
                iio.imwrite(osp.join(self.dir, f"{i:03d}.png"), frame)
            except BaseException as e:  # pragma: no cover - surfaced by drain
                if self._err is None:
                    self._err = e

    def drain(self) -> None:
        self._q.put(None)
        self._t.join()
        if self._err is not None:
            raise self._err


def save_output(
    samples: dict,
    save_path: str,
    video_save_fps: float = 2,
    skip_png_keys: tuple = (),
) -> None:
    os.makedirs(save_path, exist_ok=True)
    for sample in samples:
        media_type = "video"
        if "/" in sample:
            sample_, media_type = sample.split("/")
        else:
            sample_ = sample
        value = np.asarray(samples[sample])

        if media_type == "image":
            frames = to_uint8(value)
            write_video(
                osp.join(save_path, f"{sample_}.mp4") if sample_ else f"{save_path}.mp4",
                frames,
                fps=video_save_fps,
            )
            if sample_ in skip_png_keys:
                continue  # already streamed by a StreamingFrameWriter
            os.makedirs(osp.join(save_path, sample_), exist_ok=True)
            for i, frame in enumerate(frames):
                iio.imwrite(osp.join(save_path, sample_, f"{i:03d}.png"), frame)
        elif media_type == "video":
            frames = to_uint8(value)
            write_video(osp.join(save_path, f"{sample_}.mp4"), frames, fps=video_save_fps)
        elif media_type == "raw":
            np.save(osp.join(save_path, f"{sample_}.npy"), value)


def create_transforms_simple(save_path, img_paths, img_whs, c2ws, Ks) -> None:
    """nerfstudio-style transforms.json for generated cameras
    (reference seva/eval.py:1010-1034)."""
    out_frames = []
    for img_path, img_wh, c2w, K in zip(img_paths, img_whs, c2ws, Ks):
        K = np.asarray(K)
        out_frames.append(
            {
                "fl_x": float(K[0][0]),
                "fl_y": float(K[1][1]),
                "cx": float(K[0][2]),
                "cy": float(K[1][2]),
                "w": int(img_wh[0]),
                "h": int(img_wh[1]),
                "file_path": f"./{osp.relpath(img_path, start=save_path)}"
                if img_path is not None
                else None,
                "transform_matrix": np.asarray(c2w).tolist(),
            }
        )
    out = {"orientation_override": "none", "frames": out_frames}
    with open(osp.join(save_path, "transforms.json"), "w") as of:
        json.dump(out, of, indent=5)


# ---- media-keyed dict helpers (reference seva/eval.py:855-919) ----


def is_k_in_dict(d: dict, k: str) -> bool:
    return any(key.startswith(k) for key in d)


def get_k_from_dict(d: dict, k: str) -> np.ndarray:
    media_d = {}
    for key, value in d.items():
        if key == k:
            return value
        if key.startswith(k):
            media = key.split("/")[-1]
            if media == "raw":
                return value
            media_d[media] = value
    if len(media_d) == 0:
        return np.zeros((0,))
    assert len(media_d) == 1, f"multiple media found for key {k}: {media_d.keys()}"
    return next(iter(media_d.values()))


def update_kv_for_dict(d: dict, k: str, v) -> dict:
    for key in d:
        if key.startswith(k):
            d[key] = v
    return d


def extend_dict(ds: dict, d: dict) -> dict:
    for key, value in d.items():
        if key in ds:
            ds[key] = np.concatenate([ds[key], value], axis=0)
        else:
            ds[key] = value
    return ds


def replace_or_include_input_for_dict(
    samples: dict,
    test_indices,
    imgs: np.ndarray,
    c2w: np.ndarray,
    K: np.ndarray,
) -> dict:
    """Splice ground-truth input frames back into output sequences
    (reference seva/eval.py:893-919)."""
    samples_new = {}
    for sample, value in samples.items():
        if "rgb" in sample:
            # generated frames may arrive pre-quantized from the device
            # (decode_uint8); quantize the gt inputs the same way before
            # splicing so dtypes agree and bytes match the all-float path
            imgs = to_uint8(imgs) if value.dtype == np.uint8 else imgs.copy()
            imgs[test_indices] = (
                value[test_indices] if value.shape[0] == imgs.shape[0] else value
            )
            samples_new[sample] = imgs
        elif "c2w" in sample:
            c2w = c2w.copy()
            c2w[test_indices] = (
                value[test_indices] if value.shape[0] == c2w.shape[0] else value
            )
            samples_new[sample] = c2w
        elif "intrinsics" in sample:
            K = K.copy()
            K[test_indices] = (
                value[test_indices] if value.shape[0] == K.shape[0] else value
            )
            samples_new[sample] = K
        else:
            samples_new[sample] = value
    return samples_new


def decode_output(samples, T: int, indices=None) -> dict:
    """Normalize sampler output into a media-keyed dict, selecting test frames
    (reference seva/eval.py:922-949)."""
    if isinstance(samples, dict):
        out = {}
        for sample, value in samples.items():
            value = np.asarray(value)
            if indices is not None and value.shape[0] == T:
                value = value[indices]
            out[sample] = value
        return out
    samples = np.asarray(samples)
    if indices is not None and samples.shape[0] == T:
        samples = samples[indices]
    return {"samples-rgb/image": samples}
