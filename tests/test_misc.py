"""Small-surface tests: EngineOptions accessors, cv2 video IO roundtrip,
PSNR/SSIM metrics, stage timer."""

import numpy as np
import pytest


def test_engine_options_accessors():
    from stable_virtual_camera_tpu.config import EngineOptions

    o = EngineOptions()
    assert o.get("cfg") == 2.0
    assert o.get("nonexistent", 42) == 42
    o.set("cfg", [3.0, 2.0])
    assert o.get("cfg") == [3.0, 2.0]
    o.set("custom_key", "v")
    assert o.get("custom_key") == "v"
    o.update({"num_steps": 10, "another": 1})
    d = o.to_dict()
    assert d["num_steps"] == 10 and d["another"] == 1 and "extras" not in d


def test_video_roundtrip(tmp_path):
    from stable_virtual_camera_tpu.utils.video import read_video, write_video

    rng = np.random.default_rng(0)
    # smooth frames so lossy mp4 stays recognizable
    yy, xx = np.mgrid[0:48, 0:64].astype(np.float32)
    frames = np.stack(
        [
            np.stack([(xx + 3 * i) % 64 / 64, yy / 48, np.full_like(xx, 0.5)], -1)
            for i in range(6)
        ]
    )
    frames = (frames * 255).astype(np.uint8)
    path = str(tmp_path / "v.mp4")
    write_video(path, frames, fps=5)
    back = read_video(path)
    assert back.shape == frames.shape
    assert np.abs(back.astype(int) - frames.astype(int)).mean() < 12


def test_psnr_ssim_known_values(rng):
    from benchmark.metrics import psnr, ssim

    img = rng.uniform(0, 1, (64, 64, 3))
    assert psnr(img, img) == float("inf")
    assert ssim(img, img) == pytest.approx(1.0, abs=1e-6)
    noisy = np.clip(img + rng.normal(scale=0.1, size=img.shape), 0, 1)
    p = psnr(noisy, img)
    assert 18 < p < 22  # sigma 0.1 => ~20 dB
    assert 0 < ssim(noisy, img) < 1


def test_stage_timer():
    from stable_virtual_camera_tpu.utils.profiling import StageTimer

    t = StageTimer()
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    with t.stage("b"):
        pass
    report = t.report()
    assert "a" in report and "b" in report
    assert t.counts["a"] == 2


def test_preprocessor_fallback():
    from stable_virtual_camera_tpu.apps.preprocessor import (
        dust3r_available,
        estimate_poses_fallback,
    )

    assert not dust3r_available()  # not bundled in this image
    c2ws, Ks = estimate_poses_fallback([(480, 640), (480, 640)])
    assert c2ws.shape == (2, 4, 4)
    np.testing.assert_allclose(c2ws[0], np.eye(4))
    assert Ks.shape == (2, 3, 3)
    assert Ks[0, 0, 2] == pytest.approx(320)  # cx = W/2


def test_streaming_frame_writer_matches_sync_save(tmp_path):
    """StreamingFrameWriter (background per-frame PNGs, engine stream_save)
    produces byte-identical files to save_output's synchronous PNG loop,
    including out-of-order submission and the skip_png_keys handoff."""
    import os.path as osp

    from stable_virtual_camera_tpu.engine.saving import (
        StreamingFrameWriter,
        save_output,
    )

    rng = np.random.default_rng(5)
    frames = rng.uniform(-1, 1, size=(7, 16, 16, 3)).astype(np.float32)
    sync_dir = str(tmp_path / "sync")
    save_output({"samples-rgb/image": frames}, sync_dir, video_save_fps=4)

    stream_dir = str(tmp_path / "stream")
    writer = StreamingFrameWriter(osp.join(stream_dir, "samples-rgb"))
    # chunks flush out of order in the data-parallel path; indices are final
    writer.submit([4, 5, 6], frames[4:])
    writer.submit([0, 1, 2, 3], frames[:4])
    save_output(
        {"samples-rgb/image": frames},
        stream_dir,
        video_save_fps=4,
        skip_png_keys=("samples-rgb",),
    )
    writer.drain()

    for i in range(7):
        a = open(osp.join(sync_dir, "samples-rgb", f"{i:03d}.png"), "rb").read()
        b = open(osp.join(stream_dir, "samples-rgb", f"{i:03d}.png"), "rb").read()
        assert a == b, f"frame {i} differs"
    # the mp4 is still written by save_output on both paths
    assert osp.exists(osp.join(stream_dir, "samples-rgb.mp4"))


def test_streaming_frame_writer_drain_raises(tmp_path):
    """A worker-side write failure surfaces at drain(), not silently."""
    from stable_virtual_camera_tpu.engine.saving import StreamingFrameWriter

    writer = StreamingFrameWriter(str(tmp_path / "d"))
    bad = np.zeros((1, 4, 4, 3), np.float32)
    import shutil

    shutil.rmtree(str(tmp_path / "d"))  # rip the directory out from under it
    writer.submit([0], bad)
    with pytest.raises(Exception):
        writer.drain()
