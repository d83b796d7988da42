"""Tests for the KB splines and the headless camera-trajectory editor core."""

import numpy as np
import pytest

from stable_virtual_camera_tpu.apps.trajectory import (
    CameraTrajectoryCore,
    Keyframe,
    get_intrinsics,
)
from stable_virtual_camera_tpu.core.kb_splines import (
    KochanekBartels,
    KochanekBartelsQuaternion,
    quat_from_matrix,
    quat_to_matrix,
)
from stable_virtual_camera_tpu.core.trajectories import rotvec_to_rotmat

from conftest import random_c2ws


def test_kb_interpolates_keyframes():
    pts = np.array([[0.0, 0, 0], [1, 2, 0], [3, 1, -1], [4, 4, 4]])
    sp = KochanekBartels(pts)
    for i, p in enumerate(pts):
        np.testing.assert_allclose(sp.evaluate(float(i)), p, atol=1e-12)
    # continuity at knots
    eps = 1e-6
    for i in [1, 2]:
        np.testing.assert_allclose(
            sp.evaluate(i - eps), sp.evaluate(i + eps), atol=1e-4
        )


def test_kb_closed_wraps():
    pts = np.array([[0.0, 0], [1, 0], [1, 1], [0, 1]])
    sp = KochanekBartels(pts, endconditions="closed")
    np.testing.assert_allclose(sp.evaluate(0.0), sp.evaluate(4.0), atol=1e-12)


def test_kb_scalar_spline():
    vals = np.array([1.0, 2.0, 0.5, 3.0])
    sp = KochanekBartels(vals)
    assert np.isscalar(float(sp.evaluate(1.5)))
    np.testing.assert_allclose(sp.evaluate(2.0), 0.5, atol=1e-12)


def test_quat_roundtrip(rng):
    c2ws = random_c2ws(rng, 5)
    R = c2ws[:, :3, :3]
    q = quat_from_matrix(R)
    np.testing.assert_allclose(quat_to_matrix(q), R, atol=1e-10)


def test_quat_kb_interpolates_and_stays_unit():
    rots = rotvec_to_rotmat(
        np.array([[0.0, 0, 0], [0, 0.5, 0], [0.3, 1.0, 0.2], [0, 1.5, 0.5]])
    )
    quats = quat_from_matrix(rots)
    sp = KochanekBartelsQuaternion(quats)
    for i, q in enumerate(quats):
        qi = sp.evaluate(float(i))
        # same rotation up to sign
        assert min(np.linalg.norm(qi - q), np.linalg.norm(qi + q)) < 1e-8
    ts = np.linspace(0, 3, 50)
    qs = sp.evaluate(ts)
    np.testing.assert_allclose(np.linalg.norm(qs, axis=-1), 1.0, atol=1e-9)
    # rotation matrices vary smoothly
    Rs = quat_to_matrix(qs)
    diffs = np.linalg.norm(np.diff(Rs, axis=0), axis=(1, 2))
    assert diffs.max() < 0.2


def test_camera_trajectory_core(rng):
    core = CameraTrajectoryCore(scene_scale=1.0)
    core.default_fov = 0.9
    core.default_transition_sec = 2.0
    core.framerate = 10.0
    c2ws = random_c2ws(rng, 4)
    for c2w in c2ws:
        core.add_keyframe(Keyframe.from_c2w(c2w, 0.9, 1.0))

    assert core.compute_duration() == pytest.approx(6.0)
    cumsum = core.compute_transition_times_cumsum()
    np.testing.assert_allclose(cumsum, [0, 2, 4, 6])

    # per-keyframe transition override changes timing
    core.keyframes[2].override_transition_enabled = True
    core.keyframes[2].override_transition_sec = 4.0
    assert core.compute_duration() == pytest.approx(8.0)

    traj = core.get_camera_traj_list((64, 48))
    assert traj is not None and len(traj) == 80
    w2c0 = np.array(traj[0]["w2c"]).reshape(4, 4)
    np.testing.assert_allclose(
        np.linalg.inv(w2c0)[:3, 3], c2ws[0][:3, 3], atol=1e-6
    )
    K = np.array(traj[0]["K"]).reshape(3, 3)
    np.testing.assert_allclose(K, get_intrinsics(64, 48, 0.9))

    # pose at t=0 equals first keyframe's rotation
    c2w0, fov0 = core.interpolate_pose_and_fov_rad(0.0)
    np.testing.assert_allclose(c2w0[:3, :3], c2ws[0][:3, :3], atol=1e-8)
    assert fov0 == pytest.approx(0.9)


def test_preset_keyframes(rng):
    from stable_virtual_camera_tpu.core.trajectories import get_preset_pose_fov

    poses, fovs = get_preset_pose_fov(
        "orbit", 10, np.eye(4), np.array([0.0, 0.0, 10.0])
    )
    core = CameraTrajectoryCore()
    core.default_fov = float(fovs[0])
    core.set_keyframes_from_poses(poses, fovs, aspect=1.0)
    assert len(core.keyframes) == 10
    out = core.interpolate_pose_and_fov_rad(0.5)
    assert out is not None


def test_keyframe_edit_overrides(rng):
    """Per-keyframe FOV/transition overrides (reference seva/gui.py:90-229)."""
    from stable_virtual_camera_tpu.core.trajectories import get_preset_pose_fov

    poses, fovs = get_preset_pose_fov("orbit", 5, np.eye(4), np.array([0.0, 0.0, 10.0]))
    core = CameraTrajectoryCore()
    core.default_fov = float(fovs[0])
    core.default_transition_sec = 1.0
    core.set_keyframes_from_poses(poses, fovs, aspect=1.0)

    base_duration = core.compute_duration()
    assert base_duration == pytest.approx(4.0)  # 4 transitions x 1s

    core.set_keyframe_transition_override(2, True, 3.0)
    assert core.compute_duration() == pytest.approx(6.0)
    core.set_keyframe_transition_override(2, False)
    assert core.compute_duration() == pytest.approx(4.0)

    core.set_keyframe_fov_override(1, True, 1.2)
    # fov spline now passes exactly through the override at keyframe 1
    t_kf1 = core.compute_transition_times_cumsum()[1] / core.compute_duration()
    _, fov = core.interpolate_pose_and_fov_rad(float(t_kf1))
    assert fov == pytest.approx(1.2, abs=1e-6)

    n = len(core.keyframes)
    core.remove_keyframe(1)
    assert len(core.keyframes) == n - 1


def test_render_preview_controller(rng):
    """Render-preview camera takeover state machine (reference
    seva/gui.py:742-813): enter saves client cameras, frame() follows the
    trajectory with the render fov/aspect, exit returns the saved states."""
    from stable_virtual_camera_tpu.apps.trajectory import (
        RenderPreviewController,
        SavedCamera,
    )
    from stable_virtual_camera_tpu.core.trajectories import get_preset_pose_fov

    core = CameraTrajectoryCore()
    ctrl = RenderPreviewController(core)
    # <2 keyframes: no-op
    assert ctrl.enter({}, 0.0) is None and not ctrl.preview_on

    poses, fovs = get_preset_pose_fov("orbit", 6, np.eye(4), np.array([0.0, 0.0, 10.0]))
    core.default_fov = float(fovs[0])
    core.set_keyframes_from_poses(poses, fovs, aspect=1.5)

    saved = {
        7: SavedCamera(
            wxyz=np.array([1.0, 0, 0, 0]), position=np.zeros(3), fov_rad=0.8
        )
    }
    frame0 = ctrl.enter(saved, 0.0)
    assert ctrl.preview_on
    assert frame0.aspect == pytest.approx(1.5)
    np.testing.assert_allclose(frame0.c2w[:3, 3], poses[0][:3, 3], atol=1e-8)

    mid = ctrl.frame(0.5)
    assert mid is not None and not np.allclose(mid.c2w[:3, 3], frame0.c2w[:3, 3])

    restored = ctrl.exit()
    assert not ctrl.preview_on
    assert restored[7].fov_rad == pytest.approx(0.8)
    assert ctrl.exit() == {}  # idempotent
