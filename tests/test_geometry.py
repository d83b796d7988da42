"""Golden-parity tests of camera math / Plücker rays / trajectories /
normalization against the reference oracle (seva/geometry.py)."""

import numpy as np
import pytest
import torch

from stable_virtual_camera_tpu.core import camera, normalize, plucker, trajectories

from conftest import random_c2ws


def test_camera_dist_matches_reference(ref, rng):
    a = random_c2ws(rng, 5)
    b = random_c2ws(rng, 7)
    for mode in ["rotation", "translation"]:
        ours = camera.get_camera_dist(a, b, mode=mode)
        theirs = ref.geometry.get_camera_dist(
            torch.from_numpy(a).float(), torch.from_numpy(b).float(), mode=mode
        ).numpy()
        np.testing.assert_allclose(ours, theirs, atol=1e-3)


@pytest.mark.parametrize("fov,aspect", [(0.9424777960769379, 1.0), (0.7, 1.5), (1.2, 0.8)])
def test_default_intrinsics_matches_reference(ref, fov, aspect):
    ours = camera.get_default_intrinsics(fov, aspect)
    theirs = ref.geometry.get_default_intrinsics(fov, aspect).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-6)


def test_plucker_matches_reference(ref, rng):
    v, hw = 4, (9, 12)
    c2ws = random_c2ws(rng, v)
    w2cs = np.linalg.inv(c2ws)
    Ks = np.repeat(camera.get_default_intrinsics()[0][None], v, axis=0).astype(
        np.float64
    )
    Ks[:, 0, 0] *= rng.uniform(0.9, 1.1, size=v)

    ours = plucker.to_nchw(
        plucker.get_plucker_coordinates(w2cs[0], w2cs, Ks.copy(), hw)
    )
    theirs = ref.geometry.get_plucker_coordinates(
        torch.from_numpy(w2cs[0]).float(),
        torch.from_numpy(w2cs).float(),
        torch.from_numpy(Ks.copy()).float(),
        target_size=list(hw),
    ).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-5)


def test_plucker_invariants(rng):
    """Ray directions are unit norm; the moment is orthogonal to the direction;
    the source camera's own rays pass through the origin (zero moment)."""
    v, hw = 3, (8, 8)
    c2ws = random_c2ws(rng, v)
    w2cs = np.linalg.inv(c2ws)
    Ks = np.repeat(camera.get_default_intrinsics()[0][None], v, axis=0)
    p = plucker.get_plucker_coordinates(w2cs[0], w2cs, Ks, hw)
    d, m = p[..., :3], p[..., 3:]
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-6)
    np.testing.assert_allclose((d * m).sum(-1), 0.0, atol=1e-6)
    np.testing.assert_allclose(m[0], 0.0, atol=1e-6)


@pytest.mark.parametrize("preset", trajectories.PRESETS)
def test_presets_match_reference(ref, preset):
    num_frames = 12
    start_w2c = np.eye(4)
    look_at = np.array([0.0, 0.0, 10.0])
    ours_poses, ours_fovs = trajectories.get_preset_pose_fov(
        preset, num_frames, start_w2c, look_at
    )
    ref_poses, ref_fovs = ref.geometry.get_preset_pose_fov(
        preset,
        num_frames,
        torch.eye(4),
        torch.Tensor([0, 0, 10]),
    )
    np.testing.assert_allclose(ours_poses, ref_poses, atol=1e-5)
    np.testing.assert_allclose(ours_fovs, ref_fovs, atol=1e-6)


def test_interpolated_path_matches_reference(ref, rng):
    keyframes = random_c2ws(rng, 5)[:, :3]
    ours = trajectories.generate_interpolated_path(keyframes, 4)
    theirs = ref.geometry.generate_interpolated_path(keyframes, 4)
    np.testing.assert_allclose(ours, theirs, atol=1e-8)


def test_normalize_scene_matches_reference(ref, rng):
    c2ws = random_c2ws(rng, 10)
    points = rng.normal(size=(100, 3))
    ours_c2ws, ours_pts, ours_T = normalize.normalize_scene(
        c2ws.copy(), points.copy()
    )
    theirs_c2ws, theirs_pts, theirs_T = ref.geometry.normalize_scene(
        c2ws.copy(), points.copy()
    )
    np.testing.assert_allclose(ours_c2ws, theirs_c2ws, atol=1e-8)
    np.testing.assert_allclose(ours_pts, theirs_pts, atol=1e-8)
    np.testing.assert_allclose(ours_T, theirs_T, atol=1e-8)


def test_lookat_matches_reference(ref, rng):
    origins = rng.normal(size=(6, 3)) * 3
    target = np.array([0.5, -0.2, 1.0])
    dirs = target[None] - origins + rng.normal(scale=1e-3, size=(6, 3))
    ours = trajectories.get_lookat(origins, dirs)
    theirs = ref.geometry.get_lookat(
        torch.from_numpy(origins).float(), torch.from_numpy(dirs).float()
    ).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-4)
    np.testing.assert_allclose(ours, target, atol=1e-2)
