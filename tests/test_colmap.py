"""COLMAPParser end-to-end over a synthetic text-format sparse model
(reference seva/data_io.py:120-327) — no pycolmap needed: text models route
through data/colmap_text.py."""

import os
import os.path as osp

import cv2
import numpy as np
import pytest

from stable_virtual_camera_tpu.data.colmap_text import (
    TextSceneManager,
    write_text_model,
)
from stable_virtual_camera_tpu.data.dataset import Dataset
from stable_virtual_camera_tpu.data.parsers import COLMAPParser, get_parser


def _quat_wxyz_from_R(R):
    from stable_virtual_camera_tpu.apps.scene_viz import rotmat_to_wxyz

    return rotmat_to_wxyz(R)


def _lookat_w2c(position, target):
    z = target - position
    z = z / np.linalg.norm(z)
    x = np.cross(np.array([0.0, -1.0, 0.0]), z)
    x = x / np.linalg.norm(x)
    y = np.cross(z, x)
    R_c2w = np.stack([x, y, z], 1)
    w2c = np.eye(4)
    w2c[:3, :3] = R_c2w.T
    w2c[:3, 3] = -R_c2w.T @ position
    return w2c


def _make_scene(root, write_model):
    """3-image synthetic scene: 2 views on a PINHOLE camera, 1 on an OPENCV
    (distorted) camera; 50 3D points with tracks."""
    img_dir = osp.join(root, "images")
    os.makedirs(img_dir)
    rng = np.random.default_rng(0)
    W, H = 64, 48
    names = ["a.png", "b.png", "c.png"]
    for name in names:
        cv2.imwrite(
            osp.join(img_dir, name),
            rng.integers(0, 255, size=(H, W, 3), dtype=np.uint8),
        )

    cameras = {
        1: ("PINHOLE", W, H, [60.0, 60.0, 32.0, 24.0]),
        2: ("OPENCV", W, H, [58.0, 59.0, 32.0, 24.0, 0.05, -0.01, 0.001, 0.0]),
    }
    positions = np.array([[2.0, 0.3, -2.0], [-2.0, -0.1, -2.2], [0.1, 2.0, -2.0]])
    w2cs, images = {}, {}
    for i, name in enumerate(names):
        w2c = _lookat_w2c(positions[i], np.zeros(3))
        w2cs[name] = w2c
        images[i + 1] = (
            _quat_wxyz_from_R(w2c[:3, :3]),
            w2c[:3, 3],
            1 if i < 2 else 2,
            name,
        )
    points = rng.normal(scale=0.5, size=(50, 3))
    colors = rng.integers(0, 255, size=(50, 3))
    tracks = [[(1, 0), (2, 0)] if i % 2 == 0 else [(3, 0)] for i in range(50)]
    write_model(osp.join(root, "sparse/0"), cameras, images, points, colors, tracks)
    return str(root), w2cs, points


@pytest.fixture(scope="module")
def colmap_scene(tmp_path_factory):
    return _make_scene(tmp_path_factory.mktemp("colmap_scene"), write_text_model)


@pytest.fixture(scope="module")
def colmap_scene_bin(tmp_path_factory):
    from stable_virtual_camera_tpu.data.colmap_binary import write_binary_model

    return _make_scene(tmp_path_factory.mktemp("colmap_scene_bin"), write_binary_model)


def test_text_scene_manager_roundtrip(colmap_scene):
    root, w2cs, points = colmap_scene
    m = TextSceneManager(osp.join(root, "sparse/0"))
    assert TextSceneManager.is_text_model(osp.join(root, "sparse/0"))
    m.load_cameras()
    m.load_images()
    m.load_points3D()
    assert set(m.cameras) == {1, 2}
    cam = m.cameras[1]
    assert (cam.fx, cam.fy, cam.cx, cam.cy) == (60.0, 60.0, 32.0, 24.0)
    assert m.cameras[2].k1 == pytest.approx(0.05)
    assert len(m.images) == 3
    im = m.images[1]
    np.testing.assert_allclose(im.R(), w2cs["a.png"][:3, :3], atol=1e-12)
    np.testing.assert_allclose(im.tvec, w2cs["a.png"][:3, 3], atol=1e-12)
    np.testing.assert_allclose(m.points3D, points, atol=1e-12)
    assert m.point3D_id_to_images[1] == [(1, 0), (2, 0)]
    assert m.name_to_image_id["c.png"] == 3


def test_binary_scene_manager_matches_text(colmap_scene, colmap_scene_bin):
    from stable_virtual_camera_tpu.data.colmap_binary import BinarySceneManager

    root_t, _, _ = colmap_scene
    root_b, _, _ = colmap_scene_bin
    assert BinarySceneManager.is_binary_model(osp.join(root_b, "sparse/0"))
    mt = TextSceneManager(osp.join(root_t, "sparse/0"))
    mb = BinarySceneManager(osp.join(root_b, "sparse/0"))
    for m in (mt, mb):
        m.load_cameras()
        m.load_images()
        m.load_points3D()
    assert set(mb.cameras) == set(mt.cameras)
    for cid in mt.cameras:
        for attr in ("camera_type", "width", "height", "fx", "fy", "cx", "cy",
                     "k1", "k2", "k3", "k4", "p1", "p2"):
            assert getattr(mb.cameras[cid], attr) == getattr(mt.cameras[cid], attr)
    assert set(mb.images) == set(mt.images)
    for iid in mt.images:
        np.testing.assert_allclose(mb.images[iid].qvec, mt.images[iid].qvec)
        np.testing.assert_allclose(mb.images[iid].tvec, mt.images[iid].tvec)
        assert mb.images[iid].camera_id == mt.images[iid].camera_id
        assert mb.images[iid].name == mt.images[iid].name
    np.testing.assert_allclose(mb.points3D, mt.points3D, atol=1e-12)
    np.testing.assert_array_equal(mb.point3D_colors, mt.point3D_colors)
    assert mb.point3D_id_to_images == mt.point3D_id_to_images
    assert mb.name_to_image_id == mt.name_to_image_id


@pytest.mark.parametrize("encoding", ["text", "binary"])
def test_colmap_parser_end_to_end(request, encoding):
    root, w2cs, points = request.getfixturevalue(
        "colmap_scene" if encoding == "text" else "colmap_scene_bin"
    )
    parser = get_parser("colmap", data_dir=root, test_every=None)
    assert isinstance(parser, COLMAPParser)
    assert parser.image_names == ["a.png", "b.png", "c.png"]  # filename-sorted
    # c2w = inverse of the w2c we wrote
    for i, name in enumerate(parser.image_names):
        np.testing.assert_allclose(
            parser.camtoworlds[i], np.linalg.inv(w2cs[name]), atol=1e-10
        )
    # pinhole camera: no distortion params, K unchanged
    assert parser.params_dict[1].size == 0
    np.testing.assert_allclose(
        parser.Ks_dict[1], [[60, 0, 32], [0, 60, 24], [0, 0, 1]], atol=1e-12
    )
    # distorted camera: undistortion maps precomputed, K updated
    assert parser.params_dict[2].size == 4
    assert 2 in parser.mapx_dict and parser.mapx_dict[2].shape == (48, 64)
    assert parser.points.shape == (50, 3)
    assert parser.points_rgb.dtype == np.uint8
    # per-image point indices from the tracks: a/b see even points, c odd
    assert len(parser.point_indices["a.png"]) == 25
    assert len(parser.point_indices["c.png"]) == 25
    assert parser.scene_scale > 0


def test_colmap_dataset_undistorts(colmap_scene):
    root, _, _ = colmap_scene
    parser = get_parser("colmap", data_dir=root, test_every=3)
    train = Dataset(parser, split="train")
    test = Dataset(parser, split="test")
    assert len(train) == 2 and len(test) == 1
    item = train[1]  # image c (index 2) is on the distorted camera
    # undistortion crops to the valid ROI (reference data_io.py Dataset)
    h, w = item["image"].shape[:2]
    assert item["image"].shape[2] == 3 and 40 <= h <= 48 and 56 <= w <= 64
    assert item["K"].shape == (3, 3)
    assert item["camtoworld"].shape == (4, 4)
    # the pinhole image is untouched
    item0 = train[0]
    assert item0["image"].shape == (48, 64, 3)


def test_colmap_parser_factor(colmap_scene):
    root, _, _ = colmap_scene
    # factor=2 needs an images_2 directory (reference data_io.py convention)
    img2 = osp.join(root, "images_2")
    if not osp.exists(img2):
        os.makedirs(img2)
        for name in ["a.png", "b.png", "c.png"]:
            im = cv2.imread(osp.join(root, "images", name))
            cv2.imwrite(osp.join(img2, name), im[::2, ::2])
    parser = COLMAPParser(data_dir=root, factor=2, test_every=None)
    np.testing.assert_allclose(
        parser.Ks_dict[1], [[30, 0, 16], [0, 30, 12], [0, 0, 1]], atol=1e-12
    )
    assert parser.imsize_dict[1] == (32, 24)
