"""Dust3rPipeline exercised end-to-end against a MOCKED dust3r package
(VERDICT.md Missing #4: the real package is absent here and in the reference,
which ships it as an empty submodule — this pins the pipeline's use of the
dust3r API and its output contract, reference seva/modules/preprocessor.py:37-116)."""

import sys
import types

import numpy as np
import pytest
import torch


class _FakeScene:
    """Mimics dust3r's PointCloudOptimizer result surface."""

    def __init__(self, n, hs=48, ws=64):
        rng = np.random.default_rng(0)
        self.imgs = [rng.uniform(size=(hs, ws, 3)).astype(np.float32) for _ in range(n)]
        self._K = torch.tensor(
            [[[60.0, 0, ws / 2], [0, 60.0, hs / 2], [0, 0, 1]]] * n
        )
        poses = np.repeat(np.eye(4)[None], n, 0)
        poses[:, 0, 3] = np.arange(n)  # distinct positions
        self._poses = torch.tensor(poses, dtype=torch.float32)
        self._pts = [torch.tensor(rng.normal(size=(hs, ws, 3)), dtype=torch.float32)
                     for _ in range(n)]
        self._masks = [torch.tensor(rng.uniform(size=(hs, ws)) > 0.5)
                       for _ in range(n)]
        self.aligned = False

    def compute_global_alignment(self, **kw):
        self.aligned = True
        return 0.0

    def get_intrinsics(self):
        return self._K

    def get_im_poses(self):
        return self._poses

    def get_pts3d(self):
        return self._pts

    def get_masks(self):
        return self._masks


def _install_fake_dust3r(monkeypatch, recorded):
    def mk(name):
        mod = types.ModuleType(name)
        mod.__spec__ = __import__("importlib.machinery", fromlist=["ModuleSpec"]).ModuleSpec(
            name, loader=None
        )
        return mod

    dust3r = mk("dust3r")
    inference_mod = mk("dust3r.inference")
    model_mod = mk("dust3r.model")
    pairs_mod = mk("dust3r.image_pairs")
    img_mod = mk("dust3r.utils.image")
    utils_mod = mk("dust3r.utils")
    opt_mod = mk("dust3r.cloud_opt")

    class AsymmetricCroCo3DStereo:
        @classmethod
        def from_pretrained(cls, name):
            recorded["pretrained"] = name
            return cls()

        def to(self, device):
            return self

    def load_images(paths, size):
        recorded["load_size"] = size
        return [{"idx": i, "img": None} for i in range(len(paths))]

    def make_pairs(images, scene_graph, prefilter, symmetrize):
        recorded["scene_graph"] = scene_graph
        return [(a, b) for a in images for b in images if a["idx"] != b["idx"]]

    def inference(pairs, model, device, batch_size):
        recorded["n_pairs"] = len(pairs)
        return {"pred": None, "n_imgs": recorded["n_imgs"]}

    class GlobalAlignerMode:
        PointCloudOptimizer = "pco"

    def global_aligner(output, device, mode, same_focals):
        recorded["same_focals"] = same_focals
        recorded["mode"] = mode
        return _FakeScene(recorded["n_imgs"])

    inference_mod.inference = inference
    model_mod.AsymmetricCroCo3DStereo = AsymmetricCroCo3DStereo
    pairs_mod.make_pairs = make_pairs
    img_mod.load_images = load_images
    utils_mod.image = img_mod
    opt_mod.GlobalAlignerMode = GlobalAlignerMode
    opt_mod.global_aligner = global_aligner
    for name, mod in {
        "dust3r": dust3r,
        "dust3r.inference": inference_mod,
        "dust3r.model": model_mod,
        "dust3r.image_pairs": pairs_mod,
        "dust3r.utils": utils_mod,
        "dust3r.utils.image": img_mod,
        "dust3r.cloud_opt": opt_mod,
    }.items():
        monkeypatch.setitem(sys.modules, name, mod)


@pytest.fixture()
def image_files(tmp_path):
    import cv2

    rng = np.random.default_rng(1)
    paths = []
    for i in range(3):
        p = tmp_path / f"im{i}.png"
        cv2.imwrite(str(p), rng.integers(0, 255, (96, 128, 3), dtype=np.uint8))
        paths.append(str(p))
    return paths


def test_infer_cameras_and_points_contract(monkeypatch, image_files):
    recorded = {"n_imgs": 3}
    _install_fake_dust3r(monkeypatch, recorded)
    from stable_virtual_camera_tpu.apps import preprocessor

    assert preprocessor.dust3r_available()
    pipe = preprocessor.Dust3rPipeline()
    imgs, Ks, c2ws, points, colors = pipe.infer_cameras_and_points(image_files)

    # the reference's pipeline configuration is preserved
    assert recorded["scene_graph"] == "complete"  # preprocessor.py:66
    assert recorded["same_focals"] is True  # preprocessor.py:79
    assert recorded["load_size"] == 512

    # output contract (reference preprocessor.py:47-116)
    n = 3
    assert imgs.shape == (n, 48, 64, 3) and imgs.dtype == np.float32
    assert Ks.shape == (n, 3, 3)
    assert c2ws.shape == (n, 4, 4)
    assert len(points) == n and len(colors) == n
    for p, c in zip(points, colors):
        assert p.ndim == 2 and p.shape[1] == 3
        assert c.shape == p.shape  # one color per confident point
    # intrinsics rescaled from the 64x48 working res to the original 128x96
    np.testing.assert_allclose(Ks[0, 0, 0], 60.0 * 128 / 64)
    np.testing.assert_allclose(Ks[0, 1, 1], 60.0 * 96 / 48)
    np.testing.assert_allclose(Ks[0, 0, 2], 64.0)  # cx scaled to W/2


def test_single_image_duplicates_to_stereo_pair(monkeypatch, image_files):
    recorded = {"n_imgs": 2}  # pipeline duplicates 1 -> 2
    _install_fake_dust3r(monkeypatch, recorded)
    from stable_virtual_camera_tpu.apps import preprocessor

    pipe = preprocessor.Dust3rPipeline()
    imgs, Ks, c2ws, points, colors = pipe.infer_cameras_and_points(
        image_files[:1]
    )
    # only the original image's outputs survive (preprocessor.py:94-96)
    assert imgs.shape[0] == 1 and Ks.shape == (1, 3, 3) and c2ws.shape == (1, 4, 4)
    assert len(points) == 1 and len(colors) == 1


def test_fallback_poses():
    from stable_virtual_camera_tpu.apps.preprocessor import estimate_poses_fallback

    c2ws, Ks = estimate_poses_fallback([(48, 64), (96, 128)])
    assert c2ws.shape == (2, 4, 4)
    np.testing.assert_allclose(c2ws[0], np.eye(4))
    assert Ks.shape == (2, 3, 3)
    np.testing.assert_allclose(Ks[0][0, 2], 32.0)  # cx = W/2
