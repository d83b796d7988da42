"""Dust3rPipeline exercised end-to-end against a MOCKED dust3r package.

The real package is absent here and in the reference, which ships it as an
empty submodule — the mock pins the pipeline's use of the dust3r API
(reference seva/modules/preprocessor.py:37-77). Unlike the reference, only
the stereo NETWORK is external now: the fake `inference` emits synthetic
pairwise pointmaps (known cameras, per-edge scale ambiguity) in dust3r's
output format, and the pipeline's NATIVE global aligner
(core/global_alignment.py) must recover the ground-truth scene from them."""

import sys
import types

import numpy as np
import pytest
import torch

from test_global_alignment import _align_to_gt, _make_scene

HS, WS = 48, 64  # mocked load_images working resolution
GT_F = 40.0


def _install_fake_dust3r(monkeypatch, recorded):
    def mk(name):
        mod = types.ModuleType(name)
        mod.__spec__ = __import__(
            "importlib.machinery", fromlist=["ModuleSpec"]
        ).ModuleSpec(name, loader=None)
        return mod

    dust3r = mk("dust3r")
    inference_mod = mk("dust3r.inference")
    model_mod = mk("dust3r.model")
    pairs_mod = mk("dust3r.image_pairs")
    img_mod = mk("dust3r.utils.image")
    utils_mod = mk("dust3r.utils")

    class AsymmetricCroCo3DStereo:
        @classmethod
        def from_pretrained(cls, name):
            recorded["pretrained"] = name
            return cls()

        def to(self, device):
            return self

    def load_images(paths, size):
        recorded["load_size"] = size
        rng = np.random.default_rng(5)
        out = []
        for i in range(len(paths)):
            # dust3r convention: (1, 3, H, W) torch tensor normalized to [-1, 1]
            img = rng.uniform(-1, 1, (1, 3, HS, WS)).astype(np.float32)
            out.append({"idx": i, "img": torch.tensor(img)})
        return out

    def make_pairs(images, scene_graph, prefilter, symmetrize):
        recorded["scene_graph"] = scene_graph
        recorded["symmetrize"] = symmetrize
        return [(a, b) for a in images for b in images if a["idx"] != b["idx"]]

    def inference(pairs, model, device, batch_size):
        recorded["n_pairs"] = len(pairs)
        n = recorded["n_imgs"]
        edges, gt = _make_scene(N=n, H=HS, W=WS, f=GT_F, noise=0.002, seed=4)
        recorded["gt"] = gt
        # dust3r's standard inference output dict (torch tensors)
        return {
            "view1": {"idx": list(edges.i_idx)},
            "view2": {"idx": list(edges.j_idx)},
            "pred1": {
                "pts3d": torch.tensor(edges.pts1),
                "conf": torch.tensor(edges.conf1),
            },
            "pred2": {
                "pts3d_in_other_view": torch.tensor(edges.pts2),
                "conf": torch.tensor(edges.conf2),
            },
        }

    inference_mod.inference = inference
    model_mod.AsymmetricCroCo3DStereo = AsymmetricCroCo3DStereo
    pairs_mod.make_pairs = make_pairs
    img_mod.load_images = load_images
    utils_mod.image = img_mod
    for name, mod in {
        "dust3r": dust3r,
        "dust3r.inference": inference_mod,
        "dust3r.model": model_mod,
        "dust3r.image_pairs": pairs_mod,
        "dust3r.utils": utils_mod,
        "dust3r.utils.image": img_mod,
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
    imgs, Ks, c2ws, points, colors = pipe.infer_cameras_and_points(
        image_files, niter=200
    )

    # the reference's pipeline configuration is preserved
    assert recorded["scene_graph"] == "complete"  # preprocessor.py:66
    assert recorded["symmetrize"] is True
    assert recorded["load_size"] == 512

    # output contract (reference preprocessor.py:47-116)
    n = 3
    assert imgs.shape == (n, HS, WS, 3) and imgs.dtype == np.float32
    assert imgs.min() >= 0.0 and imgs.max() <= 1.0
    assert Ks.shape == (n, 3, 3)
    assert c2ws.shape == (n, 4, 4)
    assert len(points) == n and len(colors) == n
    for p, c in zip(points, colors):
        assert p.ndim == 2 and p.shape[1] == 3
        assert len(p) > 0  # default min_conf_thr keeps confident points
        assert c.shape == p.shape  # one color per confident point

    # the NATIVE aligner recovered the synthetic ground truth: poses match
    # up to a global similarity, focal within 3%
    gt = recorded["gt"]
    rec, _, _, _ = _align_to_gt(c2ws.astype(np.float64), gt["c2ws"])
    np.testing.assert_allclose(rec[:, :3, 3], gt["c2ws"][:, :3, 3], atol=0.1)
    # intrinsics rescaled from the 64x48 working res to the original 128x96
    np.testing.assert_allclose(Ks[:, 0, 0], GT_F * 128 / 64, rtol=0.03)
    np.testing.assert_allclose(Ks[0, 0, 2], 64.0)  # cx scaled to W/2
    np.testing.assert_allclose(Ks[0, 1, 2], 48.0)  # cy scaled to H/2


def test_single_image_duplicates_to_stereo_pair(monkeypatch, image_files):
    recorded = {"n_imgs": 2}  # pipeline duplicates 1 -> 2
    _install_fake_dust3r(monkeypatch, recorded)
    from stable_virtual_camera_tpu.apps import preprocessor

    pipe = preprocessor.Dust3rPipeline()
    imgs, Ks, c2ws, points, colors = pipe.infer_cameras_and_points(
        image_files[:1], niter=50
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
