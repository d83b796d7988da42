"""DUSt3R-based pose/geometry preprocessing for unposed in-the-wild images.

Capability parity with reference seva/modules/preprocessor.py:12-116
(`Dust3rPipeline.infer_cameras_and_points`): run a stereo network over all
image pairs, globally align to recover per-image intrinsics, c2w poses and
confidence-masked point clouds, rescaling intrinsics to the original
resolution. The stereo network stays a host-side torch stage, but the
global-alignment optimization (500 Adam steps on GPU in the reference) runs
natively here — core/global_alignment.py, one jitted optax loop.

The dust3r package (a git submodule in the reference, not checked out there
either) is not available in this image; the pipeline raises a clear error at
construction unless importable, and `estimate_poses_fallback` provides a
degenerate identity-pose path so the Basic GUI flow works without it
(mirroring the reference GUI's Basic mode, demo_gr.py:140-177).
"""

from __future__ import annotations

import numpy as np

from stable_virtual_camera_tpu.core.camera import get_default_intrinsics


def dust3r_available() -> bool:
    try:
        import dust3r  # noqa: F401

        return True
    except ImportError:
        return False


class Dust3rPipeline:
    def __init__(self, device: str = "cpu"):
        if not dust3r_available():
            raise ImportError(
                "dust3r is not installed (the reference ships it as an empty "
                "submodule too, .gitmodules:1-3). Use estimate_poses_fallback "
                "for the identity-pose Basic mode, or install dust3r."
            )
        import torch
        from dust3r.inference import inference  # type: ignore
        from dust3r.model import AsymmetricCroCo3DStereo  # type: ignore

        self.device = torch.device(device)
        self.model = AsymmetricCroCo3DStereo.from_pretrained(
            "naver/DUSt3R_ViTLarge_BaseDecoder_512_dpt"
        ).to(self.device)
        self._inference = inference

    def infer_cameras_and_points(
        self,
        img_paths: list[str],
        batch_size: int = 16,
        schedule: str = "cosine",
        lr: float = 0.01,
        niter: int = 500,
        min_conf_thr: int = 3,
    ):
        """Returns (imgs [0..1], Ks, c2ws, points per image, colors per image),
        matching the reference's contract (preprocessor.py:47-116).

        The stereo network runs through the external dust3r package; global
        alignment runs NATIVELY (core/global_alignment.py: MST + weighted
        Umeyama init, one jitted optax.adam loop) — the reference instead
        hands this stage to dust3r's torch PointCloudOptimizer
        (preprocessor.py:78-101)."""
        from dust3r.image_pairs import make_pairs  # type: ignore
        from dust3r.utils.image import load_images  # type: ignore

        from stable_virtual_camera_tpu.core.global_alignment import (
            edges_from_dust3r_output,
            global_align,
        )

        num_img = len(img_paths)
        images = load_images(img_paths, size=512)
        if num_img == 1:  # duplicate a single image into a stereo pair
            images = [images[0], images[0].copy()]
            images[1]["idx"] = 1

        pairs = make_pairs(
            images, scene_graph="complete", prefilter=None, symmetrize=True
        )
        output = self._inference(
            pairs, self.model, self.device, batch_size=batch_size
        )
        scene = global_align(
            edges_from_dust3r_output(output),
            niter=niter,
            lr=lr,
            schedule=schedule,
            same_focals=True,  # preprocessor.py:79
        )
        # dust3r's load_images normalizes to [-1, 1]; recover [0, 1] rgb
        img_list = [
            ((np.asarray(im["img"])[0].transpose(1, 2, 0) + 1.0) / 2.0).astype(
                np.float32
            )
            for im in images
        ]
        Ks = scene.Ks.copy()
        c2ws = scene.c2ws
        # mixed-size image sets: the aligner's maps are padded to a common
        # extent; crop each image's points/masks back to its real size
        crop = lambda arrs: [  # noqa: E731
            a[: im.shape[0], : im.shape[1]] for a, im in zip(arrs, img_list)
        ]
        pts3d = crop(list(scene.pts3d))
        masks = crop(scene.masks(min_conf_thr))
        uniform = len({im.shape for im in img_list}) == 1
        imgs = np.stack(img_list) if uniform else img_list

        if num_img == 1:
            imgs, Ks, c2ws = imgs[:1], Ks[:1], c2ws[:1]
            pts3d, masks = pts3d[:1], masks[:1]

        # rescale Ks back to original resolution (preprocessor.py:103-113)
        import PIL.Image

        out_Ks = []
        for i, path in enumerate(img_paths[: len(Ks)]):
            with PIL.Image.open(path) as im:
                W, H = im.size
            hs, ws = imgs[i].shape[:2]
            K = Ks[i].copy()
            K[0] *= W / ws
            K[1] *= H / hs
            out_Ks.append(K)

        points = [p[m] for p, m in zip(pts3d, masks)]
        colors = [img[m] for img, m in zip(imgs, masks)]
        return imgs, np.stack(out_Ks), c2ws, points, colors


def estimate_poses_fallback(
    img_hw_list: list[tuple[int, int]],
) -> tuple[np.ndarray, np.ndarray]:
    """Basic-mode geometry: identity pose + default-FOV intrinsics per image
    (reference demo_gr.py:140-177)."""
    n = len(img_hw_list)
    c2ws = np.repeat(np.eye(4)[None], n, axis=0)
    Ks = []
    for h, w in img_hw_list:
        K = get_default_intrinsics(aspect_ratio=w / h)[0].copy()
        K[0] *= w
        K[1] *= h
        Ks.append(K)
    return c2ws, np.stack(Ks)
