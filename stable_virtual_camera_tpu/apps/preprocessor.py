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
        return _finalize_scene(img_list, img_paths, scene, num_img, min_conf_thr)


def _finalize_scene(img_list, img_paths, scene, num_img, min_conf_thr):
    """Shared post-alignment tail of infer_cameras_and_points (reference
    preprocessor.py:99-116): confidence-mask the per-image pointmaps, undo
    the single-image duplication, and rescale intrinsics back to each
    original image's resolution."""
    import numpy as np

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


def load_and_preprocess_images(
    img_paths: list[str], size: int = 512, patch: int = 16
) -> list[np.ndarray]:
    """dust3r-style loader (dust3r/utils/image.py load_images semantics for
    size=512): resize the LONG side to `size`, center-crop each dimension
    down to a multiple of `patch`, normalize to [-1, 1]. Returns HWC fp32
    arrays (shapes vary with aspect ratio)."""
    import PIL.Image

    out = []
    for path in img_paths:
        with PIL.Image.open(path) as im:
            im = im.convert("RGB")
            W, H = im.size
            scale = size / max(W, H)
            W2, H2 = max(patch, round(W * scale)), max(patch, round(H * scale))
            im = im.resize((W2, H2), PIL.Image.LANCZOS)
            arr = np.asarray(im, dtype=np.float32)
        h0 = (H2 - H2 // patch * patch) // 2
        w0 = (W2 - W2 // patch * patch) // 2
        arr = arr[h0 : h0 + H2 // patch * patch, w0 : w0 + W2 // patch * patch]
        out.append(arr / 127.5 - 1.0)
    return out


class NativeDust3rPipeline:
    """Dust3rPipeline drop-in whose stereo network is the IN-REPO flax model
    (models/dust3r.AsymmetricCroCoStereo) instead of the external torch
    `dust3r` package, and whose global alignment is the native optax
    optimizer — the full preprocessing path (reference
    seva/modules/preprocessor.py:47-116) with zero external model code.

    Pairs are batched per (shape1, shape2) bucket through one jitted forward
    (the reference loops a torch dataloader with batch_size=16); the complete
    symmetric scene graph matches make_pairs(scene_graph="complete",
    symmetrize=True).

    `params` is the converted checkpoint pytree (models/convert_dust3r) or
    None with `init_rng` set for synthetic weights (tests / dry runs).
    """

    def __init__(
        self,
        params=None,
        spec=None,
        weight_path: str | None = None,
        init_rng: int | None = None,
        dtype=None,
    ):
        import jax
        import jax.numpy as jnp

        from stable_virtual_camera_tpu.models.dust3r import (
            AsymmetricCroCoStereo,
            Dust3rSpec,
        )

        self.spec = spec or Dust3rSpec()
        self.model = AsymmetricCroCoStereo(self.spec, dtype=dtype or jnp.float32)
        if params is None and weight_path is not None:
            import os

            if os.path.isdir(weight_path):
                # converted orbax cache (apps/convert_weights.py --dust3r)
                from stable_virtual_camera_tpu.models.io import load_converted

                params = load_converted(weight_path)["dust3r"]
            else:
                from stable_virtual_camera_tpu.models.io import load_dust3r_params

                params = load_dust3r_params(weight_path, spec=self.spec)
        if params is None:
            if init_rng is None:
                raise ValueError(
                    "NativeDust3rPipeline needs converted weights (params= or "
                    "weight_path=); pass init_rng= for synthetic weights."
                )
            p = self.spec.patch_size
            params = self.model.init(
                jax.random.PRNGKey(init_rng),
                jnp.zeros((1, p * 2, p * 2, 3)),
                jnp.zeros((1, p * 2, p * 2, 3)),
            )["params"]
        self.params = params
        # params as a traced ARGUMENT, not a closure constant: a closure
        # would bake the ~2.3 GB ViT-L tree into every (shape1, shape2)
        # bucket's executable as literal constants
        self._jit = jax.jit(
            lambda p, a, b: self.model.apply({"params": p}, a, b)
        )
        self._apply = lambda a, b: self._jit(self.params, a, b)

    def infer_cameras_and_points(
        self,
        img_paths: list[str],
        batch_size: int = 16,
        schedule: str = "cosine",
        lr: float = 0.01,
        niter: int = 500,
        min_conf_thr: int = 3,
    ):
        """Same contract as Dust3rPipeline.infer_cameras_and_points."""
        import jax.numpy as jnp

        from stable_virtual_camera_tpu.core.global_alignment import (
            edges_from_dust3r_output,
            global_align,
        )

        num_img = len(img_paths)
        imgs_pm1 = load_and_preprocess_images(
            img_paths, self.spec.img_size, self.spec.patch_size
        )
        if num_img == 1:  # duplicate a single image into a stereo pair
            imgs_pm1 = [imgs_pm1[0], imgs_pm1[0].copy()]

        n = len(imgs_pm1)
        pairs = [(i, j) for i in range(n) for j in range(n) if i != j]

        # bucket pairs by their (shape1, shape2) so every jitted call sees
        # static shapes; run each bucket in batch_size chunks
        by_shape: dict = {}
        for e, (i, j) in enumerate(pairs):
            key = (imgs_pm1[i].shape, imgs_pm1[j].shape)
            by_shape.setdefault(key, []).append(e)

        E = len(pairs)
        p1 = [None] * E
        c1 = [None] * E
        p2 = [None] * E
        c2 = [None] * E
        for idxs in by_shape.values():
            for s in range(0, len(idxs), batch_size):
                chunk = idxs[s : s + batch_size]
                a = jnp.stack([imgs_pm1[pairs[e][0]] for e in chunk])
                b = jnp.stack([imgs_pm1[pairs[e][1]] for e in chunk])
                out = self._apply(a, b)
                P1 = np.asarray(out["pred1"]["pts3d"], np.float32)
                C1 = np.asarray(out["pred1"]["conf"], np.float32)
                P2 = np.asarray(out["pred2"]["pts3d_in_other_view"], np.float32)
                C2 = np.asarray(out["pred2"]["conf"], np.float32)
                for bi, e in enumerate(chunk):
                    p1[e], c1[e], p2[e], c2[e] = P1[bi], C1[bi], P2[bi], C2[bi]

        output = {
            "view1": {"idx": [pairs[e][0] for e in range(E)]},
            "view2": {"idx": [pairs[e][1] for e in range(E)]},
            "pred1": {"pts3d": p1, "conf": c1},
            "pred2": {"pts3d_in_other_view": p2, "conf": c2},
        }
        scene = global_align(
            edges_from_dust3r_output(output),
            niter=niter,
            lr=lr,
            schedule=schedule,
            same_focals=True,
        )
        img_list = [((im + 1.0) / 2.0).astype(np.float32) for im in imgs_pm1]
        return _finalize_scene(img_list, img_paths, scene, num_img, min_conf_thr)


def make_dust3r_pipeline(device: str = "cpu", **native_kwargs):
    """Backend factory: the external torch dust3r package when importable
    (reference behavior), else the native in-repo network."""
    if dust3r_available():
        return Dust3rPipeline(device=device)
    return NativeDust3rPipeline(**native_kwargs)


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
