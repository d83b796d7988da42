"""Host-side image loading + resize/crop/pad policies with intrinsics updates.

Capability parity with reference seva/eval.py:99-322 (`get_resizing_factor`,
`get_wh_with_fixed_shortest_side`, `load_img_and_K`, `transform_img_and_K`):
same aspect-ratio cover/fit rules, the same `size_stride` snapping (network
needs multiples of 64), and the same normalized/unnormalized-K update math.

Images are numpy NHWC float32 in [-1, 1]; area interpolation via OpenCV
(equivalent to torch's `mode="area"` box filtering).
"""

from __future__ import annotations

import math

import cv2
import numpy as np
from PIL import Image


def get_resizing_factor(
    target_shape: tuple[int, int],  # (H, W)
    current_shape: tuple[int, int],  # (H, W)
    cover_target: bool = True,
) -> float:
    """Scale factor so the rescaled current image covers (or fits inside) the
    target area, by mutual aspect-ratio case analysis
    (reference seva/eval.py:99-138)."""
    r_bound = target_shape[1] / target_shape[0]
    aspect_r = current_shape[1] / current_shape[0]
    if r_bound >= 1.0:
        if cover_target:
            if aspect_r >= r_bound:
                return min(target_shape) / min(current_shape)
            if aspect_r < 1.0:
                return max(target_shape) / min(current_shape)
            return max(target_shape) / max(current_shape)
        if aspect_r >= r_bound:
            return max(target_shape) / max(current_shape)
        if aspect_r < 1.0:
            return min(target_shape) / max(current_shape)
        return min(target_shape) / min(current_shape)
    if cover_target:
        if aspect_r <= r_bound:
            return min(target_shape) / min(current_shape)
        if aspect_r > 1.0:
            return max(target_shape) / min(current_shape)
        return max(target_shape) / max(current_shape)
    if aspect_r <= r_bound:
        return max(target_shape) / max(current_shape)
    if aspect_r > 1.0:
        return min(target_shape) / max(current_shape)
    return min(target_shape) / min(current_shape)


def get_wh_with_fixed_shortest_side(w: int, h: int, size: int | None):
    """(reference seva/eval.py:147-157)"""
    if size is None or size <= 0:
        return w, h
    if w < h:
        return size, int(size * h / w)
    return int(size * w / h), size


def _snap(v: float, stride: int) -> int:
    return int(math.floor(v / stride + 0.5) * stride)


def _area_resize(img: np.ndarray, rh: int, rw: int) -> np.ndarray:
    """NHWC float32 area interpolation (box average)."""
    if img.shape[1] == rh and img.shape[2] == rw:
        return img  # identity: cv2 INTER_AREA at 1:1 is a copy, skip it
    out = np.stack(
        [cv2.resize(im, (rw, rh), interpolation=cv2.INTER_AREA) for im in img]
    )
    if out.ndim == 3:  # single-channel collapse
        out = out[..., None]
    return out


def load_image(
    image_path_or_size,
    context_rgb: np.ndarray | None = None,
) -> np.ndarray:
    """Load RGBA -> RGB composited on white (or a context color), (1, H, W, 3)
    float32 in [0, 1] (reference seva/eval.py:172-189)."""
    if isinstance(image_path_or_size, (tuple, list)):
        h, w = image_path_or_size
        image = Image.new("RGBA", (int(w), int(h)))
    else:
        image = Image.open(image_path_or_size).convert("RGBA")
    arr = np.asarray(image).astype(np.float32) / 255.0
    rgb, alpha = arr[..., :3], arr[..., 3:]
    if context_rgb is not None:
        out = rgb * alpha + np.asarray(context_rgb, np.float32) * (1 - alpha)
    else:
        out = rgb * alpha + (1 - alpha)
    return out[None]


def _is_normalized_K(K: np.ndarray) -> bool:
    cxcy = K[..., :2, -1]
    return bool(np.all(cxcy >= 0) and np.all(cxcy <= 1))


def load_img_and_K(
    image_path_or_size,
    size,
    scale: float = 1.0,
    center: tuple[float, float] = (0.5, 0.5),
    K: np.ndarray | None = None,
    size_stride: int = 1,
    center_crop: bool = False,
    context_rgb: np.ndarray | None = None,
):
    """Load + rescale + crop one image, updating K (reference
    seva/eval.py:160-246). Returns ((1, H, W, 3) in [-1, 1], K)."""
    image = load_image(image_path_or_size, context_rgb)  # (1, h, w, 3) in [0,1]
    h, w = image.shape[1:3]
    if size is None:
        size = (w, h)

    if isinstance(size, (tuple, list)):
        W, H = size
    else:
        W, H = get_wh_with_fixed_shortest_side(w, h, size)
    W, H = _snap(W, size_stride), _snap(H, size_stride)

    rfs = get_resizing_factor((math.floor(H * scale), math.floor(W * scale)), (h, w))
    rh, rw = [int(np.ceil(rfs * s)) for s in (h, w)]
    image = _area_resize(image, rh, rw)
    if scale < 1.0:
        pw = math.ceil((W - rw) * 0.5)
        ph = math.ceil((H - rh) * 0.5)
        image = np.pad(
            image, ((0, 0), (ph, ph), (pw, pw), (0, 0)), constant_values=1.0
        )

    cy_center = int(center[1] * image.shape[1])
    cx_center = int(center[0] * image.shape[2])
    if center_crop:
        side = min(H, W)
        ct = max(0, cy_center - side // 2)
        cl = max(0, cx_center - side // 2)
        ct = min(ct, image.shape[1] - side)
        cl = min(cl, image.shape[2] - side)
        image = image[:, ct : ct + side, cl : cl + side]
    else:
        ct = max(0, cy_center - H // 2)
        cl = max(0, cx_center - W // 2)
        ct = min(ct, image.shape[1] - H)
        cl = min(cl, image.shape[2] - W)
        image = image[:, ct : ct + H, cl : cl + W]

    if K is not None:
        K = K.copy().astype(np.float64)
        if _is_normalized_K(K):
            K[:2] *= np.array([rw, rh], dtype=np.float64)[:, None]
        else:
            K[:2] *= np.array([rw / w, rh / h], dtype=np.float64)[:, None]
        K[:2, 2] -= np.array([cl, ct], dtype=np.float64)

    return image * 2.0 - 1.0, K


def transform_img_and_K(
    image: np.ndarray,  # (B, H, W, 3) in [-1, 1]
    size,
    scale: float = 1.0,
    center: tuple[float, float] = (0.5, 0.5),
    K: np.ndarray | None = None,  # (B, 3, 3)
    size_stride: int = 1,
    mode: str = "crop",
):
    """Resize + crop/pad/stretch a batch of images, updating per-view K
    (reference seva/eval.py:249-322)."""
    assert mode in ("crop", "pad", "stretch")
    h, w = image.shape[1:3]
    if isinstance(size, (tuple, list)):
        W, H = size
    else:
        W, H = get_wh_with_fixed_shortest_side(w, h, size)
    W, H = _snap(W, size_stride), _snap(H, size_stride)

    if mode == "stretch":
        rh, rw = H, W
    else:
        rfs = get_resizing_factor((H, W), (h, w), cover_target=(mode != "pad"))
        rh, rw = [int(np.ceil(rfs * s)) for s in (h, w)]
    rh, rw = int(rh / scale), int(rw / scale)
    image = _area_resize(image, rh, rw)

    cy_center = int(center[1] * image.shape[1])
    cx_center = int(center[0] * image.shape[2])
    if mode != "pad":
        ct = max(0, cy_center - H // 2)
        cl = max(0, cx_center - W // 2)
        ct = min(ct, image.shape[1] - H)
        cl = min(cl, image.shape[2] - W)
        image = image[:, ct : ct + H, cl : cl + W]
        pl, pt = 0, 0
    else:
        pt = max(0, H // 2 - cy_center)
        pl = max(0, W // 2 - cx_center)
        pb = max(0, H - pt - image.shape[1])
        pr = max(0, W - pl - image.shape[2])
        image = np.pad(image, ((0, 0), (pt, pb), (pl, pr), (0, 0)))
        cl, ct = 0, 0

    if K is not None:
        K = K.copy().astype(np.float64)
        # classify normalized-vs-pixel-unit PER K (the reference transforms
        # one image per call, so classification is inherently per-frame,
        # seva/eval.py:313-321; a batch mixing both kinds must not scale the
        # normalized ones by the pixel-unit rule)
        cxcy = K[:, :2, -1]
        norm_row = np.all((cxcy >= 0) & (cxcy <= 1), axis=-1)  # (B,)
        scale_norm = np.array([rw, rh], dtype=np.float64)[:, None]
        scale_pix = np.array([rw / w, rh / h], dtype=np.float64)[:, None]
        K[:, :2] *= np.where(norm_row[:, None, None], scale_norm, scale_pix)
        K[:, :2, 2] += np.array([pl - cl, pt - ct], dtype=np.float64)

    return image, K
