"""Quality metrics for benchmark evaluation: PSNR / SSIM (numpy), LPIPS
(gated on a torch VGG checkpoint being available).

The reference computes no metrics in-repo (SURVEY.md §4: benchmark-as-test,
PSNR/LPIPS computed externally); this harness closes that gap so the 17
ReconFusion-style splits (reference benchmark/README.md:6-148) can be scored
directly against generated outputs.
"""

from __future__ import annotations

import numpy as np


def psnr(pred: np.ndarray, target: np.ndarray, max_val: float = 1.0) -> float:
    """Images in [0, 1], any matching shape."""
    pred = np.asarray(pred, np.float64)
    target = np.asarray(target, np.float64)
    mse = np.mean((pred - target) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(max_val**2 / mse))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    ax = np.arange(size) - size // 2
    k = np.exp(-(ax**2) / (2 * sigma**2))
    k = np.outer(k, k)
    return k / k.sum()


def ssim(pred: np.ndarray, target: np.ndarray, max_val: float = 1.0) -> float:
    """Mean SSIM over channels, 11x11 Gaussian window (standard constants)."""
    from scipy.signal import convolve2d

    pred = np.asarray(pred, np.float64)
    target = np.asarray(target, np.float64)
    if pred.ndim == 3:
        return float(
            np.mean([ssim(pred[..., c], target[..., c], max_val) for c in
                     range(pred.shape[-1])])
        )
    K1, K2 = 0.01, 0.03
    C1, C2 = (K1 * max_val) ** 2, (K2 * max_val) ** 2
    win = _gaussian_kernel()

    def filt(x):
        return convolve2d(x, win, mode="valid")

    mu_p, mu_t = filt(pred), filt(target)
    mu_p2, mu_t2, mu_pt = mu_p**2, mu_t**2, mu_p * mu_t
    sigma_p2 = filt(pred**2) - mu_p2
    sigma_t2 = filt(target**2) - mu_t2
    sigma_pt = filt(pred * target) - mu_pt
    num = (2 * mu_pt + C1) * (2 * sigma_pt + C2)
    den = (mu_p2 + mu_t2 + C1) * (sigma_p2 + sigma_t2 + C2)
    return float(np.mean(num / den))


def lpips_available() -> bool:
    """Whether ANY LPIPS scorer can run: the native flax tower with
    converted weights (SVC_LPIPS_WEIGHTS=/path/to/lpips.msgpack, or
    =synthetic for pipeline drills), or the torch `lpips` package."""
    import os

    w = os.environ.get("SVC_LPIPS_WEIGHTS")
    if w == "synthetic" or (w and os.path.exists(w)):
        return True
    try:
        import lpips  # noqa: F401

        return True
    except ImportError:
        return False


def lpips_fn():
    """Returns an LPIPS callable (pred, target in [0,1] HWC) -> float.

    Resolution order: native flax LPIPS (models/lpips.py) when
    SVC_LPIPS_WEIGHTS points at a converted checkpoint (`synthetic` runs the
    real topology with random weights — day-0-drill execution path, scores
    meaningless but the pipeline is proven); otherwise the torch `lpips`
    package; otherwise raises ImportError."""
    import os

    w = os.environ.get("SVC_LPIPS_WEIGHTS")
    if w == "synthetic" or (w and os.path.exists(w)):
        from stable_virtual_camera_tpu.models.lpips import (
            load_lpips,
            lpips_apply_fn,
            synthetic_lpips_params,
        )

        params = (
            synthetic_lpips_params() if w == "synthetic" else load_lpips(w)
        )
        return lpips_apply_fn(params)

    import lpips
    import torch

    net = lpips.LPIPS(net="vgg")

    def compute(pred: np.ndarray, target: np.ndarray) -> float:
        def to_t(x):
            t = torch.from_numpy(np.asarray(x, np.float32)).permute(2, 0, 1)[None]
            return t * 2.0 - 1.0

        with torch.no_grad():
            return float(net(to_t(pred), to_t(target)).item())

    return compute


def evaluate_split(
    pred_dir: str,
    data_dir: str,
    num_input_frames,
    center_crop: int | None = None,
    resize_to: int | None = None,
) -> dict:
    """Score generated frames against a reconfusion split's test images with
    the per-entry post-processing the benchmark defines (center crop / resize,
    reference benchmark/README.md:150-152)."""
    import glob
    import os.path as osp

    import imageio.v3 as iio

    from stable_virtual_camera_tpu.data.parsers import ReconfusionParser

    parser = ReconfusionParser(data_dir)
    split = parser.splits_per_num_input_frames[num_input_frames]
    test_ids = split["test_ids"]
    pred_paths = sorted(glob.glob(osp.join(pred_dir, "samples-rgb", "*.png")))
    assert len(pred_paths) == len(test_ids), (
        f"{len(pred_paths)} generated frames vs {len(test_ids)} test views"
    )

    def post(img):
        img = np.asarray(img, np.float64) / 255.0
        if center_crop:
            h, w = img.shape[:2]
            t, l = (h - center_crop) // 2, (w - center_crop) // 2
            img = img[t : t + center_crop, l : l + center_crop]
        if resize_to:
            import cv2

            img = cv2.resize(
                img, (resize_to, resize_to), interpolation=cv2.INTER_AREA
            )
        return img

    psnrs, ssims, lpipss = [], [], []
    lp = lpips_fn() if lpips_available() else None
    for pred_path, test_id in zip(pred_paths, test_ids):
        gt_path = parser.image_paths[test_id]
        assert gt_path is not None
        pred = post(iio.imread(pred_path)[..., :3])
        gt = post(iio.imread(gt_path)[..., :3])
        if pred.shape != gt.shape:  # generated at model res; match GT
            import cv2

            pred = cv2.resize(
                pred, (gt.shape[1], gt.shape[0]), interpolation=cv2.INTER_AREA
            )
        psnrs.append(psnr(pred, gt))
        ssims.append(ssim(pred, gt))
        if lp is not None:
            lpipss.append(lp(pred, gt))
    out = {
        "psnr": float(np.mean(psnrs)),
        "ssim": float(np.mean(ssims)),
        "num_frames": len(psnrs),
    }
    if lpipss:
        out["lpips"] = float(np.mean(lpipss))
    return out
