"""Quantify resample-vs-deliver divergence at anchor-coincident targets
(the `deliver_anchors` quality gate, r4 VERDICT next #2).

`deliver_anchors` splices the first-pass anchor frame into a coincident
target slot; the reference instead RE-DENOISES that target conditioned on
the same anchor (replace-pinned latents + cfg_min guidance,
seva/eval.py:1837-1956). The two can only differ by the second pass's
sampler stochasticity at that pose — this script measures exactly that:

  * ONE prepared plan (dense economy anchors placed for delivery), run
    twice from the same seed: delivery ON and delivery OFF. The first pass
    is bit-identical between runs, so every coincident position compares
    the SAME anchor frame against its re-denoised twin.
  * Reports per-coincident-frame PSNR/SSIM (delivered vs resampled), plus
    the mean PSNR across non-coincident frames (the side effect of chunk
    repacking), as one JSON line.

Mechanism context (docs/ARCHITECTURE.md round-5 journal): delivered frames
are exactly the frames the second pass conditions its neighbors on, so
delivery preserves neighbor consistency BY construction; the resampled twin
is a second, stochastic version of the same view. The reference itself
splices conditioning frames into coincident output positions for GT inputs
(`replace_or_include_input`, seva/eval.py:893-919) and presents the first
pass as user-visible output (demo_gr.py:664-701).

Usage:
  python -m benchmark.deliver_divergence            # tiny bundle, CPU
  python -m benchmark.deliver_divergence --full     # 1.3B synthetic, chip
"""

from __future__ import annotations

import copy
import glob
import json
import os.path as osp
import sys
import tempfile


def measure(bundle, image_hw=(64, 64), num_frames=12, num_steps=2,
            version_T=None, seed=23, chunk_strategy="interp-gt") -> dict:
    import imageio.v3 as iio
    import numpy as np

    from benchmark.metrics import psnr, ssim
    from stable_virtual_camera_tpu.apps.renderer import (
        HeadlessRenderer,
        preprocess_basic,
    )
    from stable_virtual_camera_tpu.config import VersionConfig

    H, W = image_hw
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, size=(H, W, 3), dtype=np.uint8)
    work = tempfile.mkdtemp(prefix="deliver_div_")
    renderer = HeadlessRenderer(bundle, work_dir=work)
    if version_T is not None:
        renderer.version = VersionConfig(H=H, W=W, T=version_T)

    # Plan with delivery OFF (the denser non-deliver anchor placement is
    # feasible under BOTH second-pass modes: delivering merely removes
    # coincident targets from chunks, while the reverse — resampling with
    # delivery-planned sparse anchors — can exceed the per-gap capacity).
    plan = renderer.prepare(
        preprocess_basic(img, shorter=min(H, W)),
        preset_traj="orbit",
        num_frames=num_frames,
        zoom_factor=0.5,
        chunk_strategy=chunk_strategy,
        cfg=4.0,
        num_steps=num_steps,
        seed=seed,
        min_anchor_fill=False,
        deliver_anchors=False,
    )
    num_inputs = len(plan["image_cond"]["input_indices"])
    coincident = sorted(
        int(round(p)) - num_inputs
        for p in plan["image_cond"]["prior_indices"]
        if abs(p - round(p)) < 1e-9
    )

    def run(deliver: bool):
        p = dict(plan)
        p["options"] = copy.deepcopy(plan["options"])
        p["options"].set("deliver_anchors", deliver)
        videos = list(renderer.run(p))
        out_dir = osp.dirname(videos[-1])
        pngs = sorted(glob.glob(osp.join(out_dir, "samples-rgb", "*.png")))
        assert len(pngs) == num_frames, (len(pngs), num_frames)
        return np.stack([iio.imread(f) for f in pngs]).astype(np.float64) / 255.0

    delivered = run(True)
    resampled = run(False)

    co_psnr = [psnr(delivered[j], resampled[j]) for j in coincident]
    co_ssim = [ssim(delivered[j], resampled[j]) for j in coincident]
    others = [j for j in range(num_frames) if j not in coincident]
    other_psnr = [psnr(delivered[j], resampled[j]) for j in others]
    return {
        "metric": "deliver_vs_resample_divergence",
        "num_frames": num_frames,
        "num_steps": num_steps,
        "coincident_positions": coincident,
        "coincident_psnr_mean": round(float(np.mean(co_psnr)), 3),
        "coincident_psnr_min": round(float(np.min(co_psnr)), 3),
        "coincident_ssim_mean": round(float(np.mean(co_ssim)), 4),
        "noncoincident_psnr_mean": round(float(np.mean(other_psnr)), 3)
        if other_psnr
        else None,
        "note": "synthetic/random weights: absolute values are model-"
        "dependent; the decision gate for real weights is documented in "
        "config.deliver_anchors + ARCHITECTURE round-5 journal",
    }


def main() -> None:
    full = "--full" in sys.argv

    if full:
        import importlib

        bench = importlib.import_module("bench")
        bundle = bench._full_scale_bundle()
        out = measure(
            bundle, image_hw=(576, 576), num_frames=26, num_steps=10,
            version_T=21,
        )
    else:
        # the tiny measurement belongs on (virtual) CPU — the image preloads
        # jax on the axon relay regardless of JAX_PLATFORMS env
        from benchmark.fullscale_compile import _ensure_cpu_devices

        _ensure_cpu_devices(8)
        from stable_virtual_camera_tpu.models.io import random_bundle

        bundle = random_bundle(image_hw=(64, 64))
        # version T=6 (the tiny UNet is T-flexible): T=3 would force ~one
        # anchor per target (cap = T-2 targets/gap) and a dozen first-pass
        # chunks — minutes of tiny-model compiles for no extra signal
        out = measure(bundle, image_hw=(64, 64), num_frames=12, num_steps=2,
                      version_T=6, chunk_strategy="interp-gt")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
