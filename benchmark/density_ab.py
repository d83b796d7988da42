"""On-chip A/B of the dense-economy schedules on the baseline's e2e workload.

Runs the 134-frame two-pass Advanced render through one shared bundle in
up to three schedule modes:
  fill       — the reference schedule (min_anchor_fill=True): 11 scans
  dense      — dense economy placement: 9 scans
  deliver    — dense + anchor delivery: 8 scans, second pass packed to T

Usage:  python benchmark/density_ab.py [--modes dense,deliver] [--frames 134]
SVC_ENGINE_TIMING=1 adds the per-stage engine decomposition per render.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/svc_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")
sys.path.insert(0, ".")

MODES = {
    "fill": dict(min_anchor_fill=True, deliver_anchors=False),
    "dense": dict(min_anchor_fill=False, deliver_anchors=False),
    "deliver": dict(min_anchor_fill=False, deliver_anchors=True),
}


def run() -> None:
    import numpy as np

    from bench import BASELINE_FPS, H, STEPS, W, _full_scale_bundle
    from stable_virtual_camera_tpu.apps.renderer import (
        HeadlessRenderer,
        preprocess_basic,
    )

    frames, steps = 134, STEPS
    modes = ["dense", "deliver"]
    if "--frames" in sys.argv:
        frames = int(sys.argv[sys.argv.index("--frames") + 1])
    if "--modes" in sys.argv:
        modes = sys.argv[sys.argv.index("--modes") + 1].split(",")

    bundle = _full_scale_bundle()
    work_dir = tempfile.mkdtemp(prefix="bench_density_ab_")
    renderer = HeadlessRenderer(bundle, work_dir=work_dir)
    rng = np.random.default_rng(0)

    # same serving ladder as bench.py: the 34-frame warmup hits the same
    # T_first bucket as the timed 134-frame render
    os.environ.setdefault("SVC_TFIRST_BUCKETS", "12,21")

    def make_plan(image, seed, mode, n_frames):
        return renderer.prepare(
            preprocess_basic(image, shorter=min(H, W)),
            preset_traj="orbit", num_frames=n_frames, zoom_factor=0.5,
            chunk_strategy="interp-gt", cfg=4.0, num_steps=steps, seed=seed,
            **MODES[mode],
        )

    for mode in modes:
        img = rng.integers(0, 255, size=(H, W, 3), dtype=np.uint8)
        warm_frames = min(frames, 34) if mode != "fill" else frames
        warm = list(
            renderer.run(make_plan(img, seed=23, mode=mode, n_frames=warm_frames))
        )
        assert warm, "no output (warmup)"
        img2 = rng.integers(0, 255, size=(H, W, 3), dtype=np.uint8)
        plan = make_plan(img2, seed=24, mode=mode, n_frames=frames)
        t0 = time.perf_counter()
        videos = list(renderer.run(plan))
        total = time.perf_counter() - t0
        assert videos, "no output"
        fps = frames / total
        print(
            json.dumps(
                {
                    "metric": f"e2e_{frames}f_2pass_{mode}",
                    "value": round(fps, 4),
                    "unit": "frames/sec",
                    "vs_baseline": round(fps / BASELINE_FPS, 3),
                    "detail": {
                        "total_s": round(total, 1),
                        "first_pass_chunks": plan["first_pass_chunks"],
                        "second_pass_chunks": plan["second_pass_chunks"],
                        "T": str(plan["version"].T),
                    },
                }
            ),
            flush=True,
        )
    shutil.rmtree(work_dir, ignore_errors=True)


if __name__ == "__main__":
    run()
