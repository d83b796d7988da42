"""A/B the economy-anchor schedule on the baseline's own e2e workload.

Runs the 134-frame two-pass Advanced render (docs/GR_USAGE.md:66-69 shape)
twice through one shared ModelBundle — min_anchor_fill=True (the reference
schedule, 20 anchors / 11 scans) vs False (economy, 10 anchors / 10 scans) —
so the second mode reuses every compiled bucket the schedules share.

Prints one JSON line per mode. Run on the TPU chip:
    python benchmark/economy_ab.py [--frames 134] [--steps 50]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")


def run() -> None:
    import numpy as np

    from bench import BASELINE_FPS, H, STEPS, W, _full_scale_bundle
    from stable_virtual_camera_tpu.apps.renderer import (
        HeadlessRenderer,
        preprocess_basic,
    )

    frames = 134
    steps = STEPS
    if "--frames" in sys.argv:
        frames = int(sys.argv[sys.argv.index("--frames") + 1])
    if "--steps" in sys.argv:
        steps = int(sys.argv[sys.argv.index("--steps") + 1])

    bundle = _full_scale_bundle()
    work_dir = tempfile.mkdtemp(prefix="bench_economy_ab_")
    renderer = HeadlessRenderer(bundle, work_dir=work_dir)
    rng = np.random.default_rng(0)

    def make_plan(image, seed, fill):
        return renderer.prepare(
            preprocess_basic(image, shorter=min(H, W)),
            preset_traj="orbit",
            num_frames=frames,
            zoom_factor=0.5,
            chunk_strategy="interp-gt",
            cfg=4.0,
            num_steps=steps,
            seed=seed,
            min_anchor_fill=fill,
        )

    results = {}
    for fill in (True, False):
        img = rng.integers(0, 255, size=(H, W, 3), dtype=np.uint8)
        warm = list(renderer.run(make_plan(img, seed=23, fill=fill)))
        assert warm, "engine produced no output (warmup)"
        img2 = rng.integers(0, 255, size=(H, W, 3), dtype=np.uint8)
        plan = make_plan(img2, seed=24, fill=fill)
        t0 = time.perf_counter()
        videos = list(renderer.run(plan))
        total = time.perf_counter() - t0
        assert videos, "engine produced no output"
        fps = frames / total
        results[fill] = fps
        print(
            json.dumps(
                {
                    "metric": "e2e_134f_2pass_"
                    + ("fill" if fill else "economy"),
                    "value": round(fps, 4),
                    "unit": "frames/sec",
                    "vs_baseline": round(fps / BASELINE_FPS, 3),
                    "detail": {
                        "total_s": round(total, 1),
                        "first_pass_chunks": plan["first_pass_chunks"],
                        "second_pass_chunks": plan["second_pass_chunks"],
                    },
                }
            ),
            flush=True,
        )
    if results.get(False) and results.get(True):
        print(
            json.dumps(
                {
                    "metric": "economy_speedup",
                    "value": round(results[False] / results[True], 4),
                    "unit": "x",
                }
            ),
            flush=True,
        )
    shutil.rmtree(work_dir, ignore_errors=True)


if __name__ == "__main__":
    run()
