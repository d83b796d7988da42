"""Schedule-level fan-out simulation: scans, DP groups and projected wall
time for the baseline's 134-frame Advanced workload across mesh 'data' sizes.

Pure host planning (no model) — the per-scan costs are the round-3/4 on-chip
measurements (~39 s per T=21 denoise scan incl. decode; first-pass scans
scale roughly with T). Engine equality serial==DP is proven separately
(tests/test_parallel.py::test_engine_data_parallel_second_pass and
::test_engine_mesh_fanout_economy); this table records what the schedule
fan-out BUYS at chip counts this box cannot host (the driver validates the
sharded programs via __graft_entry__.dryrun_multichip).

Run: python benchmark/mesh_fanout_sim.py [--frames 134]
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

import numpy as np

from stable_virtual_camera_tpu.config import EngineOptions, VersionConfig
from stable_virtual_camera_tpu.engine import planner, prior

T = 21
# measured per-T=21-scan wall (denoise 50 steps + deferred decode + flush
# sync; back-computed from the round-4 bench: (351.8 - 20.5 first pass -
# 13 host) / 8 chunks) and fixed host overhead per render
# (prime/build/saves/prepare) — bench decomposition in docs/ARCHITECTURE.md.
# Round-5 validation: the deliver D=1 row projects 0.434 f/s; the measured
# round-5 headline (deliver-auto default, median of 3) is 0.4307 — 0.8%
# error, so the D=2/4/8 projections (1.31x/2.26x/3.55x baseline) carry the
# same calibration.
SCAN_S = 39.8
HOST_S = 13.0


def plan_schedule(N: int, mode: str):
    """Returns (first_chunks, T_first, second_chunks) for one schedule mode."""
    rng = np.random.default_rng(0)
    num_inputs = 1
    c2ws = np.tile(np.eye(4)[None], (num_inputs + N, 1, 1))
    c2ws[:, :3, 3] = rng.normal(size=(num_inputs + N, 3))
    input_c2ws, target_c2ws = c2ws[:num_inputs], c2ws[num_inputs:]
    opts = EngineOptions(chunk_strategy="interp-gt", sampler_verbose=False)
    version = VersionConfig()

    if mode == "fill":
        # pin the reference schedule: the EngineOptions default is economy
        opts = opts.update(dict(min_anchor_fill=True))
        na = prior.infer_prior_stats(T, num_inputs, N, version, opts)
        anchor_idx = [
            round(i) for i in np.linspace(num_inputs, num_inputs + N - 1, na)
        ]
        T_first = T
        deliver = False
    else:
        deliver = mode == "deliver"
        rel = prior.plan_dense_anchors(N, T, num_inputs, deliver=deliver)
        anchor_idx = [num_inputs + r for r in rel]
        T_first = min(len(anchor_idx) + num_inputs, T)

    p1 = planner.chunk_input_and_test(
        T_first, input_c2ws, c2ws[anchor_idx], list(range(num_inputs)),
        anchor_idx, options=opts, task="img2trajvid",
        chunk_strategy="gt-nearest", gt_input_inds=list(range(num_inputs)),
        verbose=False,
    )
    test_indices = list(range(num_inputs, num_inputs + N))
    if deliver:
        pset = set(anchor_idx)
        keep = [j for j, t in enumerate(test_indices) if t not in pset]
    else:
        keep = list(range(N))
    cond = np.concatenate([input_c2ws, c2ws[anchor_idx]], 0)
    p2 = planner.chunk_input_and_test(
        T, cond, target_c2ws[keep],
        sorted(list(range(num_inputs)) + anchor_idx),
        [test_indices[j] for j in keep], options=opts, task="img2trajvid",
        chunk_strategy="interp-gt", gt_input_inds=list(range(num_inputs)),
        verbose=False,
    )
    return len(p1.input_inds_per_chunk), T_first, len(p2.input_inds_per_chunk)


def main() -> None:
    N = 134
    if "--frames" in sys.argv:
        N = int(sys.argv[sys.argv.index("--frames") + 1])
    rows = []
    for mode in ("fill", "dense", "deliver"):
        n1, T_first, n2 = plan_schedule(N, mode)
        for D in (1, 2, 4, 8):
            # second-pass chunks fan out in groups of D (runner sample_many);
            # a final partial group is padded to D and runs as one dispatch.
            # First pass is sequential (anchors feed back autoregressively
            # across its chunks).
            groups = -(-n2 // D)
            wall = n1 * SCAN_S * T_first / T + groups * SCAN_S + HOST_S
            rows.append(
                {
                    "mode": mode,
                    "mesh_data": D,
                    "first_chunks": n1,
                    "T_first": T_first,
                    "second_chunks": n2,
                    "second_groups": groups,
                    "projected_wall_s": round(wall, 1),
                    "projected_fps": round(N / wall, 3),
                }
            )
    print(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()
