"""Anchor ("prior") frame planning for two-pass sampling.

Capability parity with reference seva/eval.py:344-490
(`infer_prior_stats`, `infer_prior_inds`, `compute_relative_inds`).
"""

from __future__ import annotations

import math
import os

import numpy as np


def infer_prior_stats(
    T: int | list[int] | tuple[int, int],
    num_input_frames: int,
    num_total_frames: int,
    version_config,
    options,
) -> int:
    """Decide how many anchor frames the first pass should generate.

    Semi-dense regime (>= `num_input_semi_dense` inputs) dynamically grows the
    first-pass context window and REWRITES `version_config.T` in place, exactly
    like the reference mutates `version_dict["T"]` (seva/eval.py:387,420).
    """
    chunk_strategy = options.get("chunk_strategy", "nearest")
    T_first_pass = T[0] if isinstance(T, (list, tuple)) else T
    T_second_pass = T[1] if isinstance(T, (list, tuple)) else T

    if chunk_strategy.startswith("interp"):
        if num_input_frames >= options.get("num_input_semi_dense", 9):
            num_prior_frames = (
                math.ceil(
                    num_total_frames
                    / (T_second_pass - 2)
                    * options.get("num_prior_frames_ratio", 1.0)
                )
                + 1
            )
            if num_prior_frames + num_input_frames < T_first_pass:
                num_prior_frames = T_first_pass - num_input_frames
            num_prior_frames = max(
                num_prior_frames, options.get("num_prior_frames", 0)
            )
            T_first_pass = num_prior_frames + num_input_frames
            if "gt" in chunk_strategy:
                T_second_pass = T_second_pass + num_input_frames
            version_config.T = [T_first_pass, T_second_pass]
        else:
            num_prior_frames = (
                math.ceil(
                    num_total_frames
                    / (
                        T_second_pass
                        - 2
                        - (num_input_frames if "gt" in chunk_strategy else 0)
                    )
                    * options.get("num_prior_frames_ratio", 1.0)
                )
                + 1
            )
            economy = False
            if num_prior_frames + num_input_frames < T_first_pass:
                if options.get("min_anchor_fill", True):
                    num_prior_frames = T_first_pass - num_input_frames
                else:
                    # Economy mode (TPU addition, EngineOptions.min_anchor_fill):
                    # keep the anchor count near the feasibility minimum and
                    # shrink the first-pass window to fit it — fewer anchors
                    # leave more target slots per second-pass chunk, so the
                    # schedule needs fewer denoise scans. The reference always
                    # fills to T-1 anchors here (seva/eval.py:404-407).
                    # +1 slack anchor: round(linspace) anchor placement can
                    # overfill a single inter-anchor gap by one target, which
                    # would break the planner's per-gap bound (T-2-gt) at the
                    # exact minimum; one extra anchor restores feasibility for
                    # every workload size (swept N=3..299 in test_planner).
                    economy = True
                    num_prior_frames += 1
            num_prior_frames = max(
                num_prior_frames, options.get("num_prior_frames", 0)
            )
            if economy:
                # fit the window to the anchor count, never growing past the
                # configured first-pass bucket (a user-supplied
                # num_prior_frames above the minimum must not silently widen T)
                T_first_pass = min(
                    num_prior_frames + num_input_frames, T_first_pass
                )
                version_config.T = [T_first_pass, T_second_pass]
    else:
        num_prior_frames = max(
            T_first_pass - num_input_frames, options.get("num_prior_frames", 0)
        )
        if num_input_frames >= options.get("num_input_semi_dense", 9):
            T_first_pass = num_prior_frames + num_input_frames
            version_config.T = [T_first_pass, T_second_pass]

    return num_prior_frames


def plan_dense_anchors(
    num_targets: int,
    T_second: int,
    num_gt_inputs: int,
    deliver: bool = False,
) -> list[int]:
    """Place first-pass anchors at exact target indices so the second-pass
    interp schedule is maximally dense (TPU addition; no reference analogue —
    the reference always places `round(linspace)` anchors, seva/eval.py:425-436,
    demo_gr.py:531-536, whose rounding can overfill a gap).

    An interp[-gt] chunk packs densest with ONE full anchor gap:
    gt + anchor + (T-2-gt targets) + anchor == T slots exactly; packing two
    gaps into a chunk always delivers fewer targets (each extra gap costs an
    extra anchor slot). So the optimal schedule uses the minimum number of
    balanced gaps, each at most `cap = T_second - 2 - num_gt_inputs` targets:

    - deliver=False: every target is re-denoised in pass 2 (reference
      semantics). k = ceil((N-1)/cap) gaps -> k+1 anchors.
    - deliver=True (`deliver_anchors`): targets coincident with an anchor are
      delivered straight from the first pass, so a gap of width g samples
      only g-1 targets. k = ceil((N-1)/(cap+1)) gaps -> k+1 anchors, and for
      the baseline's orbit-134 workload every second-pass chunk packs to
      exactly T slots (7 chunks x 18 new frames).

    Returns sorted integer anchor positions in [0, num_targets-1], always
    including both endpoints.
    """
    cap = T_second - 2 - num_gt_inputs
    assert cap >= 1, (
        f"no target slots: T_second={T_second} with {num_gt_inputs} gt inputs"
    )
    if num_targets <= 2:
        return list(range(num_targets))
    stride = cap + 1 if deliver else cap
    k = max(1, math.ceil((num_targets - 1) / stride))
    while True:
        pos = sorted(
            {round(i * (num_targets - 1) / k) for i in range(k + 1)}
        )
        widths = [b - a for a, b in zip(pos, pos[1:])]
        # A gap [a_i, a_{i+1}) samples its width targets (the target at a_i
        # is inside it); with deliver=True the anchor-coincident target is
        # delivered instead, so one fewer. The final target sits at the last
        # anchor's ordinal and joins the LAST gap (the planner nudges the
        # last anchor ordinal by +0.01, planner._plan_interp), costing it one
        # extra slot in non-deliver mode.
        sampled = [w - 1 if deliver else w for w in widths]
        if not deliver:
            sampled[-1] += 1
        if all(s <= cap for s in sampled):
            return pos
        k += 1  # balanced rounding overfilled a gap; one more anchor fixes it


def resolve_anchors(
    T: int | list[int] | tuple[int, int],
    num_input_frames: int,
    num_total_frames: int,
    version_config,
    options,
) -> tuple[list[float], bool]:
    """One decision point for anchor count + placement, shared by every
    trajectory-prior surface (HeadlessRenderer.prepare, apps/cli.py
    img2trajvid): dense economy placement when enabled and applicable
    (min_anchor_fill=False, interp strategy, sparse-input regime), else the
    reference's infer_prior_stats count with linspace placement
    (seva/eval.py:344-422 + demo.py:231-256).

    Returns (anchor positions RELATIVE to the ordered target list — integers
    when dense, possibly fractional otherwise — and whether dense placement
    was used). Rewrites `version_config.T` exactly like infer_prior_stats.
    When dense placement is NOT used, options.deliver_anchors is forced off:
    delivery requires anchors at exact integer target positions.
    """
    chunk_strategy = options.get("chunk_strategy", "nearest")
    T_first = T[0] if isinstance(T, (list, tuple)) else T
    T_second = T[1] if isinstance(T, (list, tuple)) else T
    use_dense = (
        not options.get("min_anchor_fill", True)
        and chunk_strategy.startswith("interp")
        and num_input_frames < options.get("num_input_semi_dense", 9)
    )
    if use_dense:
        if options.get("deliver_anchors", None) is None:
            # AUTO (config.deliver_anchors=None): delivery rides the dense
            # economy schedule it was co-designed with — the measured-best
            # plan (8 scans, 0.4271 f/s round-4) becomes the default while
            # reference-schedule runs below stay untouched.
            options.set("deliver_anchors", True)
        rel = plan_dense_anchors(
            num_total_frames,
            T_second,
            num_input_frames if "gt" in chunk_strategy else 0,
            deliver=bool(options.get("deliver_anchors", False)),
        )
        T_first_dense = min(len(rel) + num_input_frames, T_first)
        # Serving knob: dense T_first varies with the workload's anchor
        # count, and every distinct T is a fresh denoise-scan compile.
        # SVC_TFIRST_BUCKETS="8,12,16,21" rounds UP to a fixed ladder
        # (padded slots are NULL-planned) so a server compiles a bounded
        # bucket set; unset = exact T (fastest for a pinned workload).
        ladder = os.environ.get("SVC_TFIRST_BUCKETS")
        if ladder:
            for b in sorted(int(x) for x in ladder.split(",")):
                if b >= T_first_dense:
                    T_first_dense = min(b, T_first)
                    break
        version_config.T = [T_first_dense, T_second]
        return [float(r) for r in rel], True
    if options.get("deliver_anchors", False) or (
        options.get("deliver_anchors", None) is None
    ):
        options.set("deliver_anchors", False)
    n = infer_prior_stats(
        T, num_input_frames, num_total_frames, version_config, options
    )
    return np.linspace(0, num_total_frames - 1, n).tolist(), False


def infer_prior_inds(
    c2ws: np.ndarray,
    num_prior_frames: int,
    input_frame_indices,
    options,
) -> np.ndarray:
    """Pick anchor indices among targets: equally spaced (interp) or greedy
    farthest-from-covered (reference seva/eval.py:425-453)."""
    chunk_strategy = options.get("chunk_strategy", "nearest")
    if chunk_strategy.startswith("interp"):
        prior_frame_indices = np.array(
            [i for i in range(c2ws.shape[0]) if i not in input_frame_indices]
        )
        prior_frame_indices = prior_frame_indices[
            np.ceil(
                np.linspace(
                    0, prior_frame_indices.shape[0] - 1, num_prior_frames, endpoint=True
                )
            ).astype(int)
        ]
    else:
        prior_frame_indices: list[int] = []
        while len(prior_frame_indices) < num_prior_frames:
            closest_distance = np.abs(
                np.arange(c2ws.shape[0])[None]
                - np.concatenate(
                    [np.array(input_frame_indices), np.array(prior_frame_indices)]
                )[:, None]
            ).min(0)
            prior_frame_indices.append(int(np.argsort(closest_distance)[-1]))
    return np.sort(prior_frame_indices)


def compute_relative_inds(source_inds: np.ndarray, target_inds: np.ndarray) -> list:
    """Map absolute ids into (fractional) positions relative to a sampled
    sequence (reference seva/eval.py:456-490)."""
    assert len(source_inds) > 2
    relative_inds = []
    for ind in target_inds:
        if ind in source_inds:
            relative_ind = int(np.where(source_inds == ind)[0][0])
        elif ind < source_inds[0]:
            relative_ind = -((source_inds[0] - ind) / (source_inds[1] - source_inds[0]))
        elif ind > source_inds[-1]:
            relative_ind = len(source_inds) + (
                (ind - source_inds[-1]) / (source_inds[-1] - source_inds[-2])
            )
        else:
            lower_inds = source_inds[source_inds < ind]
            upper_inds = source_inds[source_inds > ind]
            if len(lower_inds) > 0 and len(upper_inds) > 0:
                lower_ind = lower_inds[-1]
                upper_ind = upper_inds[0]
                relative_lower_ind = int(np.where(source_inds == lower_ind)[0][0])
                relative_upper_ind = int(np.where(source_inds == upper_ind)[0][0])
                relative_ind = relative_lower_ind + (ind - lower_ind) / (
                    upper_ind - lower_ind
                ) * (relative_upper_ind - relative_lower_ind)
            else:
                relative_inds.append(float("nan"))
                continue
        relative_inds.append(relative_ind)
    return relative_inds
