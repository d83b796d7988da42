"""The 17 benchmark entries, machine-readable.

Encodes the reference's benchmark release table (reference
benchmark/README.md:6-148: dataset, split code, scene-folder path, image
pre/post-processing) together with the per-entry CLI flags the reference
recommends (reference docs/CLI_USAGE.md:60-110: trajectory priors, T
extension for the semi-dense and ViewCrafter splits, the RE10K single-view
cfg=6.0 rule, single-view camera-scale sweep), so `evaluate_split` and the
CLI can be driven per-entry without hand-copying flags.

Usage:
    from benchmark.entries import ENTRIES, cli_flags, eval_kwargs
    e = ENTRIES["re10k"]
    flags = cli_flags(e, num_inputs=1)      # -> dict of CLI kwargs
    scores = evaluate_split(pred_dir, scene_dir, 1, **eval_kwargs(e))
"""

from __future__ import annotations

from dataclasses import dataclass, field

# the 20-value camera-scale sweep for every single-view scenario
# (reference docs/CLI_USAGE.md:79)
SINGLE_VIEW_CAMERA_SCALES = [round(0.1 * i, 1) for i in range(1, 21)]


@dataclass(frozen=True)
class BenchmarkEntry:
    dataset: str
    split_code: str            # the table's split letter(s)
    path: str                  # scene-folder path inside benchmark.zip
    # preprocessing (model input):
    center_crop_input: int | None = 576   # "center crop to 576"
    l_short: int | None = None            # "resize shortest side to 576"
    # postprocessing (metric computation):
    post_center_crop: int | None = None
    post_resize: int | None = None
    # recommended generation flags:
    task: str = "img2img"
    traj_prior: str | None = None
    chunk_strategy: str | None = None
    T: int | list[int] | None = None      # zero-shot context extension
    cfg_single_view: float | None = None  # override when num_inputs == 1
    extra: dict = field(default_factory=dict)


ENTRIES: dict[str, BenchmarkEntry] = {
    e.path: e
    for e in [
        BenchmarkEntry("OmniObject3D", "S+O", "omniobject3d"),
        BenchmarkEntry("GSO", "S+O", "gso"),
        BenchmarkEntry(
            "RealEstate10K", "D", "re10k-4dim", post_resize=256,
            cfg_single_view=6.0,
        ),
        BenchmarkEntry("RealEstate10K", "R", "re10k", cfg_single_view=6.0),
        BenchmarkEntry(
            "RealEstate10K", "P", "re10k-pixelsplat", post_resize=256,
            cfg_single_view=6.0,
        ),
        BenchmarkEntry(
            "RealEstate10K", "V", "re10k-viewcrafter",
            center_crop_input=None, l_short=576, post_center_crop=576,
            T=25, cfg_single_view=6.0,
        ),
        BenchmarkEntry("LLFF", "R", "llff"),
        BenchmarkEntry("DTU", "R", "dtu"),
        BenchmarkEntry(
            "CO3D", "R", "co3d",
            traj_prior="orbit", chunk_strategy="nearest-gt",
        ),
        BenchmarkEntry(
            "CO3D", "V", "co3d-viewcrafter",
            center_crop_input=None, l_short=576, post_center_crop=576, T=25,
        ),
        BenchmarkEntry("WildRGB-D", "O-easy", "wildgbd/easy"),
        BenchmarkEntry("WildRGB-D", "O-hard", "wildgbd/hard"),
        BenchmarkEntry("Mip-NeRF360", "R", "mipnerf360"),
        BenchmarkEntry("DL3DV-140", "O", "dl3dv10", T=90),
        BenchmarkEntry("DL3DV-140", "L", "dl3dv140", T=90),
        BenchmarkEntry(
            "TanksAndTemples", "V", "tnt-viewcrafter",
            center_crop_input=None, l_short=576, post_center_crop=576, T=25,
        ),
        BenchmarkEntry("TanksAndTemples", "L", "tnt-longlrm", T=80),
    ]
}
assert len(ENTRIES) == 17, len(ENTRIES)


def cli_flags(entry: BenchmarkEntry, num_inputs: int) -> dict:
    """CLI kwargs for one entry at a given input count (reference
    docs/CLI_USAGE.md:60-110). The semi-dense T extensions (dl3dv/tnt-longlrm)
    apply at 32 input views; the V-split T=25 applies always."""
    flags: dict = {"task": entry.task, "num_inputs": num_inputs,
                   "video_save_fps": 10}
    if entry.l_short:
        flags["L_short"] = entry.l_short
    if entry.traj_prior:
        flags.update(
            use_traj_prior=True,
            traj_prior=entry.traj_prior,
            chunk_strategy=entry.chunk_strategy or "nearest-gt",
        )
    if entry.T is not None:
        is_semi_dense_T = entry.path in ("dl3dv10", "dl3dv140", "tnt-longlrm")
        if not is_semi_dense_T or num_inputs >= 32:
            flags["T"] = entry.T
    if num_inputs == 1:
        if entry.cfg_single_view is not None:
            flags["cfg"] = entry.cfg_single_view
        flags["camera_scale_sweep"] = SINGLE_VIEW_CAMERA_SCALES
    return flags


def eval_kwargs(entry: BenchmarkEntry) -> dict:
    """`evaluate_split` post-processing kwargs for one entry
    (reference benchmark/README.md:150-152)."""
    return {
        "center_crop": entry.post_center_crop,
        "resize_to": entry.post_resize,
    }
