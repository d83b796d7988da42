"""Typed configuration for the whole framework.

Replaces the reference's three ad-hoc config layers (reference
seva/model.py:17-36 `SevaParams`, demo.py:53-60 `VERSION_DICT`, and the ~30-key
untyped `options` dict read via `options.get` throughout seva/eval.py) with
dataclasses, while preserving every option's name, default and behavior.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any


@dataclass(frozen=True)
class SevaSpec:
    """Architecture hyperparameters of the multiview diffusion UNet.

    Mirrors the capability surface of reference seva/model.py:17-36.
    `in_channels=11` = 4 latent + 1 input-mask + 6 Plücker channels.
    """

    in_channels: int = 11
    model_channels: int = 320
    out_channels: int = 4
    num_frames: int = 21
    num_res_blocks: int = 2
    attention_resolutions: tuple[int, ...] = (4, 2, 1)
    channel_mult: tuple[int, ...] = (1, 2, 4, 4)
    num_head_channels: int = 64
    transformer_depth: tuple[int, ...] = (1, 1, 1, 1)
    context_dim: int = 1024
    dense_in_channels: int = 6
    dropout: float = 0.0
    unflatten_names: tuple[str, ...] = ("middle_ds8", "output_ds4", "output_ds2")

    def __post_init__(self) -> None:
        assert len(self.channel_mult) == len(self.transformer_depth)

    @staticmethod
    def tiny() -> "SevaSpec":
        """A topology-complete but tiny spec for tests (CPU-feasible)."""
        return SevaSpec(
            model_channels=32,
            num_frames=3,
            num_head_channels=16,
            context_dim=64,
        )


@dataclass
class VersionConfig:
    """Resolution / context-window config (reference demo.py:53-60 VERSION_DICT).

    `T` may be an int (single pass) or a [T_first, T_second] pair; it is
    dynamically rewritten by `infer_prior_stats` in the semi-dense regime
    (reference seva/eval.py:387,420), which we preserve.
    """

    H: int = 576
    W: int = 576
    T: int | list[int] = 21
    C: int = 4
    f: int = 8

    @property
    def latent_hw(self) -> tuple[int, int]:
        return self.H // self.f, self.W // self.f

    def T_pair(self) -> tuple[int, int]:
        if isinstance(self.T, (list, tuple)):
            return int(self.T[0]), int(self.T[1])
        return int(self.T), int(self.T)


@dataclass
class EngineOptions:
    """All engine knobs, preserving names/defaults of the reference's `options`
    dict (inventory: SURVEY.md §5.6; defaults from reference demo.py:292-306 and
    seva/eval.py `options.get(...)` call sites)."""

    chunk_strategy: str = "nearest-gt"
    chunk_strategy_first_pass: str = "gt-nearest"
    video_save_fps: float = 30.0
    beta_linear_start: float = 5e-6
    beta_linear_end: float = 0.012
    log_snr_shift: float | None = 2.4
    guider_types: int | list[int] = 1
    cfg: float | list[float] = 2.0
    cfg_min: float = 1.2
    camera_scale: float = 2.0
    num_steps: int = 50
    encoding_t: int = 1
    decoding_t: int = 1
    num_inputs: int | str | None = None
    seed: int = 23
    num_targets: int | None = None
    traj_prior: str | None = None
    num_prior_frames: int = 0
    num_prior_frames_ratio: float = 1.0
    num_input_semi_dense: int = 9
    pseudo_num_ratio: float = 0.33
    pseudo_num_max: int = 10000
    t_padding_mode: str = "last"
    transform_input: str = "crop"
    transform_target: str = "crop"
    transform_scale: float = 1.0
    L_short: int = -1
    ltr_first_pass: bool = False
    sampler_verbose: bool = True
    save_input: bool = True
    save_first_pass: bool = True
    save_second_pass: bool = False
    replace_or_include_input: bool = False
    skip_saved: bool = False
    # TPU-specific additions (absent in the reference):
    # min_anchor_fill=False (the default) keeps the first-pass anchor
    # count at the feasibility minimum ceil(N/(T-2-gt_inputs))+1 with
    # dense placement (engine/prior.plan_dense_anchors) instead of
    # filling the first-pass window to T-1 anchors (reference
    # seva/eval.py:404-407 always fills; set min_anchor_fill=True for
    # that schedule). Fewer anchors occupy fewer second-pass chunk
    # slots, so the schedule needs fewer denoise scans (orbit-134:
    # 11 -> 9; measured on-chip 0.3413 vs 0.2481 f/s e2e, 1.376x —
    # round-4 journal); anchors are correspondingly sparser.
    min_anchor_fill: bool = False
    # deliver_anchors (TPU addition): targets whose pose coincides with a
    # first-pass anchor are delivered straight from the first pass instead
    # of being re-denoised in the second pass (the reference re-samples
    # every target, seva/eval.py:1837-1956). Combined with dense anchor
    # placement (engine/prior.plan_dense_anchors) the baseline's orbit-134
    # workload drops from 11 scans to 8 (measured 0.4271 vs 0.3809 f/s e2e,
    # round-4 journal). None (the default) = AUTO: on whenever the dense
    # economy schedule is active (resolve_anchors), off otherwise —
    # reference-schedule runs (min_anchor_fill=True) and direct
    # run_one_scene callers (None is falsy) are unaffected. Quality gate
    # rationale + divergence measurement: benchmark/deliver_divergence.py
    # and docs/ARCHITECTURE.md (round-5 journal); mechanism precedents: the
    # reference itself splices conditioning frames into coincident output
    # positions (replace_or_include_input, seva/eval.py:893-919) and
    # presents the first-pass video as user-visible output
    # (demo_gr.py:664-701). The engine verifies pose+K identity before
    # delivering any frame (engine/runner.py deliver branch).
    deliver_anchors: bool | None = None
    param_dtype: str = "bfloat16"
    use_pallas_attention: bool = True
    mesh_view_axis: int = 1  # number of devices to shard the view/T axis over

    extras: dict[str, Any] = field(default_factory=dict)

    def get(self, key: str, default: Any = None) -> Any:
        """`options.get`-compatible accessor so engine code reads one way."""
        if hasattr(self, key) and key != "extras":
            return getattr(self, key)
        return self.extras.get(key, default)

    def set(self, key: str, value: Any) -> None:
        if hasattr(self, key) and key != "extras":
            setattr(self, key, value)
        else:
            self.extras[key] = value

    def update(self, other: dict[str, Any]) -> "EngineOptions":
        for k, v in other.items():
            self.set(k, v)
        return self

    def to_dict(self) -> dict[str, Any]:
        d = {
            f.name: getattr(self, f.name)
            for f in dataclasses.fields(self)
            if f.name != "extras"
        }
        d.update(self.extras)
        return d
