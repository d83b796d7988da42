"""One-command quality evaluation over the benchmark's 17 entries.

Drives the CLI per entry/scene with the reference-recommended flags
(benchmark/entries.py, from reference benchmark/README.md:6-152 and
docs/CLI_USAGE.md:60-110), then scores the generated frames against the
split's held-out test views with the per-entry post-processing
(PSNR/SSIM/LPIPS, benchmark/metrics.py). This is the north-star acceptance
path (BASELINE.json): the day real converted weights are available,

    python -m benchmark.run_eval --benchmark_dir /data/benchmark \
        --checkpoint_dir /ckpts/seva --out scores.json

produces the full 17-split table. The identical path dry-runs end-to-end with
`--random_model True` on synthetic scenes (tests/test_benchmark_harness.py),
so weights are the only missing input.

Layout expected under --benchmark_dir: one folder per entry path (e.g.
re10k/, llff/, co3d/), each containing reconfusion-format scene folders
(transforms.json + train_test_split_N.json), exactly as the reference's
benchmark.zip release unpacks.
"""

from __future__ import annotations

import glob as globlib
import json
import os
import os.path as osp
import sys


def _scene_split_counts(scene_dir: str) -> list:
    """Available #input-view splits for a scene (train_test_split_*.json)."""
    out = []
    for f in globlib.glob(osp.join(scene_dir, "train_test_split_*.json")):
        token = osp.basename(f)[len("train_test_split_"):-len(".json")]
        out.append(int(token) if token.isdigit() else token)
    return sorted(out, key=str)


def _entry_scenes(entry_dir: str) -> list[str]:
    """Scene folders inside an entry directory (a folder IS a scene when it
    holds a transforms.json)."""
    return sorted(
        d
        for d in os.listdir(entry_dir)
        if osp.isdir(osp.join(entry_dir, d))
        and osp.exists(osp.join(entry_dir, d, "transforms.json"))
    )


def run_eval(
    benchmark_dir: str,
    checkpoint_dir: str | None = None,
    random_model: bool = False,
    entries=None,
    num_inputs=None,
    work_dir: str = "work_dirs/benchmark_eval",
    sweep: bool = False,
    out: str | None = None,
    max_scenes: int | None = None,
    **overrides,
):
    """Generate + score the requested entries; returns {entry: scores}.

    `sweep` enables the reference's single-view camera-scale sweep
    (docs/CLI_USAGE.md:79: 0.1..2.0, best PSNR per scene kept); off by
    default since it multiplies generation cost 20x.
    `overrides` are forwarded to the CLI (e.g. num_steps=2 for dry runs, or
    `--quant w8a8` to score the int8 serving path against the same splits —
    the bf16-vs-w8a8 PSNR/LPIPS delta is the quantization quality evidence
    once real weights land).
    """
    from benchmark.entries import ENTRIES, cli_flags, eval_kwargs
    from benchmark.metrics import evaluate_split
    from stable_virtual_camera_tpu.apps import cli as cli_mod

    # Quality-parity harness: reproduce the reference's anchor schedule
    # (fill-to-T-1 + round(linspace), seva/eval.py:404-407) by default so
    # scores compare against the reference pipeline's own plan; pass
    # min_anchor_fill=False to score the TPU economy schedule instead.
    overrides.setdefault("min_anchor_fill", True)

    if entries is None:
        selected = dict(ENTRIES)
    else:
        if isinstance(entries, str):
            entries = entries.split(",")
        selected = {k: ENTRIES[k] for k in entries}

    results: dict = {}
    for key, entry in selected.items():
        entry_dir = osp.join(benchmark_dir, entry.path)
        if not osp.isdir(entry_dir):
            results[key] = {"skipped": f"no data at {entry_dir}"}
            continue
        scenes = _entry_scenes(entry_dir)
        if max_scenes:
            scenes = scenes[:max_scenes]
        if not scenes:
            results[key] = {"skipped": "no scenes"}
            continue

        per_scene = []
        for scene in scenes:
            scene_dir = osp.join(entry_dir, scene)
            n_in = num_inputs
            if n_in is None:
                counts = _scene_split_counts(scene_dir)
                assert counts, f"{scene_dir} has no train_test_split files"
                n_in = counts[0]
            flags = cli_flags(entry, num_inputs=n_in)
            task = flags.pop("task")
            use_traj_prior = flags.pop("use_traj_prior", False)
            T = flags.pop("T", None)
            scales = flags.pop("camera_scale_sweep", None)
            if not (sweep and scales):
                scales = [flags.pop("camera_scale", 2.0)]
            flags.update(overrides)

            best = None
            for cs in scales:
                subdir = f"{key.replace('/', '_')}-cs{cs}"
                cli_mod.main(
                    data_path=entry_dir,
                    data_items=[scene],
                    task=task,
                    save_subdir=subdir,
                    T=T,
                    use_traj_prior=use_traj_prior,
                    checkpoint_dir=checkpoint_dir,
                    random_model=random_model,
                    work_dir=work_dir,
                    camera_scale=cs,
                    **flags,
                )
                pred_dir = osp.join(work_dir, task, subdir, scene)
                scores = evaluate_split(
                    pred_dir, scene_dir, n_in, **eval_kwargs(entry)
                )
                scores["camera_scale"] = cs
                if best is None or scores["psnr"] > best["psnr"]:
                    best = scores
            per_scene.append(best)

        agg = {
            m: float(sum(s[m] for s in per_scene) / len(per_scene))
            for m in ("psnr", "ssim", "lpips")
            if all(m in s for s in per_scene)
        }
        agg["num_scenes"] = len(per_scene)
        agg["per_scene"] = per_scene
        results[key] = agg
        print(f"[run_eval] {entry.dataset} ({entry.split_code}) {key}: " + ", ".join(
            f"{m}={agg[m]:.3f}" for m in ("psnr", "ssim", "lpips") if m in agg
        ))

    _print_table(results, selected)
    if out:
        with open(out, "w") as f:
            json.dump(results, f, indent=2)
        print(f"[run_eval] wrote {out}")
    return results


def _print_table(results: dict, selected: dict) -> None:
    print(f"\n{'entry':<22}{'split':<8}{'psnr':>8}{'ssim':>8}{'lpips':>8}{'scenes':>8}")
    for key, scores in results.items():
        e = selected[key]
        if "skipped" in scores:
            print(f"{key:<22}{e.split_code:<8}{'-':>8}{'-':>8}{'-':>8}  {scores['skipped']}")
            continue
        print(
            f"{key:<22}{e.split_code:<8}"
            f"{scores.get('psnr', float('nan')):>8.3f}"
            f"{scores.get('ssim', float('nan')):>8.4f}"
            + (f"{scores['lpips']:>8.4f}" if "lpips" in scores else f"{'-':>8}")
            + f"{scores['num_scenes']:>8}"
        )


if __name__ == "__main__":
    from stable_virtual_camera_tpu.apps.cli import _parse_argv

    run_eval(**_parse_argv(sys.argv[1:]))
