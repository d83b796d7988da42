"""CLI: AOT-export the denoise-scan programs for deployment.

Builds the model bundle (converted weights or --random_model), exports one
`jax.export` artifact per T shape bucket plus a pinning manifest
(models/export.py), ready for `apps.server --artifact_dir`.

  python -m stable_virtual_camera_tpu.apps.export_artifacts \
      --checkpoint_dir ckpts/ --out_dir artifacts/ \
      [--num_steps 50] [--T "[21]"] [--H 576] [--W 576] \
      [--platforms "['tpu']"]
"""

from __future__ import annotations

import sys


def main(
    out_dir,
    checkpoint_dir=None,
    random_model=False,
    H=None,
    W=None,
    T=None,
    num_steps=50,
    platforms=None,
):
    from stable_virtual_camera_tpu.apps.cli import _build_bundle
    from stable_virtual_camera_tpu.config import VersionConfig
    from stable_virtual_camera_tpu.models.export import export_denoise_buckets

    bundle, is_tiny = _build_bundle(checkpoint_dir, random_model)
    version = (
        VersionConfig(H=64, W=64, T=bundle.spec.num_frames)
        if is_tiny
        else VersionConfig()
    )
    if H is not None:
        version.H = int(H)
    if W is not None:
        version.W = int(W)
    if T is not None:
        version.T = [int(x) for x in T] if isinstance(T, list) else int(T)
    if isinstance(platforms, str):
        platforms = [platforms]
    export_denoise_buckets(
        bundle.denoiser,
        bundle.spec,
        version.latent_hw,
        version.T,
        int(num_steps),
        out_dir,
        platforms=platforms,
    )
    print(f"[export] wrote manifest + buckets to {out_dir}")


if __name__ == "__main__":
    from stable_virtual_camera_tpu.apps.cli import _parse_argv

    main(**_parse_argv(sys.argv[1:]))
