"""HF-hub auto-download of the released checkpoints (reference
seva/utils.py:29-48 `load_model`, seva/modules/autoencoder.py:12-17,
conditioner.py:13-15, preprocessor.py:37-39 download their backbones at
first use).

This environment has no network egress, so the download cannot RUN here —
but the path exists end-to-end: on a connected machine,

    python -m stable_virtual_camera_tpu.models.hub --out checkpoints/converted

downloads every released backbone from the same repos the reference uses
and feeds them through the validated converters
(scripts/convert_released_weights.py) into a ready orbax cache that
`models/io.load_bundle` / `apps/cli.py --checkpoint_dir` consume directly.
Offline failures raise a clear actionable error instead of a stack trace.
"""

from __future__ import annotations

import os
import os.path as osp

# (component, repo_id, filename, revision) — the exact artifacts the
# reference pulls. cite: seva/utils.py:29-43 (UNet weights + config),
# autoencoder.py:12-17 (SD2.1 VAE via diffusers), conditioner.py:13-15
# (OpenCLIP ViT-H-14 laion2b_s32b_b79k), preprocessor.py:37-39 (DUSt3R).
RELEASED: dict[str, tuple[str, str]] = {
    "seva": ("stabilityai/stable-virtual-camera", "model.safetensors"),
    "seva_config": ("stabilityai/stable-virtual-camera", "config.yaml"),
    "vae": (
        "stabilityai/stable-diffusion-2-1-base",
        "vae/diffusion_pytorch_model.safetensors",
    ),
    "clip": (
        "laion/CLIP-ViT-H-14-laion2B-s32B-b79K",
        "open_clip_pytorch_model.bin",
    ),
    "dust3r": (
        "naver/DUSt3R_ViTLarge_BaseDecoder_512_dpt",
        "DUSt3R_ViTLarge_BaseDecoder_512_dpt.pth",
    ),
}


def download_released(
    cache_dir: str | None = None,
    components: tuple[str, ...] = ("seva", "seva_config", "vae", "clip"),
) -> dict[str, str]:
    """Download the released artifacts; returns {component: local_path}.

    Raises RuntimeError with an actionable message when the hub is
    unreachable (offline images like this one)."""
    from huggingface_hub import hf_hub_download

    out: dict[str, str] = {}
    for comp in components:
        repo_id, filename = RELEASED[comp]
        try:
            out[comp] = hf_hub_download(
                repo_id=repo_id, filename=filename, cache_dir=cache_dir
            )
        except Exception as e:  # noqa: BLE001 - offline/auth/404 all land here
            raise RuntimeError(
                f"could not download {filename} from {repo_id}: {e!r}. "
                "This environment may have no network egress — on a "
                "connected machine the same command completes, or pass "
                "local files to scripts/convert_released_weights.py "
                "directly."
            ) from e
    return out


def fetch_and_convert(
    out_dir: str,
    cache_dir: str | None = None,
    components: tuple[str, ...] = ("seva", "vae", "clip"),
    dtype: str = "bfloat16",
) -> str:
    """Download + convert in one step -> a load_bundle-ready cache dir."""
    import sys

    paths = download_released(
        cache_dir,
        components=tuple(components)
        + (("seva_config",) if "seva" in components else ()),
    )
    sys.path.insert(0, osp.join(osp.dirname(__file__), "..", "..", "scripts"))
    import convert_released_weights as crw

    argv = ["convert_released_weights.py", "--out", out_dir, "--dtype", dtype]
    for comp in ("seva", "vae", "clip", "dust3r"):
        if comp in paths:
            argv += [f"--{comp}", paths[comp]]
    old_argv = sys.argv
    sys.argv = argv
    try:
        crw.main()
    finally:
        sys.argv = old_argv
    return out_dir


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True, help="converted-cache output dir")
    ap.add_argument("--cache_dir", default=None, help="hf-hub download cache")
    ap.add_argument(
        "--components",
        default="seva,vae,clip",
        help="comma list from: seva,vae,clip,dust3r",
    )
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    args = ap.parse_args()
    out = fetch_and_convert(
        args.out,
        cache_dir=args.cache_dir,
        components=tuple(args.components.split(",")),
        dtype=args.dtype,
    )
    print(f"converted cache ready: {out}")


if __name__ == "__main__":
    main()
