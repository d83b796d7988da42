"""One-shot weight conversion: torch safetensors -> converted orbax cache.

Usage:
  python -m stable_virtual_camera_tpu.apps.convert_weights \
      --unet model.safetensors --vae vae.safetensors --clip clip.safetensors \
      --out converted_ckpt/

The UNet checkpoint is the released Seva `model.safetensors` (torch names,
reference seva/utils.py:29-56); the VAE is diffusers AutoencoderKL; the CLIP
tower accepts open_clip or HF-transformers naming.
"""

from __future__ import annotations

import sys

import numpy as np

from stable_virtual_camera_tpu.config import SevaSpec
from stable_virtual_camera_tpu.models.clip import ClipVisionSpec
from stable_virtual_camera_tpu.models import io as mio


def main(unet: str | None = None, vae: str | None = None, clip: str | None = None,
         dust3r: str | None = None, out: str = "converted_ckpt"):
    params: dict = {}
    if unet:
        params["unet"] = mio.load_seva_params(unet, SevaSpec(), param_dtype=np.float32)
        print(f"[convert] unet: {len(list(params['unet']))} top-level modules")
    if vae:
        params["vae"] = mio.load_vae_params(vae, param_dtype=np.float32)
        print("[convert] vae converted")
    if clip:
        params["clip"] = mio.load_clip_params(clip, ClipVisionSpec(), param_dtype=np.float32)
        print("[convert] clip converted")
    if dust3r:
        params["dust3r"] = mio.load_dust3r_params(dust3r)
        print("[convert] dust3r stereo net converted")
    assert params, "nothing to convert; pass --unet/--vae/--clip/--dust3r"
    specs = {}
    if unet:
        specs["seva"] = SevaSpec()
    if clip:
        specs["clip"] = ClipVisionSpec()
    # merges with any prior conversion in `out`; specs.json makes the
    # checkpoint self-describing for load_bundle
    mio.save_converted(params, out, specs=specs)
    print(f"[convert] saved converted checkpoint to {out}")


if __name__ == "__main__":
    from stable_virtual_camera_tpu.apps.cli import _parse_argv

    main(**_parse_argv(sys.argv[1:]))


def _main():
    """console_scripts entry (svc-convert)."""
    from stable_virtual_camera_tpu.apps.cli import _parse_argv

    main(**_parse_argv(sys.argv[1:]))
