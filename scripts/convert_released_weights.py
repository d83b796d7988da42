"""Convert the released Stable Virtual Camera checkpoints to this framework.

The reference loads three frozen backbones at runtime (SURVEY.md §2.1 L0):
  * the 1.3B Seva UNet: `stabilityai/stable-virtual-camera` `model.safetensors`
    (reference seva/utils.py:29-56),
  * the SD2.1 VAE: `stabilityai/stable-diffusion-2-1-base` diffusers weights
    (reference seva/modules/autoencoder.py:12-17),
  * OpenCLIP ViT-H-14 `laion2b_s32b_b79k` image tower
    (reference seva/modules/conditioner.py:13-15).

This image has no network egress, so downloading cannot run here; on a
machine with the files this script performs the complete, validated
conversion:

    python scripts/convert_released_weights.py \
        --seva /path/to/model.safetensors \
        --vae /path/to/sd21_vae.safetensors \
        --clip /path/to/open_clip_pytorch_model.bin \
        --out checkpoints/converted

Validation performed (the same checks tests/test_convert_fullscale.py pins on
the reference architecture with random weights):
  * SHA256 of every input file is printed and stored in manifest.json —
    compare against the hashes on the model cards before trusting outputs,
  * strict conversion: zero missing / zero unexpected keys (the reference
    prints the same report at load, seva/utils.py:18-26),
  * converted leaf shapes equal the flax init shapes exactly,
  * parameter-count totals per model.

Output: an orbax/msgpack cache directory that `models/io.load_bundle`
consumes directly (apps/cli.py --checkpoint_dir).
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

import numpy as np


def sha256(path: str, chunk: int = 1 << 20) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        while True:
            b = f.read(chunk)
            if not b:
                break
            h.update(b)
    return h.hexdigest()


def _load_torch_or_safetensors(path: str) -> dict:
    if path.endswith(".safetensors"):
        from safetensors import safe_open

        out = {}
        with safe_open(path, framework="np") as f:
            for k in f.keys():
                out[k] = f.get_tensor(k)
        return out
    import torch

    try:
        sd = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        # the released dust3r .pth pickles an argparse.Namespace under
        # ckpt["args"], which weights_only rejects
        sd = torch.load(path, map_location="cpu", weights_only=False)
    for wrapper in ("state_dict", "model"):  # dust3r ckpts nest under "model"
        if isinstance(sd, dict) and wrapper in sd:
            sd = sd[wrapper]
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in sd.items()}


def _check_shapes(converted: dict, init_shapes) -> int:
    import jax

    flat_conv = jax.tree_util.tree_leaves_with_path(converted)
    flat_init = dict(
        (jax.tree_util.keystr(p), v.shape)
        for p, v in jax.tree_util.tree_leaves_with_path(init_shapes)
    )
    assert len(flat_conv) == len(flat_init), (
        f"leaf count mismatch: {len(flat_conv)} converted vs {len(flat_init)} expected"
    )
    n = 0
    for path, leaf in flat_conv:
        key = jax.tree_util.keystr(path)
        assert key in flat_init, f"unexpected leaf {key}"
        assert leaf.shape == flat_init[key], (key, leaf.shape, flat_init[key])
        n += int(np.prod(leaf.shape))
    return n


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--seva", help="path to model.safetensors (1.3B UNet)")
    ap.add_argument("--vae", help="path to SD2.1 VAE weights")
    ap.add_argument("--clip", help="path to OpenCLIP ViT-H-14 weights")
    ap.add_argument(
        "--dust3r",
        help="path to DUSt3R_ViTLarge_BaseDecoder_512_dpt weights (.pth/.safetensors)",
    )
    ap.add_argument(
        "--lpips_vgg",
        help="path to torchvision vgg16 weights (vgg16-397923af.pth) for the "
        "native LPIPS metric tower",
    )
    ap.add_argument(
        "--lpips_lin",
        help="path to the lpips package's v0.1 vgg.pth linear heads",
    )
    ap.add_argument("--out", required=True, help="output cache directory")
    ap.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from stable_virtual_camera_tpu.config import SevaSpec
    from stable_virtual_camera_tpu.models import convert as C
    from stable_virtual_camera_tpu.models.clip import ClipVisionSpec, ClipVisionTower
    from stable_virtual_camera_tpu.models.io import save_converted
    from stable_virtual_camera_tpu.models.unet import SevaUNet
    from stable_virtual_camera_tpu.models.vae import AutoEncoderKL

    dtype = np.dtype(jnp.bfloat16 if args.dtype == "bfloat16" else np.float32)
    manifest: dict = {"inputs": {}, "totals": {}, "dtype": args.dtype}
    params_by_model: dict = {}

    if args.seva:
        digest = sha256(args.seva)
        print(f"seva  sha256={digest}")
        manifest["inputs"]["seva"] = {"path": args.seva, "sha256": digest}
        spec = SevaSpec()
        sd = _load_torch_or_safetensors(args.seva)
        # strict=True == the reference's zero-missing/zero-unexpected report
        params = C.convert_seva_state_dict(sd, spec, dtype=dtype, strict=True)
        unet = SevaUNet(spec, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
        shapes = jax.eval_shape(
            lambda: unet.init(
                jax.random.PRNGKey(0),
                jnp.zeros((2, 8, 8, spec.in_channels)),
                jnp.zeros((2,), jnp.int32),
                jnp.zeros((2, 1, spec.context_dim)),
                jnp.zeros((2, 8, 8, spec.dense_in_channels)),
                num_frames=1,
            )["params"]
        )
        manifest["totals"]["seva"] = _check_shapes(params, shapes)
        params_by_model["unet"] = params  # load_bundle key
        print(f"seva  converted OK: {manifest['totals']['seva']:,} params")

    if args.vae:
        digest = sha256(args.vae)
        print(f"vae   sha256={digest}")
        manifest["inputs"]["vae"] = {"path": args.vae, "sha256": digest}
        sd = _load_torch_or_safetensors(args.vae)
        params = C.convert_vae_state_dict(sd, dtype=dtype, strict=True)
        vae = AutoEncoderKL(dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
        shapes = jax.eval_shape(
            lambda: vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))[
                "params"
            ]
        )
        manifest["totals"]["vae"] = _check_shapes(params, shapes)
        params_by_model["vae"] = params
        print(f"vae   converted OK: {manifest['totals']['vae']:,} params")

    if args.clip:
        digest = sha256(args.clip)
        print(f"clip  sha256={digest}")
        manifest["inputs"]["clip"] = {"path": args.clip, "sha256": digest}
        sd = _load_torch_or_safetensors(args.clip)
        spec = ClipVisionSpec()  # ViT-H-14
        if any(k.startswith("visual.") for k in sd):
            params = C.convert_clip_open_clip(sd, spec, dtype=dtype)
        else:
            params = C.convert_clip_hf(sd, spec, dtype=dtype)
        tower = ClipVisionTower(spec, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
        shapes = jax.eval_shape(
            lambda: tower.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)))[
                "params"
            ]
        )
        manifest["totals"]["clip"] = _check_shapes(params, shapes)
        params_by_model["clip"] = params
        print(f"clip  converted OK: {manifest['totals']['clip']:,} params")

    if args.dust3r:
        from stable_virtual_camera_tpu.models.convert_dust3r import (
            convert_dust3r_state_dict,
        )
        from stable_virtual_camera_tpu.models.dust3r import (
            AsymmetricCroCoStereo,
            Dust3rSpec,
        )

        digest = sha256(args.dust3r)
        print(f"dust3r sha256={digest}")
        manifest["inputs"]["dust3r"] = {"path": args.dust3r, "sha256": digest}
        sd = _load_torch_or_safetensors(args.dust3r)
        spec = Dust3rSpec()
        # the preprocessor runs fp32 (host stage); keep weights fp32
        params = convert_dust3r_state_dict(sd, spec)
        net = AsymmetricCroCoStereo(spec)
        p = spec.patch_size
        shapes = jax.eval_shape(
            lambda: net.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, p, p, 3)),
                jnp.zeros((1, p, p, 3)),
            )["params"]
        )
        manifest["totals"]["dust3r"] = _check_shapes(params, shapes)
        params_by_model["dust3r"] = params
        print(f"dust3r converted OK: {manifest['totals']['dust3r']:,} params")

    lpips_done = False
    if args.lpips_vgg or args.lpips_lin:
        assert args.lpips_vgg and args.lpips_lin, (
            "--lpips_vgg and --lpips_lin must be passed together"
        )
        from stable_virtual_camera_tpu.models.lpips import (
            convert_lpips,
            save_lpips,
        )

        for name, path in (("lpips_vgg", args.lpips_vgg),
                           ("lpips_lin", args.lpips_lin)):
            digest = sha256(path)
            print(f"{name} sha256={digest}")
            manifest["inputs"][name] = {"path": path, "sha256": digest}
        lpips_params = convert_lpips(
            _load_torch_or_safetensors(args.lpips_vgg),
            _load_torch_or_safetensors(args.lpips_lin),
        )
        manifest["totals"]["lpips"] = int(
            sum(
                int(np.prod(v.shape))
                for v in jax.tree_util.tree_leaves(lpips_params)
            )
        )
        lpips_done = True

        def _write_lpips():
            # called AFTER save_converted: the orbax force-save recreates
            # the output directory, which would wipe a pre-written file
            os.makedirs(args.out, exist_ok=True)
            lp_path = osp.join(args.out, "lpips.msgpack")
            save_lpips(lpips_params, lp_path)
            print(
                f"lpips converted OK -> {lp_path} "
                f"(score with SVC_LPIPS_WEIGHTS={lp_path})"
            )

    if not params_by_model:
        if lpips_done:
            _write_lpips()
            mpath = osp.join(args.out, "manifest.json")
            if osp.exists(mpath):
                with open(mpath) as f:
                    prior = json.load(f)
                prior.get("inputs", {}).update(manifest["inputs"])
                prior.get("totals", {}).update(manifest["totals"])
                manifest = {**prior, "dtype": manifest["dtype"]}
            with open(mpath, "w") as f:
                json.dump(manifest, f, indent=2)
            print(f"wrote {args.out} (lpips only)")
            return
        ap.error(
            "nothing to convert: pass at least one of "
            "--seva/--vae/--clip/--dust3r/--lpips_vgg+--lpips_lin"
        )

    os.makedirs(args.out, exist_ok=True)
    from stable_virtual_camera_tpu.config import SevaSpec as _SevaSpec
    from stable_virtual_camera_tpu.models.clip import (
        ClipVisionSpec as _ClipSpec,
    )

    specs = {}
    if "unet" in params_by_model:
        specs["seva"] = _SevaSpec()
    if "clip" in params_by_model:
        specs["clip"] = _ClipSpec()
    # Read the prior manifest BEFORE save_converted: its force-save
    # recreates the output directory, deleting any existing manifest.json.
    mpath = osp.join(args.out, "manifest.json")
    if osp.exists(mpath):  # incremental run: keep the other models' records
        with open(mpath) as f:
            prior = json.load(f)
        prior.get("inputs", {}).update(manifest["inputs"])
        prior.get("totals", {}).update(manifest["totals"])
        manifest = {**prior, "dtype": manifest["dtype"]}
    # a previously converted lpips.msgpack must survive the dir-recreating
    # orbax save (incremental model-only runs into the same --out)
    lp_path = osp.join(args.out, "lpips.msgpack")
    prior_lpips = None
    if not lpips_done and osp.exists(lp_path):
        with open(lp_path, "rb") as f:
            prior_lpips = f.read()
    # merges with prior conversions; specs.json self-describes the topology
    save_converted(params_by_model, args.out, specs=specs)
    if lpips_done:
        _write_lpips()  # after the dir-recreating orbax save
    elif prior_lpips is not None:
        with open(lp_path, "wb") as f:
            f.write(prior_lpips)
    with open(mpath, "w") as f:
        json.dump(manifest, f, indent=2)
    print(f"wrote {args.out} (manifest.json records input hashes)")


if __name__ == "__main__":
    main()
