"""Day-0 real-weights drill: the complete convert -> orbax -> evaluate path
at full 1.3B scale, executable TODAY with synthetic weights.

The released checkpoints cannot be downloaded in this image (no egress), so
the quality pipeline's scale-readiness is proven by substituting
synthetic weights of the EXACT released shapes and running every other step
for real, on the chip:

  1. instantiate the reference torch Seva at the flagship SevaParams
     (reference seva/model.py:17-36; imported read-only as the shape oracle)
     and synthesize diffusers-VAE / OpenCLIP state dicts from the converter
     key maps — the same tensor names `model.safetensors`/SD2.1/ViT-H ship,
  2. run the real converters (strict: zero missing/unexpected keys,
     models/convert.py) and write the orbax cache (models/io.save_converted),
  3. load the cache as a bf16 serving bundle (models/io.load_bundle — the
     exact path `apps/cli.py --checkpoint_dir` takes),
  4. build a 2-scene re10k-style micro-split at 576x576 and run the
     benchmark scoring loop (benchmark/run_eval) end-to-end: render with the
     entry's reference-recommended flags, score PSNR/SSIM/LPIPS against the
     held-out views (benchmark/metrics.py; reference protocol
     benchmark/README.md:150-152).

Scores are meaningless with synthetic weights (that is not the point); the
drill proves the full pipeline EXECUTES at 1.3B scale — the day real
checkpoints land, scripts/convert_released_weights.py + benchmark/run_eval
are the only commands needed.

Run (TPU chip):  python scripts/day0_drill.py [--steps 10] [--frames 40]
Smoke (CPU):     JAX_PLATFORMS=cpu python scripts/day0_drill.py --tiny
"""

from __future__ import annotations

import json
import os
import os.path as osp
import shutil
import sys
import tempfile
import time

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))
sys.path.insert(0, "/root/reference")  # read-only shape oracle

import numpy as np


def synth_unet_state_dict(tiny: bool):
    """Reference torch Seva at the released architecture, random init."""
    import seva.model as ref_model

    kw = {}
    if tiny:
        kw = dict(
            model_channels=32, num_frames=3, num_head_channels=16,
            context_dim=64,
        )
    import torch

    torch.manual_seed(0)
    with torch.no_grad():
        model = ref_model.Seva(ref_model.SevaParams(**kw))
    return model.state_dict()


def synth_vae_state_dict():
    """Diffusers-format SD2.1 VAE tensors, synthesized from the converter's
    key map (shape-exact; covers every key strict conversion demands)."""
    import torch

    from stable_virtual_camera_tpu.models import convert
    from stable_virtual_camera_tpu.models.vae import AutoEncoderKL

    import jax
    import jax.numpy as jnp

    vae = AutoEncoderKL()
    shapes = jax.eval_shape(
        lambda: vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))[
            "params"
        ]
    )
    flat = {
        "".join(f"['{k.key}']" for k in path): v.shape
        for path, v in jax.tree_util.tree_leaves_with_path(shapes)
    }
    inv = {
        "conv": {
            "kernel": ("weight", lambda s: (s[3], s[2], s[0], s[1])),
            "bias": ("bias", lambda s: s),
        },
        "norm": {
            "scale": ("weight", lambda s: s),
            "bias": ("bias", lambda s: s),
        },
        "linear": {
            "kernel": ("weight", lambda s: (s[1], s[0])),
            "bias": ("bias", lambda s: s),
        },
        "linear_nobias": {
            "kernel": ("weight", lambda s: (s[1], s[0])),
        },
    }
    sd = {}
    for torch_prefix, flax_path, kind in convert.vae_key_map():
        for leaf, (suffix, shape_fn) in inv[kind].items():
            pstr = "".join(f"['{p}']" for p in flax_path) + f"['{leaf}']"
            assert pstr in flat, f"missing flax param {pstr}"
            sd[f"{torch_prefix}.{suffix}"] = torch.randn(*shape_fn(flat[pstr]))
    return sd


def synth_clip_state_dict(tiny: bool):
    """OpenCLIP ViT-H-14 visual-tower tensors (open_clip naming)."""
    import torch

    from stable_virtual_camera_tpu.models.clip import ClipVisionSpec

    spec = ClipVisionSpec.tiny() if tiny else ClipVisionSpec()
    torch.manual_seed(1)
    w = spec.width
    sd = {
        "visual.class_embedding": torch.randn(w),
        "visual.positional_embedding": torch.randn(
            (spec.image_size // spec.patch_size) ** 2 + 1, w
        ),
        "visual.conv1.weight": torch.randn(
            w, 3, spec.patch_size, spec.patch_size
        ),
        "visual.ln_pre.weight": torch.randn(w),
        "visual.ln_pre.bias": torch.randn(w),
        "visual.ln_post.weight": torch.randn(w),
        "visual.ln_post.bias": torch.randn(w),
        "visual.proj": torch.randn(w, spec.embed_dim),
    }
    for i in range(spec.layers):
        tp = f"visual.transformer.resblocks.{i}"
        sd[f"{tp}.ln_1.weight"] = torch.randn(w)
        sd[f"{tp}.ln_1.bias"] = torch.randn(w)
        sd[f"{tp}.ln_2.weight"] = torch.randn(w)
        sd[f"{tp}.ln_2.bias"] = torch.randn(w)
        sd[f"{tp}.attn.in_proj_weight"] = torch.randn(3 * w, w)
        sd[f"{tp}.attn.in_proj_bias"] = torch.randn(3 * w)
        sd[f"{tp}.attn.out_proj.weight"] = torch.randn(w, w)
        sd[f"{tp}.attn.out_proj.bias"] = torch.randn(w)
        sd[f"{tp}.mlp.c_fc.weight"] = torch.randn(4 * w, w)
        sd[f"{tp}.mlp.c_fc.bias"] = torch.randn(4 * w)
        sd[f"{tp}.mlp.c_proj.weight"] = torch.randn(w, 4 * w)
        sd[f"{tp}.mlp.c_proj.bias"] = torch.randn(w)
    return sd, spec


def build_micro_split(root: str, res: int, num_scenes: int = 2, n: int = 6):
    """re10k-style reconfusion scenes: transforms.json + 1-input split."""
    from PIL import Image

    rng = np.random.default_rng(7)
    entry_dir = osp.join(root, "re10k")
    for s in range(num_scenes):
        scene = osp.join(entry_dir, f"scene{s}")
        os.makedirs(osp.join(scene, "images"), exist_ok=True)
        frames = []
        for i in range(n):
            th = 2 * np.pi * i / n * 0.15
            c2w = np.eye(4)
            c2w[:3, 3] = [np.sin(th), 0.0, 2.0 + 0.1 * i]
            c2w_gl = c2w.copy()
            c2w_gl[:, [1, 2]] *= -1
            img = rng.integers(0, 255, (res, res, 3), dtype=np.uint8)
            name = f"images/frame_{i:03d}.png"
            Image.fromarray(img).save(osp.join(scene, name))
            frames.append(
                {
                    "file_path": f"./{name}",
                    "transform_matrix": c2w_gl.tolist(),
                    "fl_x": res * 1.2, "fl_y": res * 1.2,
                    "cx": res / 2, "cy": res / 2, "w": res, "h": res,
                }
            )
        with open(osp.join(scene, "transforms.json"), "w") as f:
            json.dump({"frames": frames}, f)
        with open(osp.join(scene, "train_test_split_1.json"), "w") as f:
            json.dump(
                {"train_ids": [0], "test_ids": list(range(1, n))}, f
            )
    return entry_dir


def main() -> None:
    tiny = "--tiny" in sys.argv
    steps = 10
    if "--steps" in sys.argv:
        steps = int(sys.argv[sys.argv.index("--steps") + 1])

    from benchmark.run_eval import run_eval
    from stable_virtual_camera_tpu.config import SevaSpec
    from stable_virtual_camera_tpu.models import convert, io as mio

    t0 = time.perf_counter()
    work = tempfile.mkdtemp(prefix="day0_drill_")
    ckpt = osp.join(work, "converted")

    # 1+2: synthesize released-shape state dicts, convert strictly, cache
    spec = SevaSpec.tiny() if tiny else SevaSpec()
    unet_params = convert.convert_seva_state_dict(
        synth_unet_state_dict(tiny), spec, strict=True
    )
    vae_params = convert.convert_vae_state_dict(
        synth_vae_state_dict(), strict=True
    )
    clip_sd, clip_spec = synth_clip_state_dict(tiny)
    clip_params = convert.convert_clip_open_clip(clip_sd, clip_spec)
    t_convert = time.perf_counter() - t0
    mio.save_converted(
        {"unet": unet_params, "vae": vae_params, "clip": clip_params},
        ckpt,
        specs={"seva": spec, "clip": clip_spec},
    )
    t_cache = time.perf_counter() - t0 - t_convert
    del unet_params, vae_params, clip_params

    # 3+4: micro-split + the real scoring loop through the cache-loading CLI
    res = 64 if tiny else 576
    bench_dir = work
    build_micro_split(bench_dir, res=res)
    results = run_eval(
        benchmark_dir=bench_dir,
        checkpoint_dir=ckpt,
        entries="re10k",
        num_inputs=1,
        work_dir=osp.join(work, "eval"),
        out=osp.join(work, "scores.json"),
        num_steps=steps,
        L_short=res,
        seed=23,
    )
    total = time.perf_counter() - t0
    entry = results["re10k"]
    print(
        json.dumps(
            {
                "metric": "day0_drill_s",
                "value": round(total, 1),
                "unit": "s",
                "detail": {
                    "t_convert_s": round(t_convert, 1),
                    "t_orbax_s": round(t_cache, 1),
                    "scenes": entry.get("num_scenes"),
                    "psnr": entry.get("psnr"),
                    "ssim": entry.get("ssim"),
                    "lpips": entry.get("lpips"),
                    "num_steps": steps,
                    "tiny": tiny,
                },
            }
        )
    )
    if "--keep" not in sys.argv:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
