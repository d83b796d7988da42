"""Fine-tuning command line: scene directory -> optimized UNet checkpoint.

The reference repo is inference-only; this app completes the framework's
training story as a usable tool on top of training/{data,train_step,
checkpoint}: parse a scene (COLMAP / reconfusion / image dir), stream
T-frame chunks through the prefetched host pipeline, and run the jitted
(optionally view-sharded) epsilon-prediction step with warmup-cosine LR,
optional EMA shadow weights, gradient accumulation, rematerialization and
periodic checkpoint/resume.

Invocation (same fire-style flags as apps/cli.py):
  python -m stable_virtual_camera_tpu.apps.train_cli \
      --data_path scenes/rose --checkpoint_dir ckpts/converted \
      --work_dir work_dirs/ft_rose --num_steps 2000 --lr 1e-5 \
      --ema_decay 0.9999 --num_input_frames 3
Parameter-efficient: --lora_rank 16 [--lora_alpha 16] [--save_merged True]
trains low-rank adapters only (training/lora.py) and can fold them back
into a served weight tree. Smoke test without weights: --random_model True
(tiny spec, 64x64).
"""

from __future__ import annotations

import os
import os.path as osp
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from stable_virtual_camera_tpu.data.dataset import Dataset
from stable_virtual_camera_tpu.data.parsers import get_parser
from stable_virtual_camera_tpu.training.checkpoint import (
    restore_train_state,
    save_train_state,
)
from stable_virtual_camera_tpu.training.data import (
    SceneChunkSampler,
    device_prefetch,
)
from stable_virtual_camera_tpu.training.train_step import (
    make_sharded_train_step,
    make_train_step,
)
from stable_virtual_camera_tpu.utils.seeding import seed_everything


def _detect_parser(data_path: str) -> str:
    if osp.exists(osp.join(data_path, "transforms.json")):
        return "reconfusion"
    if osp.exists(osp.join(data_path, "sparse")):
        return "colmap"
    raise ValueError(
        f"Cannot auto-detect the scene format of {data_path}; "
        "pass --parser colmap|reconfusion"
    )


def main(
    data_path: str,
    work_dir: str = "work_dirs/train",
    checkpoint_dir: str | None = None,
    random_model: bool = False,
    parser: str = "auto",
    num_steps: int = 1000,
    num_input_frames: int = 3,
    W: int | None = None,
    H: int | None = None,
    lr: float = 1e-5,
    warmup_steps: int = 100,
    weight_decay: float = 1e-2,
    ema_decay: float | None = None,
    grad_accum: int = 1,
    remat: bool = False,
    lora_rank: int | None = None,
    lora_alpha: float | None = None,
    lora_pattern: str | None = None,
    save_merged: bool = False,
    mesh_view: int = 1,
    ckpt_every: int = 500,
    log_every: int = 10,
    resume: bool = True,
    seed: int = 23,
    prefetch: int = 2,
    encoding_t: int = 0,
    platform: str | None = None,
):
    if platform is not None:
        # flip the backend BEFORE any device use (same semantics as the
        # render CLI's --platform; the route for simulating --mesh_view N
        # on CPU under XLA_FLAGS=--xla_force_host_platform_device_count=N)
        jax.config.update("jax_platforms", str(platform))
    seed_everything(seed)
    os.makedirs(work_dir, exist_ok=True)

    mesh = None
    if mesh_view > 1:
        from stable_virtual_camera_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(n_data=1, n_view=mesh_view)

    if random_model:
        from stable_virtual_camera_tpu.models.io import random_bundle

        W, H = W or 64, H or 64
        bundle = random_bundle(image_hw=(H, W), mesh=mesh)
    else:
        assert checkpoint_dir, "--checkpoint_dir or --random_model required"
        from stable_virtual_camera_tpu.models.io import load_bundle

        W, H = W or 576, H or 576
        bundle = load_bundle(checkpoint_dir, mesh=mesh)
    spec = bundle.spec
    T = spec.num_frames
    if mesh is not None and T % mesh_view != 0:
        raise ValueError(f"num_frames {T} must divide --mesh_view {mesh_view}")
    num_input_frames = min(num_input_frames, T - 1)

    if parser == "auto":
        parser = _detect_parser(data_path)
    scene_parser = get_parser(parser, data_dir=data_path)
    split_n = None
    if parser == "reconfusion":
        # Train on one of the scene's provided train/test splits (the split
        # key is its input-view count, e.g. train_test_split_9.json).
        keys = sorted(scene_parser.splits_per_num_input_frames.keys())
        split_n = num_input_frames if num_input_frames in keys else keys[-1]
    dataset = Dataset(scene_parser, split="train", num_input_frames=split_n)
    sampler = SceneChunkSampler(
        dataset,
        num_frames=T,
        num_input_frames=num_input_frames,
        image_size=(W, H),
    )
    print(
        f"[train] scene {data_path} ({parser}): {len(dataset)} train views, "
        f"chunks of T={T} with {num_input_frames} inputs at {W}x{H}"
    )

    schedule = optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=lr,
        warmup_steps=warmup_steps,
        decay_steps=max(num_steps, warmup_steps + 1),
    )
    opt = optax.adamw(schedule, weight_decay=weight_decay)
    if grad_accum > 1:
        opt = optax.MultiSteps(opt, every_k_schedule=grad_accum)

    params = jax.tree.map(jnp.asarray, bundle.denoiser.params)
    lora = None
    if lora_rank is not None:
        # parameter-efficient path (training/lora.py): only the adapter
        # tree trains; base weights flow through the step frozen
        if mesh is not None:
            raise ValueError("--lora_rank does not combine with --mesh_view "
                             "(shard the full fine-tune instead)")
        if ema_decay is not None:
            raise ValueError("--lora_rank does not combine with --ema_decay "
                             "(adapters converge in few steps; EMA targets "
                             "the full fine-tune)")
        from stable_virtual_camera_tpu.training.lora import (
            DEFAULT_PATTERN,
            init_lora,
            make_lora_train_step,
        )

        lora = init_lora(
            params, int(lora_rank), jax.random.PRNGKey(seed + 1),
            pattern=lora_pattern or DEFAULT_PATTERN,
        )
        n_adapt = sum(x.size for x in jax.tree.leaves(lora))
        n_base = sum(x.size for x in jax.tree.leaves(params))
        print(f"[train] LoRA rank {lora_rank}: {len(lora)} kernels, "
              f"{n_adapt:,} trainable params ({n_adapt / n_base:.2%} of base)")
        step_fn = make_lora_train_step(
            bundle.denoiser.unet, opt, T, alpha=lora_alpha, remat=remat
        )
        opt_state = opt.init(lora)
    elif mesh is not None:
        step_fn = make_sharded_train_step(
            bundle.denoiser.unet, opt, T, mesh, remat=remat, ema_decay=ema_decay
        )
        opt_state = opt.init(params)
    else:
        step_fn = make_train_step(
            bundle.denoiser.unet, opt, T, remat=remat, ema_decay=ema_decay
        )
        opt_state = opt.init(params)
    ema_params = (
        jax.tree.map(jnp.copy, params) if ema_decay is not None else None
    )
    start_step = 0
    ckpt_path = osp.join(osp.abspath(work_dir), "state")
    if resume and osp.exists(ckpt_path):
        restored, opt_state, start_step, restored_ema = restore_train_state(
            ckpt_path, opt_state
        )
        if lora is not None:
            lora = restored  # LoRA checkpoints hold the adapter tree
        else:
            params = restored
        if ema_decay is not None and restored_ema is not None:
            ema_params = restored_ema
        print(f"[train] resumed from {ckpt_path} at step {start_step}")

    key = jax.random.PRNGKey(seed)
    batches = device_prefetch(
        sampler.batches(
            bundle.vae, bundle.clip, seed=seed + start_step, encoding_t=encoding_t
        ),
        size=prefetch,
    )
    t0, losses = time.time(), []
    for i, batch in zip(range(start_step, num_steps), batches):
        key, step_key = jax.random.split(key)
        if lora is not None:
            lora, opt_state, loss = step_fn(params, lora, opt_state,
                                            batch, step_key)
        elif ema_decay is not None:
            params, opt_state, ema_params, loss = step_fn(
                params, opt_state, ema_params, batch, step_key
            )
        else:
            params, opt_state, loss = step_fn(params, opt_state, batch, step_key)
        losses.append(float(loss))
        step = i + 1
        if step % log_every == 0 or step == num_steps:
            dt = time.time() - t0
            print(
                f"[train] step {step}/{num_steps} "
                f"loss {np.mean(losses[-log_every:]):.5f} "
                f"({dt / max(len(losses), 1):.2f} s/step)"
            )
        if step % ckpt_every == 0 or step == num_steps:
            save_train_state(
                ckpt_path, lora if lora is not None else params, opt_state,
                step=step, ema_params=ema_params,
            )
            print(f"[train] checkpoint at step {step}: {ckpt_path}")
    if lora is not None and save_merged:
        # a single served weight tree: base + adapters folded in, written in
        # the converted-checkpoint format load_bundle reads
        from stable_virtual_camera_tpu.models.io import save_converted
        from stable_virtual_camera_tpu.training.lora import merge_lora

        merged_dir = osp.join(osp.abspath(work_dir), "merged")
        save_converted(
            {
                "unet": merge_lora(params, lora, lora_alpha),
                "vae": bundle.vae.params,
                "clip": bundle.clip.params,
            },
            merged_dir,
        )
        print(f"[train] merged LoRA weights -> {merged_dir}")
    print(f"[train] done: {ckpt_path}")


def _main():
    """console_scripts entry (svc-train)."""
    from stable_virtual_camera_tpu.apps.cli import _parse_argv

    main(**_parse_argv(sys.argv[1:]))


if __name__ == "__main__":
    _main()
