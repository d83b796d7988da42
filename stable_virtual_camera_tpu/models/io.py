"""Model weight loading and bundle assembly.

Capability parity with reference seva/utils.py:29-56 (`load_model`): loads the
Seva UNet from a safetensors checkpoint (local path or HF hub when available),
plus the frozen VAE / CLIP towers, into a ready `ModelBundle`. When no
checkpoint is available (e.g. air-gapped CI), `random_bundle` builds a
randomly initialized bundle at any spec — used by tests and smoke runs.
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from stable_virtual_camera_tpu.config import SevaSpec
from stable_virtual_camera_tpu.models.clip import ClipVisionSpec, ClipVisionTower
from stable_virtual_camera_tpu.models.convert import (
    convert_clip_hf,
    convert_clip_open_clip,
    convert_seva_state_dict,
    convert_vae_state_dict,
)
from stable_virtual_camera_tpu.models.unet import SevaUNet
from stable_virtual_camera_tpu.models.vae import AutoEncoderKL
from stable_virtual_camera_tpu.sampling.discretization import DDPMDiscretization
from stable_virtual_camera_tpu.sampling.sampler import UNetDenoiser


def _load_safetensors(path: str) -> dict[str, np.ndarray]:
    from safetensors import safe_open

    out = {}
    with safe_open(path, framework="np") as f:
        for k in f.keys():
            out[k] = f.get_tensor(k)
    return out


def _cast_tree(tree, dtype):
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x,
        tree,
    )


def load_seva_params(
    weight_path: str, spec: SevaSpec | None = None, param_dtype=jnp.bfloat16
):
    """safetensors checkpoint (torch names) -> flax params, cast to bf16
    (the reference loads weights as bfloat16, seva/utils.py:50-51)."""
    spec = spec or SevaSpec()
    sd = _load_safetensors(weight_path)
    params = convert_seva_state_dict(sd, spec, dtype=np.float32)
    return _cast_tree(params, param_dtype)


def load_vae_params(weight_path: str, param_dtype=jnp.bfloat16):
    sd = _load_safetensors(weight_path)
    # strip the diffusers "first_stage_model."/"vae." wrapper prefixes if present
    for prefix in ("first_stage_model.", "vae."):
        if any(k.startswith(prefix) for k in sd):
            sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    params = convert_vae_state_dict(sd, dtype=np.float32)
    return _cast_tree(params, param_dtype)


def load_clip_params(
    weight_path: str, spec: ClipVisionSpec | None = None, param_dtype=jnp.bfloat16
):
    spec = spec or ClipVisionSpec()
    sd = _load_safetensors(weight_path)
    if any(k.startswith("vision_model.") for k in sd):
        params = convert_clip_hf(sd, spec, dtype=np.float32)
    else:
        params = convert_clip_open_clip(sd, spec, dtype=np.float32)
    return _cast_tree(params, param_dtype)


def load_dust3r_params(weight_path: str, spec=None, param_dtype=jnp.float32):
    """Converted DUSt3R stereo-network weights (safetensors or torch .pth;
    reference checkpoint `naver/DUSt3R_ViTLarge_BaseDecoder_512_dpt`,
    seva/modules/preprocessor.py:37-39)."""
    from stable_virtual_camera_tpu.models.convert_dust3r import (
        convert_dust3r_state_dict,
    )
    from stable_virtual_camera_tpu.models.dust3r import Dust3rSpec

    spec = spec or Dust3rSpec()
    if weight_path.endswith((".pth", ".pt")):
        import torch

        try:
            ckpt = torch.load(weight_path, map_location="cpu", weights_only=True)
        except Exception:
            # the released dust3r .pth pickles an argparse.Namespace under
            # ckpt["args"], which weights_only rejects — fall back for the
            # documented checkpoint format
            ckpt = torch.load(weight_path, map_location="cpu", weights_only=False)
        sd = ckpt.get("model", ckpt)
        sd = {k: v.numpy() for k, v in sd.items()}
    else:
        sd = _load_safetensors(weight_path)
    params = convert_dust3r_state_dict(sd, spec)
    return _cast_tree(params, param_dtype)


def random_bundle(
    spec: SevaSpec | None = None,
    clip_spec: ClipVisionSpec | None = None,
    image_hw: tuple[int, int] = (64, 64),
    dtype=jnp.float32,
    param_dtype=jnp.float32,
    use_pallas: bool = False,
    seed: int = 0,
    mesh=None,
):
    """Randomly initialized ModelBundle (tests / smoke runs / benchmarks).
    `mesh`: optional ('data','view') Mesh — the denoiser's sampling programs
    shard frames over the 'view' axis (sampling/sampler.UNetDenoiser)."""
    from stable_virtual_camera_tpu.engine.runner import (
        ClipApplier,
        ModelBundle,
        VaeApplier,
    )

    spec = spec or SevaSpec.tiny()
    clip_spec = clip_spec or ClipVisionSpec.tiny()
    assert clip_spec.embed_dim == spec.context_dim, (
        "CLIP embed_dim must equal the UNet context_dim"
    )
    H, W = image_hw
    h, w = H // 8, W // 8
    T = spec.num_frames
    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)

    unet = SevaUNet(spec, dtype=dtype, param_dtype=param_dtype, use_pallas=use_pallas)
    unet_params = unet.init(
        k1,
        jnp.zeros((T, h, w, spec.in_channels)),
        jnp.zeros((T,), jnp.int32),
        jnp.zeros((T, 1, spec.context_dim)),
        jnp.zeros((T, h, w, spec.dense_in_channels)),
        num_frames=T,
    )["params"]

    vae = AutoEncoderKL(dtype=dtype, param_dtype=param_dtype)
    vae_params = vae.init(k2, jnp.zeros((1, 16, 16, 3)))["params"]

    clip = ClipVisionTower(clip_spec, dtype=dtype, param_dtype=param_dtype)
    clip_params = clip.init(
        k3, jnp.zeros((1, clip_spec.image_size, clip_spec.image_size, 3))
    )["params"]

    return ModelBundle(
        spec=spec,
        denoiser=UNetDenoiser(unet, unet_params, mesh=mesh),
        vae=VaeApplier(vae, vae_params),
        clip=ClipApplier(clip, clip_params),
        discretization=DDPMDiscretization(),
    )


def load_bundle(
    checkpoint_dir: str,
    spec: SevaSpec | None = None,
    clip_spec: ClipVisionSpec | None = None,
    dtype=jnp.bfloat16,
    param_dtype=jnp.bfloat16,
    use_pallas: bool = True,
    mesh=None,
):
    """Load a full pretrained bundle from a directory holding either the
    three torch safetensors checkpoints (model/vae/clip) or a converted
    orbax cache written by apps/convert_weights.py."""
    from stable_virtual_camera_tpu.engine.runner import (
        ClipApplier,
        ModelBundle,
        VaeApplier,
    )

    stored = load_checkpoint_specs(checkpoint_dir)
    if spec is None and "seva" in stored:
        spec = _spec_from_dict(SevaSpec, stored["seva"])
    if clip_spec is None and "clip" in stored:
        clip_spec = _spec_from_dict(ClipVisionSpec, stored["clip"])
    spec = spec or SevaSpec()
    clip_spec = clip_spec or ClipVisionSpec()
    unet = SevaUNet(spec, dtype=dtype, param_dtype=param_dtype, use_pallas=use_pallas)
    vae = AutoEncoderKL(dtype=dtype, param_dtype=param_dtype)
    clip = ClipVisionTower(clip_spec, dtype=dtype, param_dtype=param_dtype)
    if os.path.exists(os.path.join(checkpoint_dir, "_CHECKPOINT_METADATA")):
        converted = load_converted(checkpoint_dir)
        unet_params = _cast_tree(converted["unet"], param_dtype)
        vae_params = _cast_tree(converted["vae"], param_dtype)
        clip_params = _cast_tree(converted["clip"], param_dtype)
    else:
        unet_params = load_seva_params(
            os.path.join(checkpoint_dir, "model.safetensors"), spec, param_dtype
        )
        vae_params = load_vae_params(
            os.path.join(checkpoint_dir, "vae.safetensors"), param_dtype
        )
        clip_params = load_clip_params(
            os.path.join(checkpoint_dir, "clip.safetensors"), clip_spec, param_dtype
        )
    return ModelBundle(
        spec=spec,
        denoiser=UNetDenoiser(unet, unet_params, mesh=mesh),
        vae=VaeApplier(vae, vae_params),
        clip=ClipApplier(clip, clip_params),
        discretization=DDPMDiscretization(),
    )


# ---------------------------------------------------------------------------
# Converted-checkpoint caching (orbax)
# ---------------------------------------------------------------------------


def save_converted(params_by_model: dict, out_dir: str, specs: dict | None = None) -> None:
    """Persist converted flax param trees ({'unet': ..., 'vae': ..., 'clip':
    ...}) as an orbax checkpoint, so torch->jax conversion runs once
    (the TPU-side analogue of the reference's HF-hub weight cache,
    seva/utils.py:29-48).

    `specs` (optional): {"seva": SevaSpec, "clip": ClipVisionSpec} — written
    as `specs.json` next to the cache so the checkpoint is SELF-DESCRIBING:
    `load_bundle` instantiates the matching architectures without the
    caller having to know them (non-default topologies — e.g. the day-0
    drill's tiny mode — would otherwise load against the flagship spec and
    fail on shape mismatch)."""
    import dataclasses

    import orbax.checkpoint as ocp

    path = os.path.abspath(out_dir)
    # MERGE with any previously converted models so incremental runs
    # (--seva today, --dust3r tomorrow, same --out) accumulate instead of
    # silently erasing each other; the new trees win on key collision.
    # Read the spec manifest BEFORE the orbax save: force=True recreates
    # the directory, wiping a previously written specs.json.
    stored_specs = load_checkpoint_specs(path)
    if os.path.exists(os.path.join(path, "_METADATA")):
        existing = load_converted(path)
        existing.update(params_by_model)
        params_by_model = existing
    with ocp.PyTreeCheckpointer() as ckptr:
        # force: tolerate a pre-created/stale destination (the conversion CLI
        # makedirs the output dir for manifest.json; re-conversion overwrites)
        ckptr.save(path, params_by_model, force=True)
    if specs:
        stored_specs.update(
            {k: dataclasses.asdict(v) for k, v in specs.items() if v is not None}
        )
    if stored_specs:
        with open(os.path.join(path, "specs.json"), "w") as f:
            json.dump(stored_specs, f, indent=1)


def load_checkpoint_specs(checkpoint_dir: str) -> dict:
    """The `specs.json` manifest written by `save_converted` ({} if absent)."""
    spec_path = os.path.join(os.path.abspath(checkpoint_dir), "specs.json")
    if not os.path.exists(spec_path):
        return {}
    with open(spec_path) as f:
        return json.load(f)


def _spec_from_dict(cls, d: dict):
    """Rebuild a spec dataclass from its JSON dict: lists back to tuples
    (JSON has no tuples), unknown keys dropped (forward compatibility)."""
    import dataclasses

    names = {f.name for f in dataclasses.fields(cls)}
    clean = {
        k: tuple(v) if isinstance(v, list) else v
        for k, v in d.items()
        if k in names
    }
    return cls(**clean)


def load_converted(out_dir: str) -> dict:
    import orbax.checkpoint as ocp

    path = os.path.abspath(out_dir)
    with ocp.PyTreeCheckpointer() as ckptr:
        return ckptr.restore(path)
