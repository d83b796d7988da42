"""Tests for the VAE and CLIP towers: converter coverage (every torch key maps
to exactly the flax init tree) and CLIP golden parity vs the HF transformers
implementation at tiny scale."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from stable_virtual_camera_tpu.models import convert
from stable_virtual_camera_tpu.models.clip import (
    ClipVisionSpec,
    ClipVisionTower,
    preprocess,
)
from stable_virtual_camera_tpu.models.vae import AutoEncoderKL


def _tree_shapes(tree):
    return {
        jax.tree_util.keystr(p): v.shape
        for p, v in jax.tree_util.tree_leaves_with_path(tree)
    }


def _synth_torch_sd_from_map(key_map, flax_shapes):
    """Build a fake torch state_dict whose keys/shapes invert the converter
    mapping, to prove bijective coverage."""
    inv = {
        "conv": {"kernel": ("weight", lambda s: (s[3], s[2], s[0], s[1])),
                 "bias": ("bias", lambda s: s)},
        "linear": {"kernel": ("weight", lambda s: (s[1], s[0])),
                   "bias": ("bias", lambda s: s)},
        "linear_nobias": {"kernel": ("weight", lambda s: (s[1], s[0]))},
        "norm": {"scale": ("weight", lambda s: s), "bias": ("bias", lambda s: s)},
    }
    sd = {}
    for torch_prefix, flax_path, kind in key_map:
        for leaf, (suffix, shape_fn) in inv[kind].items():
            pstr = "".join(f"['{p}']" for p in flax_path) + f"['{leaf}']"
            assert pstr in flax_shapes, f"flax param missing: {pstr}"
            sd[f"{torch_prefix}.{suffix}"] = torch.randn(*shape_fn(flax_shapes[pstr]))
    return sd


def test_vae_converter_bijective_coverage():
    vae = AutoEncoderKL()
    init = vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))["params"]
    shapes = _tree_shapes(init)
    sd = _synth_torch_sd_from_map(list(convert.vae_key_map()), shapes)
    params = convert.convert_vae_state_dict(sd, strict=True)
    assert _tree_shapes(params) == shapes


def test_vae_shapes_and_roundtrip():
    vae = AutoEncoderKL()
    x = jnp.ones((2, 64, 64, 3)) * 0.1
    params = vae.init(jax.random.PRNGKey(0), x)["params"]
    z = vae.apply({"params": params}, x, method=AutoEncoderKL.encode)
    assert z.shape == (2, 8, 8, 4)
    y = vae.apply({"params": params}, z, method=AutoEncoderKL.decode)
    assert y.shape == (2, 64, 64, 3)
    assert np.isfinite(np.asarray(y)).all()


def test_vae_decode_uint8_matches_host_quantization():
    """Device-side uint8 quantization (decode_uint8) must be byte-identical
    to the host path (engine/saving.to_uint8 on decode's fp32 output) — the
    engine relies on this to ship second-pass frames as uint8."""
    from stable_virtual_camera_tpu.engine.saving import to_uint8

    vae = AutoEncoderKL()
    x = jax.random.uniform(jax.random.PRNGKey(3), (2, 64, 64, 3), minval=-1, maxval=1)
    params = vae.init(jax.random.PRNGKey(0), x)["params"]
    z = vae.apply({"params": params}, x, method=AutoEncoderKL.encode)
    f32 = np.asarray(vae.apply({"params": params}, z, method=AutoEncoderKL.decode))
    u8 = np.asarray(
        vae.apply({"params": params}, z, method=AutoEncoderKL.decode_uint8)
    )
    assert u8.dtype == np.uint8
    np.testing.assert_array_equal(u8, to_uint8(f32))
    # to_uint8 passes already-quantized frames through untouched
    np.testing.assert_array_equal(to_uint8(u8), u8)


def test_replace_input_handles_uint8_samples():
    """Splicing float gt inputs into uint8 generated frames quantizes the gt
    side identically to the all-float path."""
    from stable_virtual_camera_tpu.engine.saving import (
        replace_or_include_input_for_dict,
        to_uint8,
    )

    rng = np.random.default_rng(0)
    gen = rng.uniform(-1, 1, (4, 8, 8, 3)).astype(np.float32)
    imgs = rng.uniform(-1, 1, (4, 8, 8, 3)).astype(np.float32)
    c2w = np.eye(4)[None].repeat(4, 0)
    K = np.eye(3)[None].repeat(4, 0)
    test_idx = [1, 3]
    f_out = replace_or_include_input_for_dict(
        {"samples-rgb/image": gen}, test_idx, imgs.copy(), c2w, K
    )
    u_out = replace_or_include_input_for_dict(
        {"samples-rgb/image": to_uint8(gen)}, test_idx, imgs.copy(), c2w, K
    )
    np.testing.assert_array_equal(
        to_uint8(f_out["samples-rgb/image"]), u_out["samples-rgb/image"]
    )


def test_clip_open_clip_converter_coverage():
    spec = ClipVisionSpec.tiny()
    tower = ClipVisionTower(spec)
    init = tower.init(
        jax.random.PRNGKey(0), jnp.zeros((1, spec.image_size, spec.image_size, 3))
    )["params"]
    shapes = _tree_shapes(init)

    g = spec.image_size // spec.patch_size
    sd = {
        "visual.class_embedding": torch.randn(spec.width),
        "visual.positional_embedding": torch.randn(g * g + 1, spec.width),
        "visual.proj": torch.randn(spec.width, spec.embed_dim),
        "visual.conv1.weight": torch.randn(spec.width, 3, spec.patch_size, spec.patch_size),
        "visual.ln_pre.weight": torch.randn(spec.width),
        "visual.ln_pre.bias": torch.randn(spec.width),
        "visual.ln_post.weight": torch.randn(spec.width),
        "visual.ln_post.bias": torch.randn(spec.width),
    }
    for i in range(spec.layers):
        tp = f"visual.transformer.resblocks.{i}"
        sd[f"{tp}.ln_1.weight"] = torch.randn(spec.width)
        sd[f"{tp}.ln_1.bias"] = torch.randn(spec.width)
        sd[f"{tp}.ln_2.weight"] = torch.randn(spec.width)
        sd[f"{tp}.ln_2.bias"] = torch.randn(spec.width)
        sd[f"{tp}.attn.in_proj_weight"] = torch.randn(3 * spec.width, spec.width)
        sd[f"{tp}.attn.in_proj_bias"] = torch.randn(3 * spec.width)
        sd[f"{tp}.attn.out_proj.weight"] = torch.randn(spec.width, spec.width)
        sd[f"{tp}.attn.out_proj.bias"] = torch.randn(spec.width)
        sd[f"{tp}.mlp.c_fc.weight"] = torch.randn(4 * spec.width, spec.width)
        sd[f"{tp}.mlp.c_fc.bias"] = torch.randn(4 * spec.width)
        sd[f"{tp}.mlp.c_proj.weight"] = torch.randn(spec.width, 4 * spec.width)
        sd[f"{tp}.mlp.c_proj.bias"] = torch.randn(spec.width)

    params = convert.convert_clip_open_clip(sd, spec)
    assert _tree_shapes(params) == shapes


@pytest.mark.slow
def test_clip_matches_hf_transformers():
    """Golden parity vs transformers CLIPVisionModelWithProjection (random
    init, tiny config, exact-gelu activation as ViT-H/laion2b uses)."""
    from transformers import CLIPVisionConfig, CLIPVisionModelWithProjection

    spec = ClipVisionSpec.tiny()
    cfg = CLIPVisionConfig(
        hidden_size=spec.width,
        intermediate_size=int(spec.width * spec.mlp_ratio),
        num_hidden_layers=spec.layers,
        num_attention_heads=spec.heads,
        image_size=spec.image_size,
        patch_size=spec.patch_size,
        projection_dim=spec.embed_dim,
        hidden_act="gelu",
    )
    torch.manual_seed(0)
    model = CLIPVisionModelWithProjection(cfg).eval()

    rng = np.random.default_rng(0)
    pixels = rng.normal(size=(3, spec.image_size, spec.image_size, 3)).astype(
        np.float32
    )
    with torch.no_grad():
        theirs = model(
            pixel_values=torch.from_numpy(np.moveaxis(pixels, -1, 1))
        ).image_embeds.numpy()

    params = convert.convert_clip_hf(model.state_dict(), spec)
    tower = ClipVisionTower(spec)
    ours = np.asarray(tower.apply({"params": params}, jnp.asarray(pixels)))
    np.testing.assert_allclose(ours, theirs, atol=2e-5, rtol=1e-4)


def test_preprocess_range():
    imgs = jnp.zeros((1, 64, 48, 3))  # all-zero in [-1,1] => 0.5 gray
    out = preprocess(imgs)
    assert out.shape == (1, 224, 224, 3)
    expected = (0.5 - np.array([0.48145466, 0.4578275, 0.40821073])) / np.array(
        [0.26862954, 0.26130258, 0.27577711]
    )
    np.testing.assert_allclose(np.asarray(out)[0, 0, 0], expected, atol=1e-6)
