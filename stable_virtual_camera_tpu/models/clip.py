"""CLIP image encoder (OpenCLIP ViT-H/14 tower) in flax.

Capability parity with the reference's frozen conditioner
(seva/modules/conditioner.py:7-39): images in [-1, 1] are resized to 224^2
(bicubic, antialiased), CLIP-normalized, and encoded to a single 1024-d
embedding per image (class token -> ln_post -> projection; unnormalized).

The resize here uses jax.image.resize's half-pixel bicubic instead of
kornia's align_corners variant — a documented sub-pixel divergence with no
measurable effect on the pooled embedding (distributional parity target,
SURVEY.md §7 step 4).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from stable_virtual_camera_tpu.ops.attention import scaled_dot_product_attention

Dtype = Any

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


@dataclass(frozen=True)
class ClipVisionSpec:
    """ViT-H/14 (laion2b_s32b_b79k) defaults."""

    image_size: int = 224
    patch_size: int = 14
    width: int = 1280
    layers: int = 32
    heads: int = 16
    mlp_ratio: float = 4.0
    embed_dim: int = 1024  # output projection dim (the UNet's context_dim)

    @staticmethod
    def tiny() -> "ClipVisionSpec":
        return ClipVisionSpec(
            image_size=28, patch_size=14, width=64, layers=2, heads=4, embed_dim=64
        )


class ClipLayerNorm(nn.Module):
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(
            epsilon=1e-5, dtype=jnp.float32, param_dtype=self.param_dtype, name="ln"
        )(x.astype(jnp.float32))
        return y.astype(x.dtype)


class ClipBlock(nn.Module):
    spec: ClipVisionSpec
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        sp = self.spec
        head_dim = sp.width // sp.heads
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)

        h = ClipLayerNorm(param_dtype=self.param_dtype, name="ln_1")(x)
        qkv = nn.Dense(3 * sp.width, name="qkv", **kw)(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        B, L, _ = q.shape
        shp = (B, L, sp.heads, head_dim)
        o = scaled_dot_product_attention(q.reshape(shp), k.reshape(shp), v.reshape(shp))
        o = nn.Dense(sp.width, name="out_proj", **kw)(o.reshape(B, L, sp.width))
        x = x + o

        h = ClipLayerNorm(param_dtype=self.param_dtype, name="ln_2")(x)
        h = nn.Dense(int(sp.width * sp.mlp_ratio), name="c_fc", **kw)(h)
        h = nn.gelu(h.astype(jnp.float32), approximate=False).astype(x.dtype)
        h = nn.Dense(sp.width, name="c_proj", **kw)(h)
        return x + h


class ClipVisionTower(nn.Module):
    """Pre-LN ViT with class token; returns the projected class embedding."""

    spec: ClipVisionSpec
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, pixels: jnp.ndarray) -> jnp.ndarray:
        """pixels: (B, image_size, image_size, 3), CLIP-normalized."""
        sp = self.spec
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        B = pixels.shape[0]
        grid = sp.image_size // sp.patch_size

        h = nn.Conv(
            sp.width,
            (sp.patch_size, sp.patch_size),
            strides=(sp.patch_size, sp.patch_size),
            padding="VALID",
            use_bias=False,
            name="patch_embed",
            **kw,
        )(pixels.astype(self.dtype))
        h = h.reshape(B, grid * grid, sp.width)

        cls = self.param(
            "class_embedding", nn.initializers.normal(0.02), (sp.width,),
            self.param_dtype,
        )
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(0.02),
            (grid * grid + 1, sp.width),
            self.param_dtype,
        )
        h = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(h.dtype), (B, 1, sp.width)), h], axis=1
        )
        h = h + pos.astype(h.dtype)[None]

        h = ClipLayerNorm(param_dtype=self.param_dtype, name="ln_pre")(h)
        for i in range(sp.layers):
            h = ClipBlock(sp, name=f"block_{i}", **kw)(h)
        h = ClipLayerNorm(param_dtype=self.param_dtype, name="ln_post")(h[:, 0])

        proj = self.param(
            "proj",
            nn.initializers.normal(0.02),
            (sp.width, sp.embed_dim),
            self.param_dtype,
        )
        return (h.astype(jnp.float32) @ proj.astype(jnp.float32))


def preprocess(images: jnp.ndarray, image_size: int = 224) -> jnp.ndarray:
    """[-1, 1] NHWC images -> CLIP-normalized (B, S, S, 3)
    (reference seva/modules/conditioner.py:24-34)."""
    b, h, w, c = images.shape
    x = jax.image.resize(
        images.astype(jnp.float32), (b, image_size, image_size, c), method="bicubic"
    )
    x = (x + 1.0) / 2.0
    mean = jnp.asarray(CLIP_MEAN)
    std = jnp.asarray(CLIP_STD)
    return (x - mean) / std
