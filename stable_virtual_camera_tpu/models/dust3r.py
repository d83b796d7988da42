"""DUSt3R two-view stereo network (AsymmetricCroCo3DStereo) in flax.

The reference runs `naver/DUSt3R_ViTLarge_BaseDecoder_512_dpt` through the
external `dust3r` git submodule (reference seva/modules/preprocessor.py:37-39,
65-72) to regress, for every image pair, a per-pixel 3D pointmap in the first
camera's frame plus confidences; a global-alignment optimization then fuses
all pairs into per-image intrinsics/poses/points (preprocessor.py:78-101).
This module is a from-scratch TPU-native implementation of that network so
the whole preprocessing pipeline can run inside this framework: the submodule
is not even checked out in the reference snapshot (.gitmodules:1-3), and this
image has no copy either — with this module the pipeline needs only weights.

Architecture (ViT-Large encoder / "BaseDecoder" / DPT head, from the public
DUSt3R + CroCo v2 model definitions):

- shared ViT-L encoder over both images: 16x16 patch embed -> 24 pre-LN
  blocks, 2D RoPE (freq 100) on q/k of every self-attention;
- two entangled 12-block decoders (separate weights per view): each block is
  self-attn -> cross-attn to the OTHER view's previous-layer tokens -> MLP,
  reading both streams from the previous layer (so the two views update in
  lockstep);
- two DPT regression heads (separate weights per view) over hooks
  [enc_out, dec 1/2, dec 3/4, dec last]: multi-scale reassembly to /4 /8
  /16 /32, RefineNet-style fusion at width 256, full-resolution 4-channel
  output;
- post-processing: pts3d = dir(xyz) * expm1(|xyz|)  (depth_mode
  ('exp', -inf, inf)), conf = 1 + exp(c)  (conf_mode ('exp', 1, inf));
  the second head's pointmap is `pts3d_in_other_view` (view2's pixels in
  view1's camera frame).

Everything runs NHWC with fp32 LayerNorm/softmax islands, matching the
conventions of models/unet.py and models/clip.py. Variable aspect ratios are
supported the way the 512-model supports them: any H, W divisible by the
patch size, RoPE positions taken from the true token grid.

Weight conversion from the released torch checkpoint lives in
models/convert_dust3r.py. The released weights cannot be downloaded in this
offline image, so end-to-end parity with the torch network is pending real
weights; the architecture is exercised structurally (shapes, invariances,
full pipeline into the native global aligner) by tests/test_dust3r.py.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from stable_virtual_camera_tpu.ops.resize import resize_bilinear_align_corners

Dtype = Any


@dataclass(frozen=True)
class Dust3rSpec:
    """DUSt3R_ViTLarge_BaseDecoder_512_dpt defaults."""

    img_size: int = 512  # long-side inference resolution (loader target)
    patch_size: int = 16
    enc_depth: int = 24
    enc_dim: int = 1024
    enc_heads: int = 16
    dec_depth: int = 12
    dec_dim: int = 768
    dec_heads: int = 12
    mlp_ratio: float = 4.0
    rope_base: float = 100.0
    # DPT head (croco dpt_block defaults, feature_dim=256, last_dim=128)
    dpt_layer_dims: tuple[int, int, int, int] = (96, 192, 384, 768)
    dpt_feature_dim: int = 256
    dpt_last_dim: int = 128
    out_channels: int = 4  # xyz + conf

    @property
    def dpt_hooks(self) -> tuple[int, int, int, int]:
        """Indices into [enc_out, dec_1, ..., dec_last] (len dec_depth+1)."""
        d = self.dec_depth
        return (0, d * 2 // 4, d * 3 // 4, d)

    @staticmethod
    def tiny() -> "Dust3rSpec":
        return Dust3rSpec(
            img_size=64,
            enc_depth=2,
            enc_dim=32,
            enc_heads=2,
            dec_depth=4,
            dec_dim=24,
            dec_heads=2,
            dpt_layer_dims=(8, 12, 16, 24),
            dpt_feature_dim=16,
            dpt_last_dim=8,
        )


# ---------------------------------------------------------------------------
# 2D rotary position embedding (CroCo RoPE2D, freq 100)


def _rope_1d(x: jnp.ndarray, pos: jnp.ndarray, base: float) -> jnp.ndarray:
    """Apply 1D rotary embedding to the last dim of x.

    x: (..., N, Dh) with Dh even; pos: (N,) integer coordinates. Follows the
    CroCo convention: angle table of Dh/2 frequencies duplicated (not
    interleaved), rotate_half = (-x2, x1) over the two contiguous halves.
    """
    dh = x.shape[-1]
    inv = 1.0 / (base ** (jnp.arange(0, dh, 2, dtype=jnp.float32) / dh))
    ang = pos.astype(jnp.float32)[:, None] * inv[None]  # (N, Dh/2)
    cos = jnp.concatenate([jnp.cos(ang), jnp.cos(ang)], axis=-1)
    sin = jnp.concatenate([jnp.sin(ang), jnp.sin(ang)], axis=-1)
    x1, x2 = jnp.split(x, 2, axis=-1)
    rot = jnp.concatenate([-x2, x1], axis=-1)
    return (x * cos + rot * sin).astype(x.dtype)


def rope_2d(x: jnp.ndarray, pos: jnp.ndarray, base: float = 100.0) -> jnp.ndarray:
    """CroCo RoPE2D: first half of the head dim rotates with the token's y
    coordinate, second half with x. x: (B, H, N, D) with D % 4 == 0;
    pos: (N, 2) integer (y, x) grid coordinates."""
    y, xx = jnp.split(x, 2, axis=-1)
    y = _rope_1d(y, pos[:, 0], base)
    xx = _rope_1d(xx, pos[:, 1], base)
    return jnp.concatenate([y, xx], axis=-1)


# ---------------------------------------------------------------------------
# Transformer blocks


class _LayerNorm(nn.Module):
    """fp32 LayerNorm island (eps 1e-6, the CroCo norm_layer)."""

    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(
            epsilon=1e-6, dtype=jnp.float32, param_dtype=self.param_dtype, name="ln"
        )(x.astype(jnp.float32))
        return y.astype(x.dtype)


def _attend(q, k, v, heads: int):
    """(B, N, C) fused-head attention with fp32 softmax."""
    b, n, c = q.shape
    m = k.shape[1]
    dh = c // heads
    q = q.reshape(b, n, heads, dh).transpose(0, 2, 1, 3)
    k = k.reshape(b, m, heads, dh).transpose(0, 2, 1, 3)
    v = v.reshape(b, m, heads, dh).transpose(0, 2, 1, 3)
    return q, k, v


def _finish(o, b, n, c):
    return o.transpose(0, 2, 1, 3).reshape(b, n, c)


def _sdpa(q, k, v):
    s = jnp.einsum("bhnd,bhmd->bhnm", q, k).astype(jnp.float32)
    s = s * (q.shape[-1] ** -0.5)
    p = nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("bhnm,bhmd->bhnd", p, v)


class RopeSelfAttention(nn.Module):
    dim: int
    heads: int
    rope_base: float
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pos):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        b, n, c = x.shape
        qkv = nn.Dense(3 * self.dim, name="qkv", **kw)(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q, k, v = _attend(q, k, v, self.heads)
        q = rope_2d(q, pos, self.rope_base)
        k = rope_2d(k, pos, self.rope_base)
        o = _finish(_sdpa(q, k, v), b, n, c)
        return nn.Dense(self.dim, name="proj", **kw)(o)


class RopeCrossAttention(nn.Module):
    dim: int
    heads: int
    rope_base: float
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mem, pos_q, pos_k):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        b, n, c = x.shape
        q = nn.Dense(self.dim, name="projq", **kw)(x)
        k = nn.Dense(self.dim, name="projk", **kw)(mem)
        v = nn.Dense(self.dim, name="projv", **kw)(mem)
        q, k, v = _attend(q, k, v, self.heads)
        q = rope_2d(q, pos_q, self.rope_base)
        k = rope_2d(k, pos_k, self.rope_base)
        o = _finish(_sdpa(q, k, v), b, n, c)
        return nn.Dense(self.dim, name="proj", **kw)(o)


class _Mlp(nn.Module):
    dim: int
    hidden: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        h = nn.Dense(self.hidden, name="fc1", **kw)(x)
        h = nn.gelu(h.astype(jnp.float32), approximate=False).astype(x.dtype)
        return nn.Dense(self.dim, name="fc2", **kw)(h)


class EncoderBlock(nn.Module):
    spec: Dust3rSpec
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pos):
        sp = self.spec
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = x + RopeSelfAttention(
            sp.enc_dim, sp.enc_heads, sp.rope_base, name="attn", **kw
        )(_LayerNorm(self.param_dtype, name="norm1")(x), pos)
        x = x + _Mlp(sp.enc_dim, int(sp.enc_dim * sp.mlp_ratio), name="mlp", **kw)(
            _LayerNorm(self.param_dtype, name="norm2")(x)
        )
        return x


class DecoderBlock(nn.Module):
    """CroCo decoder block: self-attn, cross-attn to the other view's tokens
    (memory pre-normalized by norm_y), MLP — all residual."""

    spec: Dust3rSpec
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mem, pos_x, pos_mem):
        sp = self.spec
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = x + RopeSelfAttention(
            sp.dec_dim, sp.dec_heads, sp.rope_base, name="attn", **kw
        )(_LayerNorm(self.param_dtype, name="norm1")(x), pos_x)
        mem_n = _LayerNorm(self.param_dtype, name="norm_y")(mem)
        x = x + RopeCrossAttention(
            sp.dec_dim, sp.dec_heads, sp.rope_base, name="cross_attn", **kw
        )(_LayerNorm(self.param_dtype, name="norm2")(x), mem_n, pos_x, pos_mem)
        x = x + _Mlp(sp.dec_dim, int(sp.dec_dim * sp.mlp_ratio), name="mlp", **kw)(
            _LayerNorm(self.param_dtype, name="norm3")(x)
        )
        return x


# ---------------------------------------------------------------------------
# DPT regression head


class _ResidualConvUnit(nn.Module):
    features: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        h = nn.relu(x)
        h = nn.Conv(self.features, (3, 3), padding=1, name="conv1", **kw)(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), padding=1, name="conv2", **kw)(h)
        return x + h


class _FusionBlock(nn.Module):
    """RefineNet-style feature fusion: optional skip through one RCU, main
    path through another, x2 align-corners upsample, 1x1 out conv."""

    features: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip=None):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        if skip is not None:
            x = x + _ResidualConvUnit(self.features, name="rcu1", **kw)(skip)
        x = _ResidualConvUnit(self.features, name="rcu2", **kw)(x)
        h, w = x.shape[1], x.shape[2]
        x = resize_bilinear_align_corners(x, (2 * h, 2 * w))
        return nn.Conv(self.features, (1, 1), name="out_conv", **kw)(x)


class DptHead(nn.Module):
    """DPT reassembly + fusion head over 4 hooked token sets.

    Token maps arrive at 1/16 resolution; reassembly scales them to
    /4, /8, /16, /32, the fusion pyramid walks back up to /2, and the output
    head's final x2 interpolation lands exactly at the input resolution,
    producing `out_channels` regression channels per pixel.
    """

    spec: Dust3rSpec
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], grid_hw: tuple[int, int]):
        sp = self.spec
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        nh, nw = grid_hw
        ld = sp.dpt_layer_dims
        fd = sp.dpt_feature_dim

        maps = [f.reshape(f.shape[0], nh, nw, f.shape[-1]) for f in feats]

        # reassembly (croco dpt_block act_{1..4}_postprocess)
        l0 = nn.Conv(ld[0], (1, 1), name="act1_proj", **kw)(maps[0])
        l0 = nn.ConvTranspose(
            ld[0], (4, 4), strides=(4, 4), transpose_kernel=True,
            name="act1_up", **kw,
        )(l0)
        l1 = nn.Conv(ld[1], (1, 1), name="act2_proj", **kw)(maps[1])
        l1 = nn.ConvTranspose(
            ld[1], (2, 2), strides=(2, 2), transpose_kernel=True,
            name="act2_up", **kw,
        )(l1)
        l2 = nn.Conv(ld[2], (1, 1), name="act3_proj", **kw)(maps[2])
        l3 = nn.Conv(ld[3], (1, 1), name="act4_proj", **kw)(maps[3])
        l3 = nn.Conv(ld[3], (3, 3), strides=(2, 2), padding=1, name="act4_down", **kw)(
            l3
        )

        rn = [
            nn.Conv(fd, (3, 3), padding=1, use_bias=False, name=f"layer{i+1}_rn", **kw)(
                l
            )
            for i, l in enumerate((l0, l1, l2, l3))
        ]

        path4 = _FusionBlock(fd, name="refinenet4", **kw)(rn[3])
        path4 = path4[:, : rn[2].shape[1], : rn[2].shape[2]]
        path3 = _FusionBlock(fd, name="refinenet3", **kw)(path4, rn[2])
        path2 = _FusionBlock(fd, name="refinenet2", **kw)(path3, rn[1])
        path1 = _FusionBlock(fd, name="refinenet1", **kw)(path2, rn[0])

        h = nn.Conv(fd // 2, (3, 3), padding=1, name="head_conv1", **kw)(path1)
        h = resize_bilinear_align_corners(h, (2 * h.shape[1], 2 * h.shape[2]))
        h = nn.Conv(sp.dpt_last_dim, (3, 3), padding=1, name="head_conv2", **kw)(h)
        h = nn.relu(h)
        return nn.Conv(sp.out_channels, (1, 1), name="head_out", **kw)(h)


# ---------------------------------------------------------------------------
# Post-processing (dust3r heads/postprocess.py semantics)


def reg_dense_pts3d(xyz: jnp.ndarray) -> jnp.ndarray:
    """depth_mode ('exp', -inf, inf): direction * expm1(norm). The norm is
    clipped at 80 (expm1(80) ~ 5.5e34, still finite in fp32) — inert for any
    real checkpoint, keeps synthetic-weight tests finite."""
    d = jnp.linalg.norm(xyz.astype(jnp.float32), axis=-1, keepdims=True)
    return (xyz / jnp.clip(d, 1e-8)) * jnp.expm1(jnp.clip(d, None, 80.0))


def reg_dense_conf(c: jnp.ndarray) -> jnp.ndarray:
    """conf_mode ('exp', 1, inf): 1 + exp(c), clipped for fp32 safety."""
    return 1.0 + jnp.exp(jnp.clip(c.astype(jnp.float32), -30.0, 30.0))


# ---------------------------------------------------------------------------
# Full two-view model


class AsymmetricCroCoStereo(nn.Module):
    """Two-view pointmap regressor (dust3r AsymmetricCroCo3DStereo).

    __call__(img1, img2) with NHWC images in [-1, 1] (H, W multiples of
    patch_size; the two views may have different shapes) returns the
    dust3r-inference-style dict:

        {"pred1": {"pts3d": (B,H1,W1,3), "conf": (B,H1,W1)},
         "pred2": {"pts3d_in_other_view": (B,H2,W2,3), "conf": (B,H2,W2)}}

    with pred2's pointmap expressed in view1's camera frame.
    """

    spec: Dust3rSpec
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        sp = self.spec
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.patch_embed = nn.Conv(
            sp.enc_dim,
            (sp.patch_size, sp.patch_size),
            strides=(sp.patch_size, sp.patch_size),
            padding="VALID",
            name="patch_embed",
            **kw,
        )
        self.enc_blocks = [
            EncoderBlock(sp, name=f"enc_block_{i}", **kw) for i in range(sp.enc_depth)
        ]
        self.enc_norm = _LayerNorm(self.param_dtype, name="enc_norm")
        self.decoder_embed = nn.Dense(sp.dec_dim, name="decoder_embed", **kw)
        self.dec_blocks = [
            DecoderBlock(sp, name=f"dec_block_{i}", **kw) for i in range(sp.dec_depth)
        ]
        self.dec_blocks2 = [
            DecoderBlock(sp, name=f"dec2_block_{i}", **kw) for i in range(sp.dec_depth)
        ]
        self.dec_norm = _LayerNorm(self.param_dtype, name="dec_norm")
        self.head1 = DptHead(sp, name="head1", **kw)
        self.head2 = DptHead(sp, name="head2", **kw)

    def _encode(self, img):
        sp = self.spec
        b, h, w, _ = img.shape
        nh, nw = h // sp.patch_size, w // sp.patch_size
        x = self.patch_embed(img.astype(self.dtype)).reshape(b, nh * nw, sp.enc_dim)
        yy, xx = jnp.meshgrid(jnp.arange(nh), jnp.arange(nw), indexing="ij")
        pos = jnp.stack([yy.reshape(-1), xx.reshape(-1)], axis=-1)  # (N, 2)
        for blk in self.enc_blocks:
            x = blk(x, pos)
        return self.enc_norm(x), pos, (nh, nw)

    def __call__(self, img1: jnp.ndarray, img2: jnp.ndarray):
        f1, pos1, hw1 = self._encode(img1)
        f2, pos2, hw2 = self._encode(img2)

        # entangled decoders: both streams read the other view's
        # PREVIOUS-layer tokens (dust3r model.py _decoder)
        outs1, outs2 = [f1], [f2]
        d1, d2 = self.decoder_embed(f1), self.decoder_embed(f2)
        for blk1, blk2 in zip(self.dec_blocks, self.dec_blocks2):
            d1n = blk1(d1, d2, pos1, pos2)
            d2n = blk2(d2, d1, pos2, pos1)
            d1, d2 = d1n, d2n
            outs1.append(d1)
            outs2.append(d2)
        outs1[-1] = self.dec_norm(outs1[-1])
        outs2[-1] = self.dec_norm(outs2[-1])

        hooks = self.spec.dpt_hooks
        out1 = self.head1([outs1[i].astype(jnp.float32) for i in hooks], hw1)
        out2 = self.head2([outs2[i].astype(jnp.float32) for i in hooks], hw2)

        return {
            "pred1": {
                "pts3d": reg_dense_pts3d(out1[..., :3]),
                "conf": reg_dense_conf(out1[..., 3]),
            },
            "pred2": {
                "pts3d_in_other_view": reg_dense_pts3d(out2[..., :3]),
                "conf": reg_dense_conf(out2[..., 3]),
            },
        }
