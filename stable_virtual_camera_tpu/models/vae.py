"""SD2.1 VAE (AutoencoderKL) in flax, NHWC, bf16 with fp32 GroupNorm islands.

Capability parity with the reference's frozen diffusers VAE
(seva/modules/autoencoder.py:6-51): `encode` returns the posterior MEAN (not a
sample) scaled by 0.18215; `decode` inverts. Architecture is the standard
AutoencoderKL topology (block_out_channels 128/256/512/512, 2 encoder + 3
decoder resnets per level, single mid attention) with diffusers-compatible
parameter naming handled by models/convert.py.

TPU notes: all convs NHWC via XLA; attention at the 512-channel mid block is a
single fused matmul pair; view-chunked batching replaces the reference's
`chunk_size` python loop (seva/modules/autoencoder.py:27-48) — on TPU we batch
all T views at once (default) and fall back to chunking only for memory.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn

from stable_virtual_camera_tpu.models.common import ConvParams
import jax
import jax.numpy as jnp

Dtype = Any

SCALE_FACTOR = 0.18215  # reference seva/modules/autoencoder.py:7
DOWNSAMPLE = 8


class VaeGroupNorm(nn.Module):
    """fp32-stats GroupNorm via the lane-preserving ops/norms kernel (see
    models/unet.GroupNorm32)."""

    param_dtype: Dtype = jnp.float32
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        from stable_virtual_camera_tpu.models.unet import _NormParams
        from stable_virtual_camera_tpu.ops.norms import group_norm_nhwc

        scale, bias = _NormParams(
            x.shape[-1], param_dtype=self.param_dtype, name="gn"
        )()
        return group_norm_nhwc(x, scale, bias, 32, self.eps)


class VaeResnetBlock(nn.Module):
    out_channels: int | None = None
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        out_ch = self.out_channels or C
        conv = lambda n, k, name: nn.Conv(  # noqa: E731
            n,
            (k, k),
            padding=[(k // 2, k // 2)] * 2,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name=name,
        )
        h = nn.silu(VaeGroupNorm(param_dtype=self.param_dtype, name="norm1")(x))
        h = conv(out_ch, 3, "conv1")(h)
        h = nn.silu(VaeGroupNorm(param_dtype=self.param_dtype, name="norm2")(h))
        h = conv(out_ch, 3, "conv2")(h)
        if out_ch != C:
            x = conv(out_ch, 1, "conv_shortcut")(x)
        return x + h


class VaeAttention(nn.Module):
    """Single-head self-attention over all spatial positions (mid block)."""

    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = VaeGroupNorm(param_dtype=self.param_dtype, name="group_norm")(x)
        h = h.reshape(B, H * W, C)
        dense = lambda name: nn.Dense(  # noqa: E731
            C, dtype=self.dtype, param_dtype=self.param_dtype, name=name
        )
        q, k, v = dense("to_q")(h), dense("to_k")(h), dense("to_v")(h)
        scores = jnp.einsum("bld,bsd->bls", q, k, preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(scores * (C**-0.5), axis=-1).astype(v.dtype)
        o = jnp.einsum("bls,bsd->bld", probs, v)
        o = dense("to_out")(o)
        return x + o.reshape(B, H, W, C)


class VaeDownsample(nn.Module):
    """Stride-2 conv with diffusers' asymmetric (0,1) padding."""

    channels: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(
            self.channels,
            (3, 3),
            strides=(2, 2),
            padding="VALID",
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="conv",
        )(x)


class VaeUpsample(nn.Module):
    """Nearest-2x upsample + 3x3 conv, computed as a LOW-RES 3x3 conv with
    4x-wide output channels followed by depth-to-space (pixel shuffle).

    Mathematically identical to upsample-then-conv (the nearest-neighbor
    duplication makes taps collapse: out[2i+d] sums W[1]+W[2] on x[i] when
    d=0, etc. — the rearranged kernel encodes exactly that), but TPU-shaped:
    the conv runs at h x w with N = 4*C output lanes (full MXU tiles instead
    of a narrow N), and the profiler-measured broadcast+copy of the upsampled
    tensor (48% of decode time was copies/layout, docs/ARCHITECTURE.md round-2
    journal) never materializes.
    """

    channels: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from stable_virtual_camera_tpu.ops.resize import upsample_2x_conv3x3

        c = x.shape[-1]
        kernel, bias = ConvParams((3, 3, c, self.channels),
                                  param_dtype=self.param_dtype, name="conv")()
        return upsample_2x_conv3x3(
            x.astype(self.dtype), kernel.astype(self.dtype), bias
        )


class VaeMidBlock(nn.Module):
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = VaeResnetBlock(name="resnet_0", **kw)(x)
        x = VaeAttention(name="attn", **kw)(x)
        x = VaeResnetBlock(name="resnet_1", **kw)(x)
        return x


class VaeEncoder(nn.Module):
    block_out_channels: tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        h = nn.Conv(
            self.block_out_channels[0],
            (3, 3),
            padding=[(1, 1), (1, 1)],
            name="conv_in",
            **kw,
        )(x)
        for i, ch in enumerate(self.block_out_channels):
            for j in range(self.layers_per_block):
                h = VaeResnetBlock(ch, name=f"down_{i}_resnet_{j}", **kw)(h)
            if i < len(self.block_out_channels) - 1:
                h = VaeDownsample(ch, name=f"down_{i}_downsample", **kw)(h)
        h = VaeMidBlock(name="mid", **kw)(h)
        h = nn.silu(VaeGroupNorm(param_dtype=self.param_dtype, name="conv_norm_out")(h))
        h = nn.Conv(
            2 * self.latent_channels,
            (3, 3),
            padding=[(1, 1), (1, 1)],
            name="conv_out",
            **kw,
        )(h)
        return h  # moments (mean ++ logvar)


class VaeDecoder(nn.Module):
    block_out_channels: tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 3
    out_channels: int = 3
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        rev = tuple(reversed(self.block_out_channels))  # (512, 512, 256, 128)
        h = nn.Conv(
            rev[0], (3, 3), padding=[(1, 1), (1, 1)], name="conv_in", **kw
        )(z)
        h = VaeMidBlock(name="mid", **kw)(h)
        for i, ch in enumerate(rev):
            for j in range(self.layers_per_block):
                h = VaeResnetBlock(ch, name=f"up_{i}_resnet_{j}", **kw)(h)
            if i < len(rev) - 1:
                h = VaeUpsample(ch, name=f"up_{i}_upsample", **kw)(h)
        h = nn.silu(VaeGroupNorm(param_dtype=self.param_dtype, name="conv_norm_out")(h))
        h = nn.Conv(
            self.out_channels, (3, 3), padding=[(1, 1), (1, 1)], name="conv_out", **kw
        )(h)
        return h


class AutoEncoderKL(nn.Module):
    """encode: (B, H, W, 3) in [-1, 1] -> (B, H/8, W/8, 4) scaled posterior mean.
    decode: inverse. Matches reference seva/modules/autoencoder.py semantics."""

    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.encoder = VaeEncoder(name="encoder", **kw)
        self.decoder = VaeDecoder(name="decoder", **kw)
        self.quant_conv = nn.Conv(8, (1, 1), name="quant_conv", **kw)
        self.post_quant_conv = nn.Conv(4, (1, 1), name="post_quant_conv", **kw)

    def encode(self, x):
        moments = self.quant_conv(self.encoder(x.astype(self.dtype)))
        mean = moments[..., :4]
        return mean.astype(jnp.float32) * SCALE_FACTOR

    def decode(self, z):
        z = (z / SCALE_FACTOR).astype(self.dtype)
        return self.decoder(self.post_quant_conv(z)).astype(jnp.float32)

    def decode_uint8(self, z):
        """Decode straight to uint8 images ON DEVICE. The consumer of decoded
        frames is always an 8-bit sink (PNG/mp4, engine/saving.to_uint8), and
        quantizing before the device->host transfer moves 4x fewer bytes —
        through this image's relay tunnel that is ~2 s of the 21-frame decode
        (round-3 journal); on any real host it still quarters PCIe traffic.
        Op order mirrors engine/saving.to_uint8 exactly ((x+1)/2 then *255,
        IEEE fp32, floor == numpy uint8 truncation) so bytes match the host
        path bit-for-bit."""
        x = self.decode(z)
        v = ((x + 1.0) / 2.0) * 255.0
        return jnp.floor(jnp.clip(v, 0.0, 255.0)).astype(jnp.uint8)

    def __call__(self, x):
        return self.decode(self.encode(x))
