"""Small shared flax building blocks used by both the UNet and the VAE."""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any


class DenseParams(nn.Module):
    """kernel (+ optional bias) under nn.Dense's checkpoint naming, for ops
    that consume the weights in a rearranged form (e.g. layout-fused
    attention projections, models/unet.Attention)."""

    kernel_shape: tuple[int, int]
    use_bias: bool = True
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            self.kernel_shape,
            self.param_dtype,
        )
        if not self.use_bias:
            return (kernel,)
        bias = self.param(
            "bias", nn.initializers.zeros, (self.kernel_shape[-1],), self.param_dtype
        )
        return kernel, bias


class ConvParams(nn.Module):
    """Holds a (kh, kw, cin, cout) kernel + bias under nn.Conv's checkpoint
    naming ({"kernel", "bias"}), for ops that consume the weights in a
    rearranged form (e.g. the pixel-shuffle upsample,
    ops/resize.upsample_2x_conv3x3)."""

    kernel_shape: tuple[int, int, int, int]
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            self.kernel_shape,
            self.param_dtype,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.kernel_shape[-1],), self.param_dtype
        )
        return kernel, bias
