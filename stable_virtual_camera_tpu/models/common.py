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


class QuantSite(nn.Module):
    """Static-W8A8 per-call-site state, held in the separate "quant" flax
    collection (the "params" checkpoint tree is untouched in every mode):

      wq  int8 prequantized kernel (same shape as the bf16 kernel)
      ws  fp32 per-output-channel weight scales
      ax  fp32 scalar — calibrated activation abs-max (running max)

    Calibration (`SVC_QUANT=w8a8-calib`, apply with `mutable=["quant"]`):
    records the running abs-max of the incoming activation and quantizes
    the kernel once, returning None so the caller runs the EXACT bf16 math
    (calibration must observe the bf16 activation distribution).
    Serving (`SVC_QUANT=w8a8-static`): returns the frozen (wq, ws, ax);
    a missing "quant" collection fails loudly (flax immutable-collection
    error) — calibrate before serving."""

    weight_axes: tuple[int, ...]

    @nn.compact
    def __call__(self, kernel, act):
        from stable_virtual_camera_tpu.ops.quant import _quantize, calib_enabled

        shape_ws = tuple(
            1 if i in self.weight_axes else s for i, s in enumerate(kernel.shape)
        )
        wq = self.variable(
            "quant", "wq", lambda: jnp.zeros(kernel.shape, jnp.int8)
        )
        ws = self.variable("quant", "ws", lambda: jnp.zeros(shape_ws, jnp.float32))
        ax = self.variable("quant", "ax", lambda: jnp.zeros((), jnp.float32))
        if calib_enabled():
            q, s = _quantize(kernel.astype(jnp.float32), self.weight_axes)
            wq.value = q
            ws.value = s
            ax.value = jnp.maximum(
                ax.value, jnp.max(jnp.abs(act.astype(jnp.float32)))
            )
            return None
        return wq.value, ws.value, ax.value


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
