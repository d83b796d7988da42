"""Image resizing ops with the exact interpolation semantics the model needs.

The ResBlock FiLM path resizes the 6-channel Plücker map with *align_corners*
bilinear interpolation (reference seva/modules/layers.py:126-128), which
differs from jax.image.resize's half-pixel convention. We implement it as two
small dense matrix contractions (out = A_h @ x @ A_w^T per channel) — static,
differentiable, and MXU-friendly.

Upsample uses nearest-2x (reference seva/modules/layers.py:44).
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp


@functools.lru_cache(maxsize=None)
def _align_corners_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out_size, in_size) bilinear interpolation matrix, align_corners=True."""
    A = np.zeros((out_size, in_size), dtype=np.float32)
    if in_size == 1:
        A[:, 0] = 1.0
        return A
    if out_size == 1:
        # align_corners maps the single output to input coordinate 0
        A[0, 0] = 1.0
        return A
    scale = (in_size - 1) / (out_size - 1)
    coords = np.arange(out_size) * scale
    lo = np.floor(coords).astype(np.int64)
    lo = np.clip(lo, 0, in_size - 2)
    frac = coords - lo
    A[np.arange(out_size), lo] = 1.0 - frac
    A[np.arange(out_size), lo + 1] = frac
    return A


def resize_bilinear_align_corners(
    x: jnp.ndarray, out_hw: tuple[int, int]
) -> jnp.ndarray:
    """NHWC bilinear resize with align_corners=True (torch F.interpolate
    semantics)."""
    h_in, w_in = x.shape[-3], x.shape[-2]
    h_out, w_out = out_hw
    if (h_in, w_in) == (h_out, w_out):
        return x
    Ah = jnp.asarray(_align_corners_matrix(h_in, h_out))
    Aw = jnp.asarray(_align_corners_matrix(w_in, w_out))
    y = jnp.einsum("oh,bhwc->bowc", Ah, x.astype(jnp.float32))
    y = jnp.einsum("ow,bhwc->bhoc", Aw, y)
    return y.astype(x.dtype)


def upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    """NHWC nearest-neighbor 2x upsample."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


def upsample_2x_conv3x3(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray,
    quant: bool = False,
    static_site=None,
) -> jnp.ndarray:
    """nearest-2x upsample followed by a 3x3 SAME conv, computed as a LOW-RES
    3x3 conv with 4x-wide output channels + depth-to-space (pixel shuffle).

    Mathematically identical (the nearest duplication collapses taps: e.g. the
    even output row sums kernel rows 1+2 on x[i] and row 0 on x[i-1]) but
    TPU-shaped: the conv runs at h x w with N = 4*C_out lanes — full MXU tiles
    instead of a narrow N — and the profiler-measured broadcast+copy of the
    upsampled tensor (48% of VAE decode time was copies/layout,
    docs/ARCHITECTURE.md round-2 journal) never materializes.

    kernel: (3, 3, C_in, C_out) HWIO (the checkpoint's plain conv weights);
    bias: (C_out,).
    """
    import jax

    b, h, w, c = x.shape
    c_out = kernel.shape[-1]
    # tap map for output offset d in {0,1}:
    #   d=0: x_up[2i+ki-1] = x[i + (-1, 0, 0)[ki]]
    #   d=1: x_up[2i+ki]   = x[i + (0, 0, 1)[ki]]
    taps = ((-1, 0, 0), (0, 0, 1))
    w2 = jnp.zeros((3, 3, c, 4, c_out), kernel.dtype)
    for di in (0, 1):
        for dj in (0, 1):
            o = di * 2 + dj
            for ki in range(3):
                for kj in range(3):
                    w2 = w2.at[taps[di][ki] + 1, taps[dj][kj] + 1, :, o].add(
                        kernel[ki, kj]
                    )
    if static_site is not None:
        # static W8A8 (ops/quant.py): the QuantSite (created by the caller
        # under its flax scope) holds/records quantization of the REARRANGED
        # kernel — its 4*c_out columns map 1:1 to output channels, so
        # per-output-channel scales stay exact through the pixel shuffle.
        from stable_virtual_camera_tpu.ops.quant import quantized_conv_static

        qs = static_site(w2.reshape(3, 3, c, 4 * c_out), x)
        if qs is None:  # calibration: exact conv
            y = jax.lax.conv_general_dilated(
                x,
                w2.reshape(3, 3, c, 4 * c_out),
                window_strides=(1, 1),
                padding=[(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        else:
            y = quantized_conv_static(
                x, *qs, bias=None, strides=(1, 1), padding=[(1, 1), (1, 1)],
                out_dtype=x.dtype,
            )
    elif quant:
        # dynamic W8A8 serving path (ops/quant.py): same rearranged-kernel
        # quantization, scales computed in the forward.
        from stable_virtual_camera_tpu.ops.quant import quantized_conv

        y = quantized_conv(
            x,
            w2.reshape(3, 3, c, 4 * c_out),
            bias=None,
            strides=(1, 1),
            padding=[(1, 1), (1, 1)],
            out_dtype=x.dtype,
        )
    else:
        y = jax.lax.conv_general_dilated(
            x,
            w2.reshape(3, 3, c, 4 * c_out),
            window_strides=(1, 1),
            padding=[(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    y = y + jnp.tile(bias.astype(y.dtype), 4)
    y = y.reshape(b, h, w, 2, 2, c_out)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * w, c_out)
