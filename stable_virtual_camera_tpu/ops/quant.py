"""Dynamic W8A8 int8 quantization for the serving matmul path.

Why: the v5e MXU executes int8 contractions at 2x the bf16 rate (394 TOPS vs
197 TFLOP/s), and the denoiser's matmul bucket is already compute-bound at
the calibrated bf16 peak (docs/ARCHITECTURE.md, static HLO census) — bf16
kernel work alone cannot push past ~0.95 f/s on this chip. Quantizing the
transformer matmuls is the one structural lever left, so it ships as an
opt-in serving mode (`SVC_QUANT=w8a8`, `--quant w8a8` in the CLI), default
OFF and bit-identical to the bf16 path when off.

Scheme (standard dynamic W8A8, cf. SmoothQuant/LLM.int8 baselines):
  * weights: symmetric per-OUTPUT-CHANNEL int8, quantized from the bf16
    serving values INSIDE the jitted program (no second param tree, no
    checkpoint/сonversion changes; re-quantizing all matmul weights costs
    ~3 ms/forward of HBM traffic — ~0.3% — measured against the 940 ms
    round-3 forward),
  * activations: symmetric per-TOKEN (row-wise) int8, scales from a runtime
    abs-max — no calibration data needed (none exists here: released weights
    cannot be downloaded in this environment),
  * accumulation in int32 on the MXU, rescale + bias in fp32, cast back to
    the compute dtype.

Quantized: the transformer matmul family (GEGLU feed-forwards, attention
projections, MultiviewTransformer proj_in/out) and the UNet's compute convs
(ResBlock in/out/skip, Down/Upsample). NOT quantized: attention itself (the
Pallas flash kernels stay bf16/fp32-softmax), GroupNorm/LayerNorm/GELU
islands, the time-embedding MLPs and FiLM dense_proj (negligible FLOPs /
depth-6 contraction), the stem and final output convs (tiny and
quality-critical), the VAE, and everything under training — round/clip have
zero gradient, so this is a serving-only path (the train step never reads
SVC_QUANT).

Reproducibility caveat: round() makes the quantized network DISCONTINUOUS,
so two runs that differ by fp32 reduction order (e.g. different mesh
partitionings of the gathered joint-attention layers) flip occasional
rounding decisions and the flips cascade — each run is a valid quantization
within quant noise of the exact result, but they need not match each other
elementwise (tests/test_parallel.py::test_sharded_sampler_w8a8_...).

The reference has no quantized path at all (torch fp16/autocast only); this
is a beyond-parity TPU capability. Accuracy evidence available in this
environment: end-to-end bf16-vs-w8a8 latent deviation on synthetic weights
(tests/test_quant.py); real-weight PSNR/LPIPS goes through benchmark/
run_eval.py the day checkpoints can land.

MEASURED (round-3 TPU A/B, docs/ARCHITECTURE.md): this dynamic form LOSES
end-to-end (0.3915 vs 0.5301 f/s) — the int8 MXU win is real (1.64×
measured on chained 8192³ matmuls; the quantized conv+matmul bucket drops
422→258 ms/fwd) but per-step weight requantization inside the scan, the
fusion-breaking per-token abs-max reduces and int8 tile relayouts cost
~550 ms/fwd against the ~165 ms compute saving. Stays opt-in; the winning
variant (per-chunk prequantized weights + static calibrated activation
scales) needs real weights for calibration and is documented in the
journal as future work.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

# Quantize to [-127, 127] (symmetric, zero-point 0). Scales are clamped so
# an all-zero row/channel quantizes to zeros instead of NaN.
_QMAX = 127.0
_MIN_SCALE = 1e-8


def quant_mode() -> str:
    """Serving quantization mode: "0" (off, default) | "w8a8".

    Read at TRACE time like the repo's other dispatch flags (SVC_GELU_MODE,
    SVC_FLASH_V2): set it before the first jitted call of the process; a
    cached executable keeps the mode it was traced with.
    """
    return os.environ.get("SVC_QUANT", "0")


def w8a8_enabled() -> bool:
    return quant_mode() == "w8a8"


def _quantize(x: jnp.ndarray, axes) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric int8 with abs-max scales reduced over `axes` (kept)."""
    xf = x.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(xf), axis=axes, keepdims=True), _MIN_SCALE)
    s = s / _QMAX
    q = jnp.clip(jnp.round(xf / s), -_QMAX, _QMAX).astype(jnp.int8)
    return q, s


def quantize_rowwise(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-row (last-axis) symmetric int8: (..., C) -> int8 values, fp32
    scales shaped (..., 1). Rows are tokens — per-token scales keep one
    outlier token from washing out the whole tensor's resolution."""
    return _quantize(x, -1)


def quantize_colwise(w: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-output-channel symmetric int8 for a (C_in, C_out) kernel:
    int8 values, fp32 scales shaped (1, C_out)."""
    return _quantize(w, 0)


def quantize_persample(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-SAMPLE symmetric int8 for an NHWC activation: int8 values, fp32
    scales shaped (B, 1, 1, 1). Each conv output pixel only sums taps from
    its own sample, so per-sample scales stay exact w.r.t. the conv."""
    return _quantize(x, (1, 2, 3))


def quantize_conv_kernel(w: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-output-channel symmetric int8 for an HWIO conv kernel:
    int8 values, fp32 scales shaped (1, 1, 1, C_out)."""
    return _quantize(w, (0, 1, 2))


def quantized_conv(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    strides: tuple[int, int] = (1, 1),
    padding=((1, 1), (1, 1)),
    out_dtype=None,
) -> jnp.ndarray:
    """NHWC x HWIO convolution with int8 inputs and int32 MXU accumulation.

    Matches nn.Conv's contract (bias in fp32, output cast to `out_dtype` or
    x.dtype) up to int8 rounding. Activation scales are per-sample (exact
    under the conv's spatial summation), weight scales per-output-channel.
    """
    out_dtype = out_dtype or x.dtype
    xq, sx = quantize_persample(x)
    wq, sw = quantize_conv_kernel(kernel)
    acc = jax.lax.conv_general_dilated(
        xq,
        wq,
        window_strides=strides,
        padding=list(padding),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * sx * sw
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)


def quantized_dense(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    out_dtype=None,
) -> jnp.ndarray:
    """y = x @ kernel (+ bias) with int8 inputs and int32 MXU accumulation.

    x: (..., C_in); kernel: (C_in, C_out). Matches nn.Dense's contract
    (bias added in fp32, output cast to `out_dtype` or x.dtype) up to int8
    rounding of both operands.
    """
    out_dtype = out_dtype or x.dtype
    lead = x.shape[:-1]
    c_in = x.shape[-1]
    xq, sx = quantize_rowwise(x.reshape(-1, c_in))
    wq, sw = quantize_colwise(kernel)
    acc = jax.lax.dot_general(
        xq, wq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    y = acc.astype(jnp.float32) * sx * sw
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype).reshape(*lead, kernel.shape[-1])
