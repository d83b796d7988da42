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
~550 ms/fwd against the ~165 ms compute saving.

STATIC variant (`SVC_QUANT=w8a8-static`) — the winning form the dynamic
A/B pointed at: weights are prequantized ONCE (outside the sigma scan,
stored in a flax "quant" collection next to the untouched params tree) and
activations use per-tensor scales calibrated on a short bf16 sampling
trajectory (`UNetDenoiser.ensure_quant_calibrated`). Inside the scan the
activation quantization is `clip(round(x * const))` — no reduce, fuses
into the producer epilogue — and the weights arrive already int8, so both
measured overheads of the dynamic form are structurally gone. Accuracy:
per-tensor static scales are coarser than per-token dynamic ones and
out-of-range activations saturate; calibration on real chunks (the engine
calibrates on the scene's own first chunk) keeps that honest, and
PSNR/LPIPS gating goes through benchmark/run_eval.py like every mode.
"""

from __future__ import annotations

import os
from contextlib import contextmanager

import jax
import jax.numpy as jnp

# Quantize to [-127, 127] (symmetric, zero-point 0). Scales are clamped so
# an all-zero row/channel quantizes to zeros instead of NaN.
_QMAX = 127.0
_MIN_SCALE = 1e-8


_MODE_OVERRIDE: str | None = None

W8A8_MODES = ("w8a8", "w8a8-static", "w8a8-calib")


def quant_mode() -> str:
    """Serving quantization mode:
    "0" (off, default) | "w8a8" (dynamic) | "w8a8-static" (calibrated) |
    "w8a8-calib" (calibration pass: exact bf16 math + stat recording).

    Read at TRACE time like the repo's other dispatch flags (e.g.
    SVC_GELU_MODE): set it before the first jitted call of the process; a
    cached executable keeps the mode it was traced with.
    """
    if _MODE_OVERRIDE is not None:
        return _MODE_OVERRIDE
    return os.environ.get("SVC_QUANT", "0")


@contextmanager
def force_mode(mode: str):
    """Trace-scoped mode override. The calibration machinery traces a bf16
    capture scan and a calib forward inside one process whose env says
    `w8a8-static`; wrapping each trace (the first call of its jit) in
    `force_mode` pins the mode those programs bake in."""
    global _MODE_OVERRIDE
    prev = _MODE_OVERRIDE
    _MODE_OVERRIDE = mode
    try:
        yield
    finally:
        _MODE_OVERRIDE = prev


def w8a8_enabled() -> bool:
    return quant_mode() == "w8a8"


def is_variables_dict(params) -> bool:
    """True if `params` is a {"params", "quant"} variables dict (static-W8A8
    serving state travels WITH the params pytree so every existing
    jit/sharding/donation path moves both trees unchanged)."""
    return (
        isinstance(params, dict)
        and len(params) == 2
        and "params" in params
        and "quant" in params
    )


def as_variables(params) -> dict:
    """Wrap a bare params tree as flax variables; pass a {"params","quant"}
    dict through unchanged."""
    return params if is_variables_dict(params) else {"params": params}


def static_enabled() -> bool:
    return quant_mode() == "w8a8-static"


def calib_enabled() -> bool:
    return quant_mode() == "w8a8-calib"


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


# --- static (calibrated) W8A8 -------------------------------------------
#
# The activation scale is a per-tensor CONSTANT (calibrated abs-max), so
# quantization is round/clip/convert with no reduce — XLA fuses it into the
# producing op's epilogue — and the weights arrive already int8 (quantized
# once at calibration, stored in the "quant" flax collection), so nothing
# is requantized inside the sigma scan. These two properties remove exactly
# the ~550 ms/fwd of overhead the dynamic-form TPU A/B measured.


def quantize_static(x: jnp.ndarray, ax: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric int8 with a CONSTANT per-tensor scale from the calibrated
    abs-max `ax` (scalar). Out-of-range activations saturate at ±127."""
    s = jnp.maximum(ax.astype(jnp.float32), _MIN_SCALE) / _QMAX
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -_QMAX, _QMAX).astype(
        jnp.int8
    )
    return q, s


def quantized_dense_static(
    x: jnp.ndarray,
    wq: jnp.ndarray,
    ws: jnp.ndarray,
    ax: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    out_dtype=None,
) -> jnp.ndarray:
    """y = x @ wq (+ bias), int8 x int8 -> int32 MXU, with a prequantized
    kernel (`wq` int8, `ws` per-output-channel fp32 scales shaped (1, C_out))
    and a calibrated per-tensor activation abs-max `ax`."""
    out_dtype = out_dtype or x.dtype
    lead = x.shape[:-1]
    xq, sx = quantize_static(x.reshape(-1, x.shape[-1]), ax)
    acc = jax.lax.dot_general(
        xq, wq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    y = acc.astype(jnp.float32) * (sx * ws)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype).reshape(*lead, wq.shape[-1])


def quantized_conv_static(
    x: jnp.ndarray,
    wq: jnp.ndarray,
    ws: jnp.ndarray,
    ax: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    strides: tuple[int, int] = (1, 1),
    padding=((1, 1), (1, 1)),
    out_dtype=None,
) -> jnp.ndarray:
    """NHWC conv with a prequantized HWIO int8 kernel (`ws` shaped
    (1, 1, 1, C_out)) and a calibrated per-tensor activation abs-max."""
    out_dtype = out_dtype or x.dtype
    xq, sx = quantize_static(x, ax)
    acc = jax.lax.conv_general_dilated(
        xq,
        wq,
        window_strides=strides,
        padding=list(padding),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * (sx * ws)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)
