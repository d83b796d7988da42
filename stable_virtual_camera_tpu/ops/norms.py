"""TPU-shaped GroupNorm.

Profiling the 1.3B UNet forward showed 174 ms (of ~1000 ms) in
`convert_reduce_fusion` — the fp32 GroupNorm statistics
(docs/ARCHITECTURE.md round-2 journal). In NHWC, a 32-group norm over C=320
means reducing strided 10-lane channel groups: cross-lane partial reductions
the VPU handles poorly. This implementation keeps every heavy reduction
lane-preserving:

  1. spatial sums  s1 = Σ_{h,w} x, s2 = Σ_{h,w} x² -> (B, C)   [lanes intact]
  2. per-group fold of the tiny (B, C) tensors -> (B, G)        [negligible]
  3. elementwise apply y = x·a + b with per-channel (B, C) coefficients
     (fusable into neighboring ops).

Statistics are fp32 (the GroupNorm32 numerics contract, reference
seva/modules/layers.py:61-63); the E[x²]-E[x]² form is computed in fp32 and
parity-tested against flax's two-pass nn.GroupNorm at the model's activation
scales (tests/test_flash_attention.py::test_group_norm_matches_flax).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def layer_norm_fp32(
    x: jnp.ndarray,      # (..., C)
    gamma: jnp.ndarray,  # (C,)
    beta: jnp.ndarray,   # (C,)
    eps: float = 1e-5,
) -> jnp.ndarray:
    """LayerNorm over the last axis with single-pass fp32 statistics.

    flax's nn.LayerNorm on an explicitly fp32-cast input runs TWO reduction
    passes (mean, then E[(x-mean)^2]) over a materialized fp32 copy; with
    ~100 transformer LayerNorms per UNet forward those convert+reduce fusions
    measured 120 ms/fwd. The E[x^2]-E[x]^2 form reduces once with the
    bf16->fp32 convert fused into the reduction. Same fp32-island numerics
    contract; parity-tested against flax (tests/test_flash_attention.py)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    msq = jnp.mean(xf * xf, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(jnp.maximum(msq - mean * mean, 0.0) + eps)
    y = (xf - mean) * rstd * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    return y.astype(x.dtype)


def group_norm_nhwc(
    x: jnp.ndarray,      # (B, H, W, C) or (B, L, C)
    gamma: jnp.ndarray,  # (C,)
    beta: jnp.ndarray,   # (C,)
    groups: int,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """GroupNorm over (spatial, C//groups) with fp32 statistics; returns the
    input dtype."""
    orig_shape = x.shape
    C = orig_shape[-1]
    B = orig_shape[0]
    xf = x.astype(jnp.float32).reshape(B, -1, C)
    n = xf.shape[1] * (C // groups)

    s1 = jnp.sum(xf, axis=1)        # (B, C) — lane-preserving reduction
    s2 = jnp.sum(xf * xf, axis=1)   # (B, C)
    g1 = s1.reshape(B, groups, C // groups).sum(-1)  # (B, G) — tiny
    g2 = s2.reshape(B, groups, C // groups).sum(-1)
    mean = g1 / n
    var = g2 / n - mean * mean
    rstd = jax.lax.rsqrt(jnp.maximum(var, 0.0) + eps)

    def per_channel(v):  # (B, G) -> (B, C)
        return jnp.repeat(v, C // groups, axis=-1)

    gamma_f = gamma.astype(jnp.float32)
    a = per_channel(rstd) * gamma_f
    b = beta.astype(jnp.float32) - per_channel(mean * rstd) * gamma_f
    y = xf * a[:, None, :] + b[:, None, :]
    return y.reshape(orig_shape).astype(x.dtype)
