"""Adapter for JAX's upstream Pallas TPU flash-attention kernel.

`jax.experimental.pallas.ops.tpu.flash_attention` is the mature, tuned
multi-head attention kernel (fwd + bwd) shipped with JAX. This wraps it for
the model's (B, L, H, D) self-attention shapes: transpose to the kernel's
(B, H, L, D) layout, pad the sequence to the block size, and mask the padded
keys via segment ids (padded tokens get segment 1, real tokens 0 — the
kernel only attends within equal segments).

Enabled end-to-end via SVC_UPSTREAM_FLASH=1 (A/B against ops/flash_attention
in bench.py; journal in docs/ARCHITECTURE.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental.pallas.ops.tpu.flash_attention import (
    BlockSizes,
    SegmentIds,
    flash_attention as _upstream,
)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pick(n: int) -> int:
    """Block size: big blocks for long sequences, bounded padding for short."""
    for b in (1024, 512, 256, 128):
        if _round_up(n, b) <= int(n * 1.25):
            return b
    return 128


def flash_attention_upstream_bhld(
    q: jnp.ndarray,  # (B, H, L, D) — the kernel's native layout
    k: jnp.ndarray,
    v: jnp.ndarray,
) -> jnp.ndarray:
    """Upstream kernel on already-(B, H, L, D) operands: no transposes, only
    the pad-to-block + segment masking. Produce the layout for free by
    fusing it into the projection GEMMs: einsum('blc,chd->bhld', x, W) writes
    (B,H,L,D) in the matmul epilogue (models/unet.Attention does this)."""
    B, H, L, D = q.shape
    block = _pick(L)
    L_pad = _round_up(L, block)

    def padded(x):
        if L_pad != L:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, L_pad - L), (0, 0)))
        return x

    qp, kp, vp = padded(q), padded(k), padded(v)
    ids = (jnp.arange(L_pad) >= L).astype(jnp.int32)  # 0 = real, 1 = padding
    seg = SegmentIds(
        q=jnp.broadcast_to(ids, (B, L_pad)), kv=jnp.broadcast_to(ids, (B, L_pad))
    )
    sizes = BlockSizes(
        block_q=block,
        block_k_major=block,
        block_k=block,
        block_b=1,
        block_q_major_dkv=block,
        block_k_major_dkv=block,
        block_k_dkv=block,
        block_q_dkv=block,
        block_k_major_dq=block,
        block_k_dq=block,
        block_q_dq=block,
    )
    out = _upstream(
        qp, kp, vp,
        segment_ids=seg,
        sm_scale=float(D) ** -0.5,
        block_sizes=sizes,
    )  # (B, H, L_pad, D)
    return out[:, :, :L]


@functools.partial(jax.jit, static_argnames=())
def flash_attention_upstream(
    q: jnp.ndarray,  # (B, L, H, D)
    k: jnp.ndarray,
    v: jnp.ndarray,
) -> jnp.ndarray:
    B, L, H, D = q.shape
    S = k.shape[1]
    assert L == S, "self-attention only"
    block = _pick(L)
    L_pad = _round_up(L, block)

    def to_bhld(x):
        x = jnp.swapaxes(x, 1, 2)  # (B, H, L, D)
        if L_pad != L:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, L_pad - L), (0, 0)))
        return x

    qp, kp, vp = to_bhld(q), to_bhld(k), to_bhld(v)
    ids = (jnp.arange(L_pad) >= L).astype(jnp.int32)  # 0 = real, 1 = padding
    seg = SegmentIds(
        q=jnp.broadcast_to(ids, (B, L_pad)), kv=jnp.broadcast_to(ids, (B, L_pad))
    )
    sizes = BlockSizes(
        block_q=block,
        block_k_major=block,
        block_k=block,
        block_b=1,
        block_q_major_dkv=block,
        block_k_major_dkv=block,
        block_k_dkv=block,
        block_q_dkv=block,
        block_k_major_dq=block,
        block_k_dq=block,
        block_q_dq=block,
    )
    out = _upstream(
        qp.astype(jnp.float32) if qp.dtype == jnp.float32 else qp,
        kp, vp,
        segment_ids=seg,
        sm_scale=float(D) ** -0.5,
        block_sizes=sizes,
    )  # (B, H, L_pad, D)
    out = out[:, :, :L]
    return jnp.swapaxes(out, 1, 2)
