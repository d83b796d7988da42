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


# Per-sequence-length tuned layouts, measured on a v5e chip with in-scan
# dependent-call loops (benchmark/attn_probe2.py, round-3 journal). The
# kernel's real constraints: block_k must be a 128-multiple OR equal the kv
# length; block_q must be 8-divisible and divide the (separately padded) q
# length. The model's lengths are 81·2^k-smooth, so q usually needs ZERO
# padding (1296 = 81·16 divides both 5184 and 27216) and kv pads to ≤3.7%
# instead of the generic 1024-multiple's 18.5%.
#   L -> (q_pad, block_q, kv_pad, block_k)   [measured ms/call vs generic]
_TUNED: dict[int, tuple[int, int, int, int]] = {
    5184: (5184, 1296, 5376, 1792),   # 26.7 vs 33.5 generic (pf_ds1)
    1296: (1296, 1296, 1296, 1296),   # 7.1 vs 8.6 (pf_ds2); bk == kv len
    324: (324, 324, 324, 324),        # 4.5 vs 7.8 (pf_ds4); bk == kv len
    27216: (27216, 1296, 27648, 1024),  # 57.7 vs 58.0 (joint_ds2), no q pad
    # 6804 / 1701 (joint_ds4/ds8): generic 1024/1024 measured best
    # BASIC workload lengths (768x576 -> 72x96 latents), measured round-5
    # on v5e (benchmark/attn_probe_basic.py); 6912 = 54*128 needs NO
    # padding anywhere:
    6912: (6912, 1152, 6912, 2304),   # 44.61 vs 44.66 generic (pf_ds1)
    1728: (1728, 1728, 1728, 1728),   # 9.55 vs 10.96 (pf_ds2); bk == kv len
    432: (432, 432, 432, 432),        # 4.47 vs 4.56 (pf_ds4); bk == kv len
    36288: (36288, 1296, 36864, 1024),  # 99.1 vs 101.6 (joint_ds2), no q pad
    9072: (9072, 1296, 9216, 1024),   # 15.40 vs 16.25 (joint_ds4)
    2268: (2304, 1152, 2304, 1152),   # 4.28 == generic, 10% less padding
}


def _tuned_enabled() -> bool:
    """SVC_FLASH_TUNED=0 ignores the measured layout table (generic blocks
    everywhere) — the safety/bisect fallback when a layout that compiled
    standalone misbehaves inside the full program on some toolchain."""
    import os

    return os.environ.get("SVC_FLASH_TUNED", "1") != "0"


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
    if L in _TUNED and _tuned_enabled():
        q_pad, bq, kv_pad, bk = _TUNED[L]
    else:
        block = _pick(L)
        q_pad = kv_pad = _round_up(L, block)
        bq = bk = block

    def padded(x, target):
        if target != L:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, target - L), (0, 0)))
        return x

    qp = padded(q, q_pad)
    kp, vp = padded(k, kv_pad), padded(v, kv_pad)
    if q_pad == L and kv_pad == L:
        seg = None  # no padding anywhere -> skip all masking work
    else:
        q_ids = (jnp.arange(q_pad) >= L).astype(jnp.int32)  # 0=real, 1=pad
        kv_ids = (jnp.arange(kv_pad) >= L).astype(jnp.int32)
        seg = SegmentIds(
            q=jnp.broadcast_to(q_ids, (B, q_pad)),
            kv=jnp.broadcast_to(kv_ids, (B, kv_pad)),
        )
    sizes = BlockSizes(
        block_q=bq,
        block_k_major=bk,
        block_k=bk,
        block_b=1,
        block_q_major_dkv=bq,
        block_k_major_dkv=bk,
        block_k_dkv=bk,
        block_q_dkv=bq,
        block_k_major_dq=bk,
        block_k_dq=bk,
        block_q_dq=bq,
    )
    out = _upstream(
        qp, kp, vp,
        segment_ids=seg,
        sm_scale=float(D) ** -0.5,
        block_sizes=sizes,
    )  # (B, H, q_pad, D)
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
