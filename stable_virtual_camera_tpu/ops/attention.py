"""Attention ops for the multiview transformer.

The reference pins torch SDPA to its flash-attention CUDA kernel
(seva/modules/transformer.py:70-71). The TPU equivalents here:

  * `attention_xla`      — einsum attention with an fp32 softmax island; fine
                           for short sequences (time-mix over T frames).
  * `attention_chunked`  — online-softmax attention scanned over KV chunks:
                           O(L) memory, needed for the joint 3D-attention
                           sequences (t*h*w up to ~27k tokens at 576^2).
  * Pallas flash kernel  — `ops/flash_attention.py`, used on TPU when shapes
                           are tile-aligned (the chip-utilization lever).

All take (B, L, H, D) query / (B, S, H, D) key-value layouts and return
(B, L, H, D). Softmax is always computed in float32 regardless of the io
dtype (bf16), matching the reference's autocast behavior.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def _sdpa_scale(d: int) -> float:
    return d**-0.5


def attention_xla(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Plain einsum attention; scores materialized (B, H, L, S)."""
    d = q.shape[-1]
    scores = jnp.einsum("blhd,bshd->bhls", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(scores * _sdpa_scale(d), axis=-1)
    out = jnp.einsum("bhls,bshd->blhd", probs.astype(v.dtype), v)
    return out


def attention_chunked(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_chunk: int = 1024,
) -> jnp.ndarray:
    """Online-softmax (flash-style) attention scanned over KV chunks.

    Numerically identical to full attention (up to fp associativity); memory
    is O(L * kv_chunk) instead of O(L * S).
    """
    B, L, H, D = q.shape
    S = k.shape[1]
    if S <= kv_chunk:
        return attention_xla(q, k, v)
    num_chunks = -(-S // kv_chunk)
    pad = num_chunks * kv_chunk - S
    if pad:
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
    kc = k.reshape(B, num_chunks, kv_chunk, H, D)
    vc = v.reshape(B, num_chunks, kv_chunk, H, D)
    scale = _sdpa_scale(D)

    def step(carry, kv):
        acc, m, l = carry
        k_i, v_i, idx = kv
        s = (
            jnp.einsum("blhd,bshd->bhls", q, k_i, preferred_element_type=jnp.float32)
            * scale
        )
        # mask out padded keys in the final chunk
        key_ids = idx * kv_chunk + lax.broadcasted_iota(jnp.int32, (1, 1, 1, kv_chunk), 3)
        s = jnp.where(key_ids < S, s, -jnp.inf)
        m_i = jnp.max(s, axis=-1)  # (B, H, L)
        m_new = jnp.maximum(m, m_i)
        p = jnp.exp(s - m_new[..., None])
        corr = jnp.exp(m - m_new)
        l_new = l * corr + jnp.sum(p, axis=-1)
        acc_new = acc * corr[..., None] + jnp.einsum(
            "bhls,bshd->bhld", p, v_i.astype(jnp.float32)
        )
        return (acc_new, m_new, l_new), None

    acc0 = jnp.zeros((B, H, L, D), jnp.float32)
    m0 = jnp.full((B, H, L), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((B, H, L), jnp.float32)
    (acc, m, l), _ = lax.scan(
        step,
        (acc0, m0, l0),
        (
            jnp.moveaxis(kc, 1, 0),
            jnp.moveaxis(vc, 1, 0),
            jnp.arange(num_chunks),
        ),
    )
    out = acc / l[..., None]
    return jnp.transpose(out, (0, 2, 1, 3)).astype(q.dtype)


@jax.custom_vjp
def flash_attention_trainable(q, k, v):
    """Differentiable flash attention: the Pallas kernel runs the forward;
    the backward RECOMPUTES attention with the O(L)-memory online-softmax
    scan and differentiates through it (recompute-based custom_vjp — the
    kernel itself has no bwd pass; this keeps training memory bounded at the
    27k-token joint sequences while the forward stays on the fast kernel)."""
    from stable_virtual_camera_tpu.ops import flash_attention as fa

    return fa.flash_attention(q, k, v)


def _flash_fwd(q, k, v):
    return flash_attention_trainable(q, k, v), (q, k, v)


def _flash_bwd(res, g):
    q, k, v = res
    _, vjp = jax.vjp(attention_chunked, q, k, v)
    return vjp(g.astype(q.dtype))


flash_attention_trainable.defvjp(_flash_fwd, _flash_bwd)


@functools.partial(jax.named_call, name="sdpa")
def scaled_dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    use_pallas: bool = False,
    xla_max_seq: int = 4096,
) -> jnp.ndarray:
    """Dispatching SDPA. `use_pallas` routes tile-aligned shapes to the Pallas
    flash kernel (TPU); otherwise picks einsum vs chunked by sequence length."""
    if use_pallas:
        from stable_virtual_camera_tpu.ops import flash_attention as fa

        if fa.supported(q, k, v):
            import os

            # default = JAX's upstream tuned kernel (measured faster in-context
            # than ops/flash_attention: denoise 49.8s vs 51.7s, and its
            # registered custom-vjp flash backward replaces the recompute
            # fallback); SVC_UPSTREAM_FLASH=0 selects the in-repo kernel.
            if os.environ.get("SVC_UPSTREAM_FLASH", "1") == "1":
                from stable_virtual_camera_tpu.ops.flash_upstream import (
                    flash_attention_upstream,
                )

                return flash_attention_upstream(q, k, v)
            return flash_attention_trainable(q, k, v)
    if k.shape[1] > xla_max_seq:
        return attention_chunked(q, k, v)
    return attention_xla(q, k, v)


@functools.partial(jax.named_call, name="sdpa_packed")
def sdpa_packed(
    q: jnp.ndarray,  # (B, L, W) with W = heads * 64 — the qkv-projection layout
    k: jnp.ndarray,
    v: jnp.ndarray,
    heads: int,
    *,
    use_pallas: bool = False,
) -> jnp.ndarray:
    """SDPA on the packed (B, L, heads*64) layout.

    The head-packed Pallas kernel (ops/flash_attention_packed.py) consumes
    this layout with ZERO layout ops, but its per-head 64-lane slices measured
    SLOWER end-to-end than the (B*H, L, D) kernel plus its transposes
    (0.318 vs 0.362 f/s on the full bench — docs/ARCHITECTURE.md round-2
    journal), so it is opt-in via SVC_PACKED_ATTENTION=1 until the slicing
    cost is solved; the default routes through the proven reshape path.
    """
    if use_pallas:
        import os

        if os.environ.get("SVC_PACKED_ATTENTION", "0") == "1":
            from stable_virtual_camera_tpu.ops import flash_attention_packed as fap

            if fap.supported(q, k, heads):
                return fap.flash_attention_packed(q, k, v, heads)
    B, L, W = q.shape
    S = k.shape[1]
    d = W // heads
    out = scaled_dot_product_attention(
        q.reshape(B, L, heads, d),
        k.reshape(B, S, heads, d),
        v.reshape(B, S, heads, d),
        use_pallas=use_pallas,
    )
    return out.reshape(B, L, W)
