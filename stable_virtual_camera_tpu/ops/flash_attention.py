"""Pallas TPU flash attention for the multiview transformer.

Replaces the reference's pinned CUDA flash-attention backend
(seva/modules/transformer.py:70-71) with a TPU-native kernel. Targets the
model's self-attention shapes: head_dim 64, sequences from 1296 (per-frame
spatial) to ~27k tokens (the joint t*h*w multiview sequence at ds2,
SURVEY.md §3.4).

Design (see /opt/skills/guides/pallas_guide.md):
  * layout (B*H, L, D); grid (BH, num_q_blocks) — q blocks stream through
    VMEM while the full K/V rows of the current (b,h) stay VMEM-resident
    (<= ~3.5 MB at 27k tokens bf16), re-fetched only when bh changes,
  * online softmax over K chunks in fp32 (m/l/acc carried through a
    fori_loop), scores on the MXU via jnp.dot with
    preferred_element_type=float32,
  * tail masking with broadcasted_iota against the true sequence length
    (grid is cdiv-padded).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Q_BLOCK = 256
K_BLOCK = 512


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, seq_len: int, scale: float):
    q = q_ref[0].astype(jnp.float32)  # (Q_BLOCK, D)
    S_pad = k_ref.shape[1]
    num_k_blocks = S_pad // K_BLOCK
    D = q.shape[-1]

    def body(i, carry):
        acc, m, l = carry
        k = k_ref[0, pl.ds(i * K_BLOCK, K_BLOCK), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(i * K_BLOCK, K_BLOCK), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q,
            k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (Q_BLOCK, K_BLOCK)
        key_ids = i * K_BLOCK + jax.lax.broadcasted_iota(
            jnp.int32, (1, K_BLOCK), 1
        )
        s = jnp.where(key_ids < seq_len, s, -jnp.inf)
        m_i = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m, m_i)
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m - m_new)
        l_new = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * corr + jax.lax.dot_general(
            p,
            v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc_new, m_new, l_new

    acc0 = jnp.zeros((q.shape[0], D), jnp.float32)
    m0 = jnp.full((q.shape[0], 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((q.shape[0], 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, num_k_blocks, body, (acc0, m0, l0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def supported(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> bool:
    """Shapes this kernel handles well: self-attention, head_dim 64, long
    enough that flash beats plain XLA attention."""
    B, L, H, D = q.shape
    S = k.shape[1]
    return D == 64 and L == S and S >= 1024 and q.dtype in (
        jnp.bfloat16,
        jnp.float32,
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def flash_attention(
    q: jnp.ndarray,  # (B, L, H, D)
    k: jnp.ndarray,
    v: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    B, L, H, D = q.shape
    S = k.shape[1]
    scale = float(D) ** -0.5

    L_pad = _round_up(L, Q_BLOCK)
    S_pad = _round_up(S, K_BLOCK)

    def to_bh(x, n, n_pad):
        x = jnp.swapaxes(x, 1, 2).reshape(B * H, n, D)
        if n_pad != n:
            x = jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0)))
        return x

    qb = to_bh(q, L, L_pad)
    kb = to_bh(k, S, S_pad)
    vb = to_bh(v, S, S_pad)

    grid = (B * H, L_pad // Q_BLOCK)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, seq_len=S, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, Q_BLOCK, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, S_pad, D), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, S_pad, D), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, Q_BLOCK, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B * H, L_pad, D), q.dtype),
        interpret=interpret,
    )(qb, kb, vb)

    out = out[:, :L].reshape(B, H, L, D)
    return jnp.swapaxes(out, 1, 2)
