"""Pallas TPU flash attention for the multiview transformer.

Replaces the reference's pinned CUDA flash-attention backend
(seva/modules/transformer.py:70-71) with a TPU-native kernel. Targets the
model's self-attention shapes: head_dim 64, sequences from 1296 (per-frame
spatial) to ~27k tokens (the joint t*h*w multiview sequence at ds2,
SURVEY.md §3.4).

Design (measurements in docs/ARCHITECTURE.md):
  * layout (B*H, L, D); 3-D grid (bh, q_block, k_dma_block). Each grid step
    streams a big K/V slab (up to 4096 rows) processed by an in-kernel fori
    loop in 2048-wide sub-chunks (measured 2-3.8x over one-block-per-step).
  * online softmax in base 2 (log2(e) folded into the scale; exp2 is ~1.8x
    cheaper than exp on the VPU), running (acc, m, l) in VMEM scratch mutated
    by the inner loop, fp32 accumulation, bf16 probabilities for the PV
    matmul.
  * tail masking with broadcasted_iota against the true sequence length
    (grid is cdiv-padded); output block written on the last k step.

A head-grouping variant (G (batch*head) rows per grid step) was explored in
round 2 and removed: its only VMEM-safe configs LOST end-to-end (0.333 vs
0.380 f/s) and the aggressive ones faulted a real TPU worker — see
docs/ARCHITECTURE.md "Round-2 journal".
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LOG2E = 1.4426950408889634  # softmax in base 2: exp(x) == exp2(x * log2(e))
K_INNER = 2048  # score-chunk width per inner iteration; sub-chunking iterates
# over the same VMEM-resident K/V slab, so width costs no extra DMA


def _pick_block(n: int, candidates: tuple[int, ...], max_waste: float = 1.2) -> int:
    """Largest block whose cdiv padding waste stays under `max_waste`, else the
    waste-minimizing one."""
    def waste(b: int) -> float:
        return (-(-n // b) * b) / n

    ok = [b for b in candidates if waste(b) <= max_waste]
    if ok:
        return max(ok)
    return min(candidates, key=waste)


def _flash_kernel(
    q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref,
    *, seq_len: int, scale: float, k_dma: int, k_inner: int
):
    j = pl.program_id(2)
    num_k_blocks = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    def inner(i, _):
        key_ids = (
            j * k_dma
            + i * k_inner
            + jax.lax.broadcasted_iota(jnp.int32, (1, k_inner), 1)
        )
        key_mask = key_ids < seq_len
        q = q_ref[0]  # (q_block, D) — MXU contracts bf16, fp32 accum
        k = k_ref[0, pl.ds(i * k_inner, k_inner), :]
        v = v_ref[0, pl.ds(i * k_inner, k_inner), :]
        s = (
            jax.lax.dot_general(
                q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            * scale
        )  # (q_block, k_inner), already in the exp2 domain
        s = jnp.where(key_mask, s, NEG_INF)

        m_prev = m_ref[0, :, :1]
        l_prev = l_ref[0, :, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp2(s - m_new)
        corr = jnp.exp2(m_prev - m_new)
        l_ref[0, :, :1] = l_prev * corr + jnp.sum(p, axis=-1, keepdims=True)
        acc_ref[0] = acc_ref[0] * corr + jax.lax.dot_general(
            p.astype(v.dtype), v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_ref[0, :, :1] = m_new
        return 0

    jax.lax.fori_loop(0, k_dma // k_inner, inner, 0)

    @pl.when(j == num_k_blocks - 1)
    def _():
        o_ref[0] = (acc_ref[0] / l_ref[0, :, :1]).astype(o_ref.dtype)


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
    scale = float(D) ** -0.5 * LOG2E  # base-2 softmax (see kernel)

    q_block = _pick_block(L, (256, 512, 1024))
    k_dma = _pick_block(S, (512, 1024, 2048, 4096))
    k_inner = min(k_dma, K_INNER)
    L_pad = _round_up(L, q_block)
    S_pad = _round_up(S, k_dma)

    def to_bh(x, n, n_pad):
        x = jnp.swapaxes(x, 1, 2).reshape(B * H, n, D)
        if n_pad != n:
            x = jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0)))
        return x

    qb = to_bh(q, L, L_pad)
    kb = to_bh(k, S, S_pad)
    vb = to_bh(v, S, S_pad)

    grid = (B * H, L_pad // q_block, S_pad // k_dma)
    out = pl.pallas_call(
        functools.partial(
            _flash_kernel, seq_len=S, scale=scale, k_dma=k_dma, k_inner=k_inner,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, q_block, D), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, k_dma, D), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, k_dma, D), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, q_block, D), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B * H, L_pad, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((1, q_block, D), jnp.float32),  # acc
            pltpu.VMEM((1, q_block, 128), jnp.float32),  # running max (col 0)
            pltpu.VMEM((1, q_block, 128), jnp.float32),  # running sum (col 0)
        ],
        interpret=interpret,
    )(qb, kb, vb)

    out = out[:, :L].reshape(B, H, L, D)
    return jnp.swapaxes(out, 1, 2)
