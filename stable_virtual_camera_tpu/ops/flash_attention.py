"""Pallas TPU flash attention for the multiview transformer.

Replaces the reference's pinned CUDA flash-attention backend
(seva/modules/transformer.py:70-71) with a TPU-native kernel. Targets the
model's self-attention shapes: head_dim 64, sequences from 1296 (per-frame
spatial) to ~27k tokens (the joint t*h*w multiview sequence at ds2,
SURVEY.md §3.4).

Design (see /opt/skills/guides/pallas_guide.md):
  * layout (B*H, L, D); 3-D grid (bh, q_block, k_block) with k innermost so
    K/V stream through VMEM in (K_BLOCK, D) tiles — VMEM stays O(blocks),
    independent of sequence length,
  * online softmax in fp32: running (acc, m, l) live in VMEM scratch that
    persists across the sequential k iterations; the output block is written
    on the last k step,
  * scores on the MXU via dot_general with preferred_element_type=float32,
  * tail masking with broadcasted_iota against the true sequence length
    (grid is cdiv-padded).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LOG2E = 1.4426950408889634  # softmax in base 2: exp(x) == exp2(x * log2(e))


def _pick_block(n: int, candidates: tuple[int, ...], max_waste: float = 1.2) -> int:
    """Largest block whose cdiv padding waste stays under `max_waste`, else the
    waste-minimizing one (big blocks keep the MXU busy: Q1024/K2048 measured
    2.4x faster than Q256/K512 on the 27k joint sequence on v5e)."""
    def waste(b: int) -> float:
        return (-(-n // b) * b) / n

    ok = [b for b in candidates if waste(b) <= max_waste]
    if ok:
        return max(ok)
    return min(candidates, key=waste)


def _flash_kernel(
    q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref,
    *, seq_len: int, scale: float, k_block: int
):
    j = pl.program_id(2)
    num_k_blocks = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    q = q_ref[0]  # (q_block, D) — MXU contracts bf16 directly, fp32 accum
    k = k_ref[0]

    s = (
        jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        * scale
    )  # (q_block, k_block)
    key_ids = j * k_block + jax.lax.broadcasted_iota(jnp.int32, (1, k_block), 1)
    s = jnp.where(key_ids < seq_len, s, NEG_INF)

    # base-2 online softmax: log2(e) is folded into `scale` by the caller, so
    # s is already in the exp2 domain — exp2 is ~1.8x faster than exp on the
    # VPU and the kernel is exp-throughput-bound (docs/ARCHITECTURE.md)
    m_prev = m_ref[:, :1]  # (Q_BLOCK, 1)
    l_prev = l_ref[:, :1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp2(s - m_new)
    corr = jnp.exp2(m_prev - m_new)
    l_new = l_prev * corr + jnp.sum(p, axis=-1, keepdims=True)
    # bf16 probabilities for the PV matmul: measured ~2x on v5e (the MXU runs
    # the p@v contraction at twice the rate), error indistinguishable from the
    # bf16 output rounding
    acc_ref[:] = acc_ref[:] * corr + jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(j == num_k_blocks - 1)
    def _():
        o_ref[0] = (acc_ref[:] / l_ref[:, :1]).astype(o_ref.dtype)


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
    k_block = _pick_block(S, (512, 1024, 2048))
    L_pad = _round_up(L, q_block)
    S_pad = _round_up(S, k_block)

    def to_bh(x, n, n_pad):
        x = jnp.swapaxes(x, 1, 2).reshape(B * H, n, D)
        if n_pad != n:
            x = jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0)))
        return x

    qb = to_bh(q, L, L_pad)
    kb = to_bh(k, S, S_pad)
    vb = to_bh(v, S, S_pad)

    grid = (B * H, L_pad // q_block, S_pad // k_block)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, seq_len=S, scale=scale, k_block=k_block),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, q_block, D), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, k_block, D), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, k_block, D), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, q_block, D), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B * H, L_pad, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((q_block, D), jnp.float32),  # acc
            pltpu.VMEM((q_block, 128), jnp.float32),  # running max (lane-bcast)
            pltpu.VMEM((q_block, 128), jnp.float32),  # running sum (lane-bcast)
        ],
        interpret=interpret,
    )(qb, kb, vb)

    out = out[:, :L].reshape(B, H, L, D)
    return jnp.swapaxes(out, 1, 2)
