"""Head-packed Pallas TPU flash attention: operates on (B, L, H*D) directly.

Round-1's kernel (ops/flash_attention.py) used the classic (B*H, L, D)
layout, which forced a transpose+reshape of q/k/v on entry and of the output
on exit — measured ~10% of every UNet forward in layout copies, and the
producer copies stalled the kernel in-context (docs/ARCHITECTURE.md round-2
roadmap items 1-2). This kernel removes the copies entirely:

  * q/k/v come in as (B, L, W) with W = heads*64 — the exact layout the fused
    qkv projection produces — and the output leaves in the same layout that
    to_out consumes. Zero layout ops outside the kernel.
  * grid (B, q_blocks, k_blocks), k innermost. Each step DMAs a (k_dma, W)
    K/V slab — ALL heads at once, H× fewer grid steps than (B*H, ...) for the
    same bytes; the kernel was measured pipeline/DMA-step-bound, so fewer,
    fatter steps is the lever.
  * inside: fori over k_inner sub-chunks, static python loop over heads;
    per head a (q_block, k_inner) fp32 score block, base-2 online softmax
    (exp2; log2(e) folded into the scale), running (m, l) per head in columns
    of a (q_block, 128) fp32 scratch, fp32 accumulator (q_block, W), bf16
    probabilities for the PV matmul.

Replaces the reference's pinned CUDA flash-attention backend
(seva/modules/transformer.py:70-71) on the multiview self-attention shapes
(SURVEY.md §3.4): per-frame 5184/1296 tokens and joint t*h*w 1701/6804/27216
tokens, head_dim 64, 5-20 heads.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LOG2E = 1.4426950408889634
HEAD_DIM = 64

# Total VMEM model (bytes) driving block-size choice: Pallas double-buffers
# every in/out block, acc is fp32 (q_block, W), and the per-head fp32 score
# block (q_block, k_inner) lives in vregs/VMEM. ~16 MB/core on v5e; leave
# headroom for Mosaic's own temporaries.
_VMEM_BUDGET = 13 * 2**20


def _vmem_bytes(q_block: int, k_dma: int, k_inner: int, W: int, itemsize: int) -> int:
    kv = 2 * 2 * k_dma * W * itemsize          # k + v, double-buffered
    q_out = 2 * 2 * q_block * W * itemsize     # q + out, double-buffered
    acc = q_block * W * 4
    scores = q_block * k_inner * 4
    return kv + q_out + acc + scores + 2 * q_block * 128 * 4


def _pick_blocks(L: int, S: int, W: int, itemsize: int) -> tuple[int, int, int]:
    """Largest (q_block, k_dma) fitting the VMEM model; maximizing q_block*k_dma
    minimizes grid steps (the kernel is pipeline/step-bound), larger q_block
    preferred on ties (K/V stream volume scales with the q-block count)."""
    best = None
    for q_block in (1024, 512, 256, 128):
        if q_block // 2 >= max(L, 128):  # don't over-pad short sequences
            continue
        for k_dma in (4096, 2048, 1024, 512, 256):
            for k_inner in (min(k_dma, 2048), min(k_dma, 1024), min(k_dma, 512)):
                if k_dma % k_inner:
                    continue
                if _vmem_bytes(q_block, k_dma, k_inner, W, itemsize) > _VMEM_BUDGET:
                    continue
                key = (q_block * k_dma, q_block, k_inner)
                if best is None or key > best[0]:
                    best = (key, (q_block, k_dma, k_inner))
                break  # largest feasible k_inner for this (q, k_dma)
    assert best is not None, (L, S, W)
    return best[1]


def _flash_packed_kernel(
    q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref,
    *, seq_len: int, heads: int, scale: float, k_dma: int, k_inner: int,
):
    j = pl.program_id(2)
    num_k = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    def inner(i, _):
        k_blk = k_ref[0, pl.ds(i * k_inner, k_inner), :]  # (k_inner, W)
        v_blk = v_ref[0, pl.ds(i * k_inner, k_inner), :]
        key_ids = (
            j * k_dma
            + i * k_inner
            + jax.lax.broadcasted_iota(jnp.int32, (1, k_inner), 1)
        )
        key_mask = key_ids < seq_len
        for h in range(heads):
            sl = slice(h * HEAD_DIM, (h + 1) * HEAD_DIM)
            s = (
                jax.lax.dot_general(
                    q_ref[0, :, sl], k_blk[:, sl],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                * scale
            )  # (q_block, k_inner), base-2 domain
            s = jnp.where(key_mask, s, NEG_INF)
            m_prev = m_ref[:, h : h + 1]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp2(s - m_new)
            corr = jnp.exp2(m_prev - m_new)
            l_ref[:, h : h + 1] = (
                l_ref[:, h : h + 1] * corr + jnp.sum(p, axis=-1, keepdims=True)
            )
            acc_ref[:, sl] = acc_ref[:, sl] * corr + jax.lax.dot_general(
                p.astype(v_blk.dtype), v_blk[:, sl],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            m_ref[:, h : h + 1] = m_new
        return 0

    jax.lax.fori_loop(0, k_dma // k_inner, inner, 0)

    @pl.when(j == num_k - 1)
    def _():
        # l > 0 always: the j=0 K block contains valid keys for every q row
        # (padded q rows score 0 on them), so no 0-div guard is needed.
        for h in range(heads):
            sl = slice(h * HEAD_DIM, (h + 1) * HEAD_DIM)
            o_ref[0, :, sl] = (
                acc_ref[:, sl] / l_ref[:, h : h + 1]
            ).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def supported(q: jnp.ndarray, k: jnp.ndarray, heads: int) -> bool:
    """(B, L, W) self-attention shapes this kernel handles well."""
    B, L, W = q.shape
    return (
        W == heads * HEAD_DIM
        and W % 128 == 0  # odd head counts (W=320) slice across lane tiles
        and L == k.shape[1]
        and L >= 1024
        and q.dtype in (jnp.bfloat16, jnp.float32)
    )


@functools.partial(jax.jit, static_argnames=("heads", "interpret"))
def flash_attention_packed(
    q: jnp.ndarray,  # (B, L, W) with W = heads * 64
    k: jnp.ndarray,
    v: jnp.ndarray,
    heads: int,
    interpret: bool = False,
) -> jnp.ndarray:
    B, L, W = q.shape
    S = k.shape[1]
    assert W == heads * HEAD_DIM, (W, heads)
    scale = float(HEAD_DIM) ** -0.5 * LOG2E

    q_block, k_dma, k_inner = _pick_blocks(L, S, W, q.dtype.itemsize)
    L_pad = _round_up(L, q_block)
    S_pad = _round_up(S, k_dma)
    if L_pad != L:
        q = jnp.pad(q, ((0, 0), (0, L_pad - L), (0, 0)))
    if S_pad != S:
        k = jnp.pad(k, ((0, 0), (0, S_pad - S), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, S_pad - S), (0, 0)))

    grid = (B, L_pad // q_block, S_pad // k_dma)
    out = pl.pallas_call(
        functools.partial(
            _flash_packed_kernel,
            seq_len=S, heads=heads, scale=scale, k_dma=k_dma, k_inner=k_inner,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, q_block, W), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, k_dma, W), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, k_dma, W), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, q_block, W), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, L_pad, W), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((q_block, W), jnp.float32),    # acc
            pltpu.VMEM((q_block, 128), jnp.float32),  # running max, col per head
            pltpu.VMEM((q_block, 128), jnp.float32),  # running sum, col per head
        ],
        interpret=interpret,
    )(q, k, v)

    return out[:, :L] if L_pad != L else out
