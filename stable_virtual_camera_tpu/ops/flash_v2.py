"""Software-pipelined Pallas flash attention, v2 (round 3).

Why another kernel: at D=64 BOTH flash matmuls run at half the MXU peak (QK
contracts over 64; PV writes 64 lanes), capping attention at ~98 TF/s on a
v5e — and the measured ~70 TF/s of the upstream kernel (tuned, round-3
journal) is exactly what a fully SERIALIZED [QK -> softmax -> PV] inner loop
predicts: the VPU softmax sits on the critical path between the two MXU ops.

This kernel overlaps them with a 2-stage software pipeline across grid steps:

    step j:  MXU: QK for chunk j            (independent of the drain)
             VPU: softmax state for chunk j (waits only on its own QK)
             MXU: PV for chunk j-1 (p/corr from parity-buffered VMEM
                  scratch, v lagged one grid step via its BlockSpec
                  index_map — independent of this step's softmax)

so softmax(j) on the VPU overlaps PV(j-1) on the MXU; the p/corr scratch is
double-buffered by grid-step parity so the softmax stores carry no
write-after-read hazard against the drain (with one buffer they would, and
the scheduler would be forced back to the serialized upstream order). The
last grid step (grid = n_k + 1) drains the final chunk and writes the output.

Second structural win vs the upstream kernel: k-blocks here live in the
SUBLANE dimension (tiles are (block, 64) with D=64 in lanes), so block sizes
only need 8-divisibility — the model's 81-smooth sequence lengths factor
into 8-divisible blocks exactly (5184 = 432*12, 27216 = 1008*27, 1296 =
432*3), meaning ZERO padding and ZERO masking work on the hot shapes (the
upstream kernel's lane-major k-blocks must be 128-multiples, forcing padded
keys + segment-id masking everywhere).

Numerics contract matches ops/flash_attention.py: bf16 matmul inputs, fp32
accumulation, online softmax in base 2 (exp2, log2(e) folded into the scale).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LOG2E = 1.4426950408889634

# Sequence lengths where v2 beat the tuned upstream kernel on a v5e chip
# (benchmark/flash_v2_probe.py, in-scan dependent-call loops; round-3
# journal). The model dispatches per-shape: v2 for these, upstream
# otherwise (models/unet.Attention, SVC_FLASH_V2=auto).
V2_WINS: frozenset[int] = frozenset()


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(
    q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref, p_ref, c_ref,
    *, seq_len: int, scale: float, k_blk: int, mask_last: bool,
):
    j = pl.program_id(2)
    n_k = pl.num_programs(2) - 1  # last step only drains

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    # p/corr scratch is DOUBLE-BUFFERED by grid-step parity: fill(j) writes
    # buffer j%2 while the drain of chunk j-1 reads buffer (j-1)%2. With a
    # single buffer the fill's softmax stores would carry a write-after-read
    # hazard against the drain's PV matmul, serializing exactly the two ops
    # the pipeline exists to overlap; with two buffers the scheduler is free
    # to run softmax(j) on the VPU while PV(j-1) occupies the MXU.
    def fill(masked: bool, buf: int):
        s = (
            jax.lax.dot_general(
                q_ref[0],
                k_ref[0],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            * scale
        )  # (q_blk, k_blk), exp2 domain
        if masked:
            ids = (n_k - 1) * k_blk + jax.lax.broadcasted_iota(
                jnp.int32, (1, k_blk), 1
            )
            s = jnp.where(ids < seq_len, s, NEG_INF)
        m_prev = m_ref[0, :, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp2(s - m_new)
        corr = jnp.exp2(m_prev - m_new)
        l_ref[0, :, :1] = l_ref[0, :, :1] * corr + jnp.sum(
            p, axis=-1, keepdims=True
        )
        m_ref[0, :, :1] = m_new
        c_ref[buf, :, :1] = corr
        p_ref[buf] = p.astype(p_ref.dtype)

    def drain(buf: int):
        acc_ref[0] = acc_ref[0] * c_ref[buf, :, :1] + jax.lax.dot_general(
            p_ref[buf],
            v_ref[0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    # fill first (QK on the MXU, softmax on the VPU), then drain chunk j-1
    # (PV on the MXU, reading the OTHER parity buffer; v_ref lags one grid
    # step via its BlockSpec index_map). Static parity branches keep every
    # scratch index constant for Mosaic.
    for par in (0, 1):
        if mask_last:
            @pl.when((j % 2 == par) & (j < n_k - 1))
            def _(par=par):
                fill(False, par)

            @pl.when((j % 2 == par) & (j == n_k - 1))
            def _(par=par):
                fill(True, par)
        else:
            @pl.when((j % 2 == par) & (j < n_k))
            def _(par=par):
                fill(False, par)

        @pl.when((j % 2 == par) & (j > 0))
        def _(par=par):
            drain(1 - par)

    @pl.when(j == n_k)
    def _():
        o_ref[0] = (acc_ref[0] / l_ref[0, :, :1]).astype(o_ref.dtype)


def _pick_block(n: int, lo: int = 384, hi: int = 1024) -> tuple[int, int]:
    """(padded_n, block): largest 8-divisible block in [lo, hi] that divides
    an 8-multiple padding of n with <= 4% waste; else pad to a 512 grid."""
    n8 = _round_up(n, 8)
    best = None
    for blk in range(hi, lo - 1, -8):
        pad = _round_up(n8, blk)
        if pad / n <= 1.04 and (best is None or pad < best[0]):
            best = (pad, blk)
    if best is None:
        best = (_round_up(n8, 512), 512)
    return best


@functools.partial(jax.jit, static_argnames=("interpret",))
def _flash_v2_impl(
    q: jnp.ndarray,  # (B, H, L, D) — same entry layout as flash_upstream
    k: jnp.ndarray,
    v: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    B, H, L, D = q.shape
    scale = float(D) ** -0.5 * LOG2E
    q_pad, q_blk = _pick_block(L)
    kv_pad, k_blk = _pick_block(L)

    def pad_to(x, target):
        if target != L:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, target - L), (0, 0)))
        return x.reshape(B * H, target, D)

    qb, kb, vb = pad_to(q, q_pad), pad_to(k, kv_pad), pad_to(v, kv_pad)
    n_k = kv_pad // k_blk
    grid = (B * H, q_pad // q_blk, n_k + 1)
    out = pl.pallas_call(
        functools.partial(
            _kernel,
            seq_len=L,
            scale=scale,
            k_blk=k_blk,
            mask_last=kv_pad != L,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, q_blk, D),
                lambda b, i, j: (b, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, k_blk, D),
                lambda b, i, j, _n=n_k: (b, jnp.minimum(j, _n - 1), 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, k_blk, D),
                lambda b, i, j: (b, jnp.maximum(j - 1, 0), 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, q_blk, D), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B * H, q_pad, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((1, q_blk, D), jnp.float32),      # acc
            pltpu.VMEM((1, q_blk, 128), jnp.float32),    # running max (col 0)
            pltpu.VMEM((1, q_blk, 128), jnp.float32),    # running sum (col 0)
            pltpu.VMEM((2, q_blk, k_blk), jnp.bfloat16), # p, parity-buffered
            pltpu.VMEM((2, q_blk, 128), jnp.float32),    # corr, parity-buffered
        ],
        interpret=interpret,
    )(qb, kb, vb)
    return out.reshape(B, H, q_pad, D)[:, :, :L]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_v2_bhld(
    q: jnp.ndarray,  # (B, H, L, D)
    k: jnp.ndarray,
    v: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """Differentiable entry point. Forward = the software-pipelined kernel;
    backward = the upstream flash kernel's VJP (the exact same math — both
    compute softmax(q kᵀ/√D) v — so gradients differ only at bf16 rounding),
    which keeps the backward O(block²) in VMEM instead of materializing the
    (L, L) score tensor. Under `interpret` (CPU tests) the backward is the
    standard fp32 einsum SDPA gradient instead."""
    return _flash_v2_impl(q, k, v, interpret)


def _v2_fwd(q, k, v, interpret):
    return _flash_v2_impl(q, k, v, interpret), (q, k, v)


def _v2_bwd(interpret, res, do):
    q, k, v = res
    if not interpret:
        from stable_virtual_camera_tpu.ops.flash_upstream import (
            flash_attention_upstream_bhld,
        )

        _, vjp = jax.vjp(flash_attention_upstream_bhld, q, k, v)
        return vjp(do)

    D = q.shape[-1]
    qf, kf, vf, dof = (t.astype(jnp.float32) for t in (q, k, v, do))
    s = jnp.einsum("bhld,bhsd->bhls", qf, kf) * (D**-0.5)
    p = jax.nn.softmax(s, axis=-1)
    dv = jnp.einsum("bhls,bhld->bhsd", p, dof)
    dp = jnp.einsum("bhld,bhsd->bhls", dof, vf)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True)) * (D**-0.5)
    dq = jnp.einsum("bhls,bhsd->bhld", ds, kf)
    dk = jnp.einsum("bhls,bhld->bhsd", ds, qf)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


flash_v2_bhld.defvjp(_v2_fwd, _v2_bwd)
