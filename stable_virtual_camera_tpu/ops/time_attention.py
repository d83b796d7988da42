"""Temporal (time-mix) attention as a Pallas TPU kernel.

Every spatial location attends over the T≈21 frames (reference
seva/modules/transformer.py:113-155). As XLA dot_generals this is b·S·H
independent 21x21x64 matmuls — 21x21 output tiles fill 2.7% of the MXU and
measured ~1 TF/s end-to-end (~13.3 ms/layer at ds1,
benchmark/timemix_probe.py, round-3); a grouped block-diagonal XLA variant
loses even harder (17.0 ms — the 6x-inflated score tensor and the regrouping
relayouts dominate).

This kernel batches the tiny attentions over the VPU's LANE axis instead:
inputs arrive as (b·T, H, D, S) — spatial positions in lanes, head_dim in
sublanes — and a grid instance owns the (T, D, s_block) tiles of q/k/v for
one (scene, head). Scores and probabilities live ONLY in VMEM scratch
(the XLA path writes + rereads a 183 MB fp32 score tensor at ds1):

    for t in range(T):  S[t] = sum_d q[t,d,:]*k[:,d,:]     (sublane reduce)
    softmax over the key-frame axis (sublane reduce on the (T,T,s) scratch)
    for t in range(T):  o[t] = sum_u P[t,u,:]*v[u,:,:]     (major-dim reduce)

All arithmetic is fp32 (exact bf16->fp32 products, fp32 softmax), matching
the XLA path's preferred_element_type=f32 contract. Only constructs proven
in ops/flash_attention.py on this hardware are used (ref reads/writes,
broadcasting, axis reduces — no in-kernel transposes, stacks, or reshapes:
a first transpose-based variant hung the Mosaic compile, round-3 journal).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, k_ref, v_ref, o_ref, s_ref, *, T: int, scale: float):
    # tiles: (T, 1, D, s_blk); scratch s_ref: (T, T, s_blk) fp32.
    # bf16->f32 converts stay per-use (inside the loop bodies) so Mosaic can
    # fuse them into the multiplies instead of holding whole-tile f32 copies.
    k = k_ref[:, 0]  # (T, D, s)
    q = q_ref[:, 0]
    for t in range(T):
        # scores for query frame t against all key frames: (T, s)
        prod = q[t][None].astype(jnp.float32) * k.astype(jnp.float32)
        s_ref[t] = jnp.sum(prod, axis=1) * scale
    s = s_ref[...]  # (T_q, T_k, s)
    m = jnp.max(s, axis=1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=1, keepdims=True)  # (T_q, T_k, s)
    v = v_ref[:, 0]  # (T, D, s)
    for t in range(T):
        pv = p[t][:, None, :] * v.astype(jnp.float32)
        o_ref[t, 0] = jnp.sum(pv, axis=0).astype(o_ref.dtype)


def pick_s_block(
    S: int,
    candidates: tuple[int, ...] = (512, 256, 128),
    T: int = 21,
    D: int = 64,
    vmem_budget: int = 8 * 2**20,
) -> int:
    """Largest lane-block with <=4% cdiv padding waste AND an estimated
    VMEM footprint under budget, else waste-minimizing among fitting blocks.

    The footprint bound matters: a grid instance holds double-buffered
    q/k/v/out tiles (T, D, b) bf16, the (T, T, b) fp32 score scratch, and
    Mosaic's softmax temporaries — measured 17.46 MB at T=21/D=64/b=512
    (over the 16 MB scoped-VMEM limit) where the formula below estimates
    11.9 MB, hence the 8 MB budget (the ~1.5x temporary overhead rides the
    margin). 576^2 shapes never selected 512 (their waste fails first); the
    Basic 768x576 shapes (S=6912: 512 divides to 4% waste) were the first
    to trip it — Mosaic refuses the kernel with a compile-time scoped-vmem
    OOM (measured: bench --scenario basic warmup, round-5 journal).

    Callers that pad their activations BEFORE the q/k/v projections (one pad
    of x instead of three pads of q/k/v — models/unet.py time path) need the
    block choice up front."""
    def waste(b: int) -> float:
        return (-(-S // b) * b) / S

    def vmem(b: int) -> int:
        return 2 * 4 * T * D * b * 2 + T * T * b * 4

    fits = [b for b in candidates if vmem(b) <= vmem_budget]
    if not fits:
        fits = [min(candidates)]
    ok = [b for b in fits if waste(b) <= 1.04]
    return max(ok) if ok else min(fits, key=waste)


def _kernel_call(
    q: jnp.ndarray,  # (b*T, H, D, S) — spatial in lanes
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_frames: int,
    s_block: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Temporal attention over the frame axis; returns (b*T, H, D, S)."""
    BT, H, D, S = q.shape
    T = num_frames
    assert BT % T == 0
    b = BT // T
    # lane blocks must be 128-multiples; the model's S values (81-smooth,
    # e.g. 5184 = 2^6*81) rarely divide one, so pad S and slice back. The
    # padded lanes compute garbage independently of the valid lanes (every
    # op in the kernel is lane-local) and are discarded.
    S_pad = -(-S // s_block) * s_block
    if S_pad != S:
        pad = ((0, 0), (0, 0), (0, 0), (0, S_pad - S))
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
    grid = (b, H, S_pad // s_block)
    spec = pl.BlockSpec(
        (T, 1, D, s_block),
        lambda bi, h, si: (bi, h, 0, si),
        memory_space=pltpu.VMEM,
    )
    out = pl.pallas_call(
        functools.partial(_kernel, T=T, scale=D**-0.5),
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[pltpu.VMEM((T, T, s_block), jnp.float32)],
        interpret=interpret,
    )(q, k, v)
    return out[..., :S] if S_pad != S else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def time_attention_bhds(
    q: jnp.ndarray,  # (b*T, H, D, S) — spatial in lanes
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_frames: int,
    s_block: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Temporal attention over the frame axis; returns (b*T, H, D, S).

    Differentiable: the forward runs the Pallas kernel; the backward
    recomputes the tiny per-position attentions as fp32 XLA einsums (the
    standard SDPA backward — T is ~21, so recompute is cheap and the kernel
    needs no bwd variant). Training paths (training/, SURVEY §beyond-ref)
    take grads through the UNet, which reaches this op when use_pallas=True."""
    return _kernel_call(q, k, v, num_frames, s_block, interpret)


def _fwd(q, k, v, num_frames, s_block, interpret):
    return _kernel_call(q, k, v, num_frames, s_block, interpret), (q, k, v)


def _bwd(num_frames, s_block, interpret, res, do):
    q, k, v = res
    BT, H, D, S = q.shape
    T = num_frames
    b = BT // T
    scale = D**-0.5

    def view(t):  # (b, T, H, D, S) fp32
        return t.reshape(b, T, H, D, S).astype(jnp.float32)

    qf, kf, vf, dof = view(q), view(k), view(v), view(do)
    s = jnp.einsum("bthds,buhds->bhtus", qf, kf) * scale
    p = jax.nn.softmax(s, axis=3)  # over the key-frame axis u
    dv = jnp.einsum("bhtus,bthds->buhds", p, dof)
    dp = jnp.einsum("bthds,buhds->bhtus", dof, vf)
    ds = p * (dp - jnp.sum(dp * p, axis=3, keepdims=True)) * scale
    dq = jnp.einsum("bhtus,buhds->bthds", ds, kf)
    dk = jnp.einsum("bhtus,bthds->buhds", ds, qf)

    def back(t):
        return t.reshape(BT, H, D, S).astype(q.dtype)

    return back(dq), back(dk), back(dv)


time_attention_bhds.defvjp(_fwd, _bwd)
