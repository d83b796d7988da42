"""The Seva multiview diffusion UNet, TPU-native.

Same computation graph capability as the reference torch model
(seva/model.py:39-216, seva/modules/layers.py, seva/modules/transformer.py),
re-designed for TPU:

  * NHWC layout everywhere (XLA's native conv layout on TPU),
  * bf16 matmul/conv path with fp32 GroupNorm/LayerNorm/softmax islands
    (the reference's GroupNorm32 + CUDA-autocast semantics,
    seva/modules/layers.py:61-63),
  * attention via a dispatching SDPA (einsum / online-softmax chunked /
    Pallas flash) instead of the pinned CUDA flash kernel
    (seva/modules/transformer.py:70-71),
  * align-corners bilinear FiLM resize as dense matrix contractions,
  * everything shape-static so the whole denoise step jits into one program.

Module names are chosen so the torch checkpoint maps 1:1
(models/convert.py); topology is generated from `SevaSpec` exactly as the
reference generates it from SevaParams (seva/model.py:54-174).

Input channel layout (last axis): [latent(4) | input-mask(1) | Plücker(6)] —
the SGMWrapper concat (seva/model.py:219-234) is `assemble_network_input`.
"""

from __future__ import annotations

import math
import os
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from stable_virtual_camera_tpu.config import SevaSpec
from stable_virtual_camera_tpu.models.common import (
    ConvParams,
    DenseParams,
    QuantSite,
)
from stable_virtual_camera_tpu.ops.attention import sdpa_packed
from stable_virtual_camera_tpu.ops.norms import group_norm_nhwc
from stable_virtual_camera_tpu.ops.quant import (
    W8A8_MODES,
    quant_mode,
    quantized_conv,
    quantized_conv_static,
    quantized_dense,
    quantized_dense_static,
    w8a8_enabled,
)
from stable_virtual_camera_tpu.ops.resize import (
    resize_bilinear_align_corners,
    upsample_2x_conv3x3,
)

Dtype = Any


class _ShapeOnly:
    """Activation stand-in carrying only `.shape`, used by the film_only
    topology walk (SevaUNet.__call__) to track block input shapes without
    computing anything."""

    __slots__ = ("shape",)

    def __init__(self, shape):
        self.shape = tuple(shape)


def quant_dense(n: int, name: str, *, dtype, param_dtype, use_bias: bool = True):
    """nn.Dense, or its W8A8 int8 equivalent under the same checkpoint naming
    (serving mode, ops/quant.py). Returns a callable; the quantized branch's
    DenseParams/QuantSite submodules bind to the caller's compact scope.

    Modes: "w8a8" quantizes both operands dynamically in the forward;
    "w8a8-static" consumes the prequantized kernel + calibrated activation
    scale from the "quant" collection; "w8a8-calib" runs the exact bf16
    matmul while the QuantSite records calibration state."""
    mode = quant_mode()
    if mode in W8A8_MODES:
        def apply(t):
            p = DenseParams(
                (t.shape[-1], n), use_bias=use_bias, param_dtype=param_dtype,
                name=name,
            )()
            b = p[1] if use_bias else None
            t_ = t.astype(dtype)
            if mode == "w8a8":
                return quantized_dense(
                    t_, p[0].astype(dtype), b, out_dtype=dtype
                )
            qs = QuantSite((0,), name=f"{name}_qsite")(p[0], t_)
            if qs is None:  # calibration: exact math, stats recorded
                y = t_ @ p[0].astype(dtype)
                return y if b is None else y + b.astype(dtype)
            return quantized_dense_static(t_, *qs, bias=b, out_dtype=dtype)

        return apply
    return nn.Dense(
        n, use_bias=use_bias, dtype=dtype, param_dtype=param_dtype, name=name
    )


def quant_conv(
    n: int, k: int, name: str, *, dtype, param_dtype,
    strides: tuple[int, int] = (1, 1),
):
    """SAME-padded k×k nn.Conv, or its W8A8 int8 equivalent under the same
    checkpoint naming (serving mode, ops/quant.py; modes as quant_dense)."""
    pad = [(k // 2, k // 2)] * 2
    mode = quant_mode()
    if mode in W8A8_MODES:
        def apply(t):
            w, b = ConvParams(
                (k, k, t.shape[-1], n), param_dtype=param_dtype, name=name
            )()
            t_ = t.astype(dtype)
            if mode == "w8a8":
                return quantized_conv(
                    t_, w.astype(dtype), b,
                    strides=strides, padding=pad, out_dtype=dtype,
                )
            qs = QuantSite((0, 1, 2), name=f"{name}_qsite")(w, t_)
            if qs is None:
                y = jax.lax.conv_general_dilated(
                    t_, w.astype(dtype), window_strides=strides,
                    padding=pad, dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
                return y + b.astype(dtype)
            return quantized_conv_static(
                t_, *qs, bias=b, strides=strides, padding=pad, out_dtype=dtype
            )

        return apply
    return nn.Conv(
        n, (k, k), strides=strides, padding=pad, dtype=dtype,
        param_dtype=param_dtype, name=name,
    )


def timestep_embedding(
    t: jnp.ndarray, dim: int, max_period: int = 10000
) -> jnp.ndarray:
    """Sinusoidal timestep embedding, fp32, [cos | sin] packing
    (reference seva/modules/layers.py:11-32)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


class _NormParams(nn.Module):
    """scale/bias parameters under nn.GroupNorm's checkpoint naming."""

    features: int
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self):
        scale = self.param(
            "scale", nn.initializers.ones, (self.features,), self.param_dtype
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), self.param_dtype
        )
        return scale, bias


class GroupNorm32(nn.Module):
    """GroupNorm computed in fp32, result cast back to the compute dtype —
    the GroupNorm32 numerics contract (reference seva/modules/layers.py:61-63).
    Statistics via the lane-preserving ops/norms.group_norm_nhwc (the flax
    strided-lane group reductions cost 174 ms/fwd at 1.3B scale,
    docs/ARCHITECTURE.md round-2 journal)."""

    param_dtype: Dtype = jnp.float32
    eps: float = 1e-5
    groups: int = 32

    @nn.compact
    def __call__(self, x):
        scale, bias = _NormParams(
            x.shape[-1], param_dtype=self.param_dtype, name="gn"
        )()
        return group_norm_nhwc(x, scale, bias, self.groups, self.eps)


class LayerNorm32(nn.Module):
    """LayerNorm with fp32 statistics (single-pass, ops/norms.layer_norm_fp32)
    under flax nn.LayerNorm's checkpoint naming. Bench-neutral vs the flax
    two-pass form (round-3 journal) but one reduction pass instead of two."""

    param_dtype: Dtype = jnp.float32
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        from stable_virtual_camera_tpu.ops.norms import layer_norm_fp32

        scale, bias = _NormParams(
            x.shape[-1], param_dtype=self.param_dtype, name="ln"
        )()
        return layer_norm_fp32(x, scale, bias, self.eps)


class Attention(nn.Module):
    """Multi-head attention with fp32-softmax SDPA dispatch
    (reference seva/modules/transformer.py:37-74)."""

    heads: int
    dim_head: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    use_pallas: bool = False
    # ring-attention context (parallel/ring_attention.py): when set, joint
    # self-attention stays view-sharded and rotates K/V over ICI instead of
    # the GSPMD all-gather — the large-T multi-chip regime (SURVEY.md §5.7)
    ring_mesh: Any = None
    ring_axis: str | None = None

    @nn.compact
    def __call__(self, x, context=None, time_frames: int | None = None):
        inner = self.heads * self.dim_head
        query_dim = x.shape[-1]

        dense = lambda n, name, bias: quant_dense(  # noqa: E731
            n, name, dtype=self.dtype, param_dtype=self.param_dtype,
            use_bias=bias,
        )
        if time_frames is not None:
            # Temporal self-attention WITHOUT the (b*T,S,C)->(b*S,T,C)
            # transpose (reference transformer.py:149,154). Two backends:
            #  * Pallas lane-batched kernel (ops/time_attention.py): the
            #    b*S*H tiny 21x21 attentions batch over the VPU lane axis,
            #    scores stay in VMEM. 6.8 vs 13.2 ms/layer at ds1 measured
            #    (benchmark/timemix_probe.py, round 3).
            #  * batched einsum over the 5-D view (CPU/parity fallback).
            B, S, C = x.shape
            b = B // time_frames
            # SVC_TIME_PALLAS: auto (default, TPU backends only) | 1 (force,
            # e.g. interpret-mode tests) | 0 (einsum fallback for A/B).
            # T cap: the kernel's VMEM scratch/tiles scale with T and T^2
            # (unrolled frame loops, (T,T,s_block) score scratch) — beyond
            # ~32 frames (the semi-dense large-T regime grows T to 96,
            # docs/CLI_USAGE.md) the einsum path is the safe choice.
            tp_mode = os.environ.get("SVC_TIME_PALLAS", "auto")
            if (
                self.use_pallas
                and time_frames <= 32
                and (
                    tp_mode == "1"
                    or (
                        tp_mode == "auto"
                        and jax.default_backend() in ("tpu", "axon")
                    )
                )
            ):
                from stable_virtual_camera_tpu.ops.time_attention import (
                    pick_s_block,
                    time_attention_bhds,
                )

                (w_qkv,) = DenseParams(
                    (C, 3 * inner),
                    use_bias=False,
                    param_dtype=self.param_dtype,
                    name="qkv",
                )()
                w3 = w_qkv.astype(self.dtype).reshape(
                    C, 3, self.heads, self.dim_head
                )
                xq = x.astype(self.dtype)
                # pad x ONCE to the kernel's lane-block multiple (vs padding
                # q/k/v separately: three 139 MB pad copies per layer at ds1);
                # the padded rows ride the projections/kernel/to_out as
                # lane-local garbage and are sliced off at the end
                sb = pick_s_block(S, T=time_frames)
                S_pad = -(-S // sb) * sb
                if S_pad != S:
                    xq = jnp.pad(xq, ((0, 0), (0, S_pad - S), (0, 0)))
                # projections write the kernel's (B, H, D, S) lane-major
                # layout straight from the GEMM epilogue; to_out consumes it
                # the same way (zero transpose ops around the kernel, same
                # trick as the flash path below)
                q = jnp.einsum("bsc,chd->bhds", xq, w3[:, 0])
                k = jnp.einsum("bsc,chd->bhds", xq, w3[:, 1])
                v = jnp.einsum("bsc,chd->bhds", xq, w3[:, 2])
                o = time_attention_bhds(q, k, v, time_frames, s_block=sb)
                w_out, b_out = DenseParams(
                    (inner, query_dim),
                    use_bias=True,
                    param_dtype=self.param_dtype,
                    name="to_out",
                )()
                out = (
                    jnp.einsum(
                        "bhds,hdc->bsc",
                        o,
                        w_out.astype(self.dtype).reshape(
                            self.heads, self.dim_head, query_dim
                        ),
                    )
                    + b_out.astype(self.dtype)
                )
                return out[:, :S] if S_pad != S else out
            qkv = dense(3 * inner, "qkv", False)(x)
            q, k, v = jnp.split(qkv, 3, axis=-1)

            def heads_view(t):  # (b*T, S, inner) -> (b, T, S, H, D)
                return t.reshape(b, time_frames, S, self.heads, self.dim_head)

            q, k, v = heads_view(q), heads_view(k), heads_view(v)
            s = jnp.einsum(
                "bqshd,bkshd->bshqk", q, k, preferred_element_type=jnp.float32
            ) * (self.dim_head**-0.5)
            p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
            o = jnp.einsum("bshqk,bkshd->bqshd", p, v)
            o = o.reshape(B, S, inner)
            return dense(query_dim, "to_out", True)(o)
        if context is not None and context.shape[1] == 1:
            # Cross-attention over a SINGLE context token (this model's only
            # cross-attention shape: one pooled CLIP embedding per frame,
            # reference seva/eval.py:1248). softmax over one key is exactly 1,
            # so the output is to_out(to_v(context)) independent of q — the
            # q/k projections and the whole score pipeline are dead math.
            v = dense(inner, "to_v", False)(context)  # (B, 1, inner)
            out = dense(query_dim, "to_out", True)(v)
            return jnp.broadcast_to(out, x.shape[:-1] + (query_dim,))
        L = x.shape[1]
        if context is None and self.ring_axis is None and self.use_pallas:
            if (
                os.environ.get("SVC_UPSTREAM_FLASH", "1") == "1"
                and self.dim_head == 64
                and L >= 1024
            ):
                # Layout-fused path for the upstream flash kernel: the qkv
                # projection writes the kernel's native (B, H, L, D) layout
                # straight from the GEMM epilogue (einsum 'blc,chd->bhld'),
                # and to_out consumes (B, H, L, D) the same way — zero
                # transpose ops around the kernel. Same params/naming as the
                # Dense path (kernel (C, 3*inner), out (inner, C) + bias).
                from stable_virtual_camera_tpu.ops.flash_upstream import (
                    flash_attention_upstream_bhld,
                )

                (w_qkv,) = DenseParams(
                    (x.shape[-1], 3 * inner),
                    use_bias=False,
                    param_dtype=self.param_dtype,
                    name="qkv",
                )()
                w3 = w_qkv.astype(self.dtype).reshape(
                    x.shape[-1], 3, self.heads, self.dim_head
                )
                xq = x.astype(self.dtype)
                mode = quant_mode()
                site_qkv = (
                    QuantSite((0,), name="qkv_qsite")(w_qkv, xq)
                    if mode in ("w8a8-static", "w8a8-calib")
                    else None
                )
                if mode == "w8a8" or site_qkv is not None:
                    # int8 projection, then one explicit (B,L,3,H,D) ->
                    # (3,B,H,L,D) layout copy into the kernel's layout (the
                    # bf16 path gets it free from the GEMM epilogue; int8
                    # MXU output is (rows, cols) so the copy is real, ~0.5 ms
                    # at ds1 against the 2x matmul-rate win).
                    B_, L_, C_ = xq.shape
                    if site_qkv is not None:
                        qkv = quantized_dense_static(
                            xq, *site_qkv, out_dtype=self.dtype
                        )
                    else:
                        qkv = quantized_dense(
                            xq, w_qkv.astype(self.dtype), out_dtype=self.dtype
                        )
                    qkv = qkv.reshape(
                        B_, L_, 3, self.heads, self.dim_head
                    ).transpose(2, 0, 3, 1, 4)
                    q, k, v = qkv[0], qkv[1], qkv[2]
                else:
                    q = jnp.einsum("blc,chd->bhld", xq, w3[:, 0])
                    k = jnp.einsum("blc,chd->bhld", xq, w3[:, 1])
                    v = jnp.einsum("blc,chd->bhld", xq, w3[:, 2])
                # Single kernel family: the tuned upstream flash kernel won
                # every hot shape; a hand software-pipelined alternative
                # (flash_v2) measured slower everywhere and was removed
                # (round-3/4 journal, "flash_v2 ... NEGATIVE" closure).
                o = flash_attention_upstream_bhld(q, k, v)  # (B, H, L, D)
                w_out, b_out = DenseParams(
                    (inner, query_dim),
                    use_bias=True,
                    param_dtype=self.param_dtype,
                    name="to_out",
                )()
                if mode in ("w8a8-static", "w8a8-calib"):
                    o2 = o.transpose(0, 2, 1, 3).reshape(
                        o.shape[0], o.shape[2], inner
                    )
                    site_out = QuantSite((0,), name="to_out_qsite")(w_out, o2)
                    if site_out is not None:
                        return quantized_dense_static(
                            o2, *site_out, bias=b_out, out_dtype=self.dtype
                        )
                    # calibration: exact matmul on the same operands
                    return o2 @ w_out.astype(self.dtype) + b_out.astype(
                        self.dtype
                    )
                if mode == "w8a8":
                    o2 = o.transpose(0, 2, 1, 3).reshape(
                        o.shape[0], o.shape[2], inner
                    )
                    return quantized_dense(
                        o2,
                        w_out.astype(self.dtype),
                        b_out,
                        out_dtype=self.dtype,
                    )
                return (
                    jnp.einsum(
                        "bhld,hdc->blc",
                        o,
                        w_out.astype(self.dtype).reshape(
                            self.heads, self.dim_head, query_dim
                        ),
                    )
                    + b_out.astype(self.dtype)
                )
        if context is None:
            # Self-attention: fused qkv projection (wider-N matmuls).
            qkv = dense(3 * inner, "qkv", False)(x)
            q, k, v = jnp.split(qkv, 3, axis=-1)
        else:
            q = dense(inner, "to_q", False)(x)
            k = dense(inner, "to_k", False)(context)
            v = dense(inner, "to_v", False)(context)
        if self.ring_axis is not None and context is None:
            from stable_virtual_camera_tpu.parallel.ring_attention import (
                ring_sdpa_packed,
            )

            out = ring_sdpa_packed(
                q, k, v, self.heads, self.ring_mesh, self.ring_axis
            )
        else:
            # packed (B, L, heads*64) layout end-to-end
            out = sdpa_packed(q, k, v, self.heads, use_pallas=self.use_pallas)
        return dense(query_dim, "to_out", True)(out)


class FeedForward(nn.Module):
    """GEGLU MLP (reference seva/modules/transformer.py:8-34)."""

    dim_out: int | None = None
    mult: int = 4
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        inner = int(x.shape[-1] * self.mult)
        dim_out = self.dim_out or x.shape[-1]

        # the GEGLU feed-forwards are the model's largest matmul family
        # (~23 TFLOP/fwd, docs/ARCHITECTURE.md HLO census) — the main
        # beneficiary of the W8A8 int8 MXU rate
        dense = lambda n, name: quant_dense(  # noqa: E731
            n, name, dtype=self.dtype, param_dtype=self.param_dtype
        )
        h = dense(inner * 2, "proj_gate")(x)
        val, gate = jnp.split(h, 2, axis=-1)
        # GELU precision policy (round-3 journal): the erf GELU costs a
        # measured 4.4 s of the 50-step denoise on a v5e chip (45.5 -> 41.1 s
        # with the erf stubbed out), and computing it in bf16 doesn't help —
        # XLA upcasts the transcendental internally either way. The tanh
        # approximation recovers the whole cost (41.24 s measured) and
        # deviates from erf-GELU by <= 4.7e-4 absolute — within one bf16 ulp
        # of the exact value everywhere — so it is invisible at the bf16
        # compute precision this model runs at. fp32 models (all CPU parity
        # tests vs the torch oracle) keep the exact erf form.
        # SVC_GELU_MODE overrides: auto (default) | exact | tanh | linear
        # (linear = TIMING DIAGNOSTIC ONLY, wrong math).
        mode = os.environ.get("SVC_GELU_MODE", "auto")
        if mode == "auto":
            mode = "tanh" if self.dtype == jnp.bfloat16 else "exact"
        if mode == "linear":
            g = gate
        else:
            g = nn.gelu(gate, approximate=(mode == "tanh"))
        h = val * g
        return dense(dim_out, "proj_out")(h)


class TransformerBlock(nn.Module):
    """Pre-LN self-attn + cross-attn + GEGLU FF
    (reference seva/modules/transformer.py:77-110)."""

    heads: int
    dim_head: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    use_pallas: bool = False
    ring_mesh: Any = None
    ring_axis: str | None = None

    @nn.compact
    def __call__(self, x, context):
        kw = dict(
            heads=self.heads,
            dim_head=self.dim_head,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            use_pallas=self.use_pallas,
        )
        ln = lambda name: LayerNorm32(param_dtype=self.param_dtype, name=name)  # noqa: E731
        x = Attention(
            **kw, ring_mesh=self.ring_mesh, ring_axis=self.ring_axis, name="attn1"
        )(ln("norm1")(x)) + x
        x = Attention(**kw, name="attn2")(ln("norm2")(x), context) + x
        x = FeedForward(dtype=self.dtype, param_dtype=self.param_dtype, name="ff")(
            ln("norm3")(x)
        ) + x
        return x


class TransformerBlockTimeMix(nn.Module):
    """Temporal attention: each spatial location attends across the T frames
    (reference seva/modules/transformer.py:113-155). Note the final FF has no
    residual, matching the reference."""

    heads: int
    dim_head: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, time_context, num_frames: int):
        """`time_context` is the per-frame-group CLIP token, (b, 1, ctx) —
        NOT tiled per spatial location. Since single-token cross-attention is
        exactly to_out(to_v(context)) (see Attention), we compute it once per
        group and broadcast over the (b*S) rows, instead of the reference's
        h*w-times-repeated context (seva/modules/transformer.py:222-226) —
        identical math, h*w-fold fewer projection rows."""
        B, S, C = x.shape
        b = B // num_frames
        inner = self.heads * self.dim_head
        kw = dict(
            heads=self.heads,
            dim_head=self.dim_head,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            use_pallas=self.use_pallas,
        )
        ln = lambda name: LayerNorm32(param_dtype=self.param_dtype, name=name)  # noqa: E731
        ff = lambda name, dim_out: FeedForward(  # noqa: E731
            dim_out=dim_out, dtype=self.dtype, param_dtype=self.param_dtype, name=name
        )

        # All per-token ops (LN over C, FFs, projections) are layout-agnostic,
        # so x STAYS in (b*T, S, C) — the reference's (b*S, T, C) transposes
        # (transformer.py:149,154) never materialize. Only the temporal
        # self-attention needs the T axis: Attention(time_frames=...) contracts
        # over T with a batched einsum on the 5-D view.
        x = ff("ff_in", inner)(ln("norm_in")(x)) + x
        x = Attention(**kw, name="attn1")(
            ln("norm1")(x), time_frames=num_frames
        ) + x
        # cross-attention: evaluate on one row per group, broadcast to all
        # (T, S) tokens. norm2 params are created (checkpoint parity) but its
        # output is unused — single-token cross-attn doesn't depend on x.
        ln("norm2")(jnp.zeros((1, 1, inner), x.dtype))
        cross = Attention(**kw, name="attn2")(
            jnp.zeros((b, 1, inner), x.dtype), time_context
        )  # (b, 1, C)
        x = x + jnp.broadcast_to(
            cross[:, None], (b, num_frames, 1, C)
        ).reshape(B, 1, C)
        x = ff("ff", C)(ln("norm3")(x))  # no residual (reference line 153)
        return x


class MultiviewTransformer(nn.Module):
    """The 3D attention block (reference seva/modules/transformer.py:168-247).

    For `unflatten=True` layers the spatial self-attention is computed over
    the fused (T*h*w)-token multiview sequence; otherwise per-frame. Each
    depth pairs a spatial block with a time-mix block merged by residual add.
    """

    heads: int
    dim_head: int
    depth: int
    unflatten: bool
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    use_pallas: bool = False
    ring_mesh: Any = None
    ring_axis: str | None = None

    @nn.compact
    def __call__(self, x, context, num_frames: int):
        B, h, w, C = x.shape
        b = B // num_frames
        inner = self.heads * self.dim_head
        x_in = x

        # CLIP context of frame 0 per group; the reference tiles it per
        # spatial location (transformer.py:222-226) but the time-mix consumes
        # it through the exact single-token shortcut, so one row per group
        # suffices (see TransformerBlockTimeMix)
        time_context = context[::num_frames]
        ctx = context[::num_frames] if self.unflatten else context

        dense = lambda n, name: quant_dense(  # noqa: E731
            n, name, dtype=self.dtype, param_dtype=self.param_dtype
        )
        y = GroupNorm32(param_dtype=self.param_dtype, eps=1e-6, name="norm")(x)
        y = y.reshape(B, h * w, C)
        y = dense(inner, "proj_in")(y)

        for d in range(self.depth):
            if self.unflatten:
                y = y.reshape(b, num_frames * h * w, inner)
            y = TransformerBlock(
                heads=self.heads,
                dim_head=self.dim_head,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                use_pallas=self.use_pallas,
                # ring attention only applies to the fused multiview sequence
                ring_mesh=self.ring_mesh if self.unflatten else None,
                ring_axis=self.ring_axis if self.unflatten else None,
                name=f"spatial_{d}",
            )(y, ctx)
            if self.unflatten:
                y = y.reshape(B, h * w, inner)
            y_mix = TransformerBlockTimeMix(
                heads=self.heads,
                dim_head=self.dim_head,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                use_pallas=self.use_pallas,
                name=f"temporal_{d}",
            )(y, time_context, num_frames)
            y = y + y_mix

        y = dense(C, "proj_out")(y)
        return x_in + y.reshape(B, h, w, C)


class ResBlock(nn.Module):
    """Residual block with scalar time-embedding AND dense Plücker FiLM
    conditioning (reference seva/modules/layers.py:86-139).

    The FiLM tensor (resize + dense_proj of the Plücker map) depends only on
    per-chunk conditioning, never on x or the sigma step — `film_only=True`
    computes and returns just that tensor (for a once-per-chunk precompute
    hoisted out of the 50-step sampling scan; see sampler.make_film_network),
    and `film=` consumes a precomputed one instead of recomputing it. When
    the cache has half x's batch (the CFG halves share one Plücker map,
    ChunkConditioning contract), it broadcasts over the doubled batch."""

    out_channels: int | None = None
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb, dense_emb, film=None, film_only=False):
        C = x.shape[-1]
        out_ch = self.out_channels or C
        conv = lambda n, k, name: nn.Conv(  # noqa: E731
            n,
            (k, k),
            padding=[(k // 2, k // 2)] * 2,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name=name,
        )

        if film_only:
            # Dense spatial FiLM: Plücker map resized (align-corners
            # bilinear) to this resolution, 1x1-projected to scale/shift
            # (reference seva/modules/layers.py:125-131). Same ops as the
            # inline path below, so the cached tensor is bit-identical.
            dense = resize_bilinear_align_corners(
                dense_emb, (x.shape[1], x.shape[2])
            )
            return conv(2 * C, 1, "dense_proj")(dense)

        # Serving W8A8 for the compute convs. dense_proj stays on the exact
        # `conv` below — its contraction depth is 6 (the Plücker channels),
        # so it is bandwidth-bound and int8 would add error for no win.
        qconv = lambda n, k, name: quant_conv(  # noqa: E731
            n, k, name, dtype=self.dtype, param_dtype=self.param_dtype
        )

        h = nn.silu(GroupNorm32(param_dtype=self.param_dtype, name="in_gn")(x))
        if film is None:
            dense = resize_bilinear_align_corners(
                dense_emb, (x.shape[1], x.shape[2])
            )
            dense = conv(2 * C, 1, "dense_proj")(dense).astype(h.dtype)
        else:
            dense = film.astype(h.dtype)
        dense_scale, dense_shift = jnp.split(dense, 2, axis=-1)
        if dense.shape[0] != h.shape[0]:
            # (T, ...) cache under a CFG-doubled (2T, ...) batch: reshape so
            # the cache broadcasts — elementwise-identical to a tiled apply.
            rep = h.shape[0] // dense.shape[0]
            hr = h.reshape(rep, dense.shape[0], *h.shape[1:])
            h = (hr * (1 + dense_scale) + dense_shift).reshape(h.shape)
        else:
            h = h * (1 + dense_scale) + dense_shift
        h = qconv(out_ch, 3, "in_conv")(h)

        e = nn.Dense(
            out_ch, dtype=self.dtype, param_dtype=self.param_dtype, name="emb_proj"
        )(nn.silu(emb.astype(jnp.float32)).astype(h.dtype))
        h = h + e[:, None, None, :]

        h = nn.silu(GroupNorm32(param_dtype=self.param_dtype, name="out_gn")(h))
        h = qconv(out_ch, 3, "out_conv")(h)

        skip = x if out_ch == C else qconv(out_ch, 1, "skip")(x)
        return skip + h


class Downsample(nn.Module):
    """Stride-2 3x3 conv (reference seva/modules/layers.py:49-58)."""

    channels: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return quant_conv(
            self.channels, 3, "conv", dtype=self.dtype,
            param_dtype=self.param_dtype, strides=(2, 2),
        )(x)


class Upsample(nn.Module):
    """Nearest-2x + 3x3 conv (reference seva/modules/layers.py:35-46),
    computed as a low-res conv with 4x-wide output + pixel shuffle
    (ops/resize.upsample_2x_conv3x3) — same math, no broadcast copy, full
    MXU lane width."""

    channels: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from stable_virtual_camera_tpu.models.common import ConvParams

        kernel, bias = ConvParams(
            (3, 3, x.shape[-1], self.channels),
            param_dtype=self.param_dtype,
            name="conv",
        )()
        mode = quant_mode()
        return upsample_2x_conv3x3(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            bias,
            # UNet upsamples join the W8A8 conv family; the VAE's calls keep
            # the default exact path (models/vae.py). The static site
            # quantizes the REARRANGED kernel (built inside the op), so it
            # is created here and invoked there.
            quant=w8a8_enabled(),
            static_site=(
                QuantSite((0, 1, 2), name="conv_qsite")
                if mode in ("w8a8-static", "w8a8-calib")
                else None
            ),
        )


class SevaUNet(nn.Module):
    """The full denoiser UNet (reference seva/model.py:39-216), NHWC.

    Call:
      x:          (B, h, w, 11)  noisy latent ++ mask ++ Plücker, B = b * T
      t_idx:      (B,)           discrete timestep indices
      context:    (B, 1, ctx)    per-frame CLIP embedding (crossattn)
      dense_emb:  (B, h, w, 6)   Plücker map (FiLM conditioning)
      num_frames: static T
    Returns (B, h, w, 4) predicted noise/v (ε-parameterization).
    """

    spec: SevaSpec
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    use_pallas: bool = False
    # view-sharded ring attention for the joint t*h*w layers (multi-chip)
    ring_mesh: Any = None
    ring_axis: str | None = None

    @nn.compact
    def __call__(
        self,
        x,
        t_idx,
        context,
        dense_emb,
        num_frames: int,
        film: dict | None = None,
        film_only: bool = False,
    ):
        sp = self.spec
        mc = sp.model_channels
        dense_emb = dense_emb.astype(self.dtype)
        if film_only:
            # Per-chunk FiLM precompute: walk the SAME topology loop below,
            # but only shape-track activations (`_ShapeOnly`) and run each
            # ResBlock's dense-FiLM branch, returning {block_name: tensor}.
            # x/t_idx/context are unused; batch/resolution come from
            # dense_emb. Sharing one walk guarantees the cache keys/shapes
            # match the real forward structurally.
            films: dict = {}
            x = _ShapeOnly(dense_emb.shape)
            temb = None
        else:
            x = x.astype(self.dtype)
            context = context.astype(self.dtype)

        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        dense = lambda n, name: nn.Dense(n, name=name, **kw)  # noqa: E731
        conv3 = lambda n, name: nn.Conv(  # noqa: E731
            n, (3, 3), padding=[(1, 1), (1, 1)], name=name, **kw
        )

        def res(out_ch, name, h):
            blk = ResBlock(out_ch, name=name, **kw)
            if film_only:
                films[name] = blk(h, None, dense_emb, film_only=True)
                return _ShapeOnly((*h.shape[:-1], out_ch or h.shape[-1]))
            return blk(
                h, temb, dense_emb, film=None if film is None else film[name]
            )

        def cat_skip(h, skip):
            if film_only:
                return _ShapeOnly((*h.shape[:-1], h.shape[-1] + skip.shape[-1]))
            return jnp.concatenate([h, skip], axis=-1)

        def mvt(ch: int, level_name: str, name: str):
            return MultiviewTransformer(
                heads=ch // sp.num_head_channels,
                dim_head=sp.num_head_channels,
                depth=sp.transformer_depth[min(level_name_to_level[level_name], len(sp.transformer_depth) - 1)],
                unflatten=level_name in sp.unflatten_names,
                use_pallas=self.use_pallas,
                ring_mesh=self.ring_mesh,
                ring_axis=self.ring_axis,
                name=name,
                **kw,
            )

        if not film_only:
            # time embedding (reference seva/model.py:47-52, 185-186)
            temb = timestep_embedding(t_idx, mc)
            temb = dense(4 * mc, "time_embed_0")(temb.astype(self.dtype))
            temb = dense(4 * mc, "time_embed_2")(
                nn.silu(temb.astype(jnp.float32)).astype(self.dtype)
            )

        level_name_to_level: dict[str, int] = {}
        for level in range(len(sp.channel_mult)):
            ds = 2**level
            level_name_to_level[f"input_ds{ds}"] = level
            level_name_to_level[f"output_ds{ds}"] = level
            level_name_to_level[f"middle_ds{ds}"] = len(sp.channel_mult) - 1

        # ---- encoder (reference seva/model.py:54-102, 190-198) ----
        hs = []
        if film_only:
            h = _ShapeOnly((*x.shape[:-1], mc))
        else:
            h = conv3(mc, "input_blocks_0_0")(x)
        hs.append(h)
        ch, ds, block_idx = mc, 1, 1
        for level, mult in enumerate(sp.channel_mult):
            for _ in range(sp.num_res_blocks):
                h = res(mult * mc, f"input_blocks_{block_idx}_0", h)
                ch = mult * mc
                if ds in sp.attention_resolutions and not film_only:
                    h = mvt(ch, f"input_ds{ds}", f"input_blocks_{block_idx}_1")(
                        h, context, num_frames
                    )
                hs.append(h)
                block_idx += 1
            if level != len(sp.channel_mult) - 1:
                if film_only:
                    b_, hh, ww, _ = h.shape  # SAME-pad stride-2: ceil(n/2)
                    h = _ShapeOnly((b_, (hh + 1) // 2, (ww + 1) // 2, ch))
                else:
                    h = Downsample(ch, name=f"input_blocks_{block_idx}_0", **kw)(h)
                ds *= 2
                hs.append(h)
                block_idx += 1

        # ---- middle (reference seva/model.py:107-131) ----
        h = res(None, "middle_block_0", h)
        if not film_only:
            h = mvt(ch, f"middle_ds{ds}", "middle_block_1")(h, context, num_frames)
        h = res(None, "middle_block_2", h)

        # ---- decoder with skip concats (reference seva/model.py:134-168, 206-214) ----
        block_idx = 0
        for level, mult in list(enumerate(sp.channel_mult))[::-1]:
            for i in range(sp.num_res_blocks + 1):
                skip = hs.pop()
                h = cat_skip(h, skip)
                h = res(mult * mc, f"output_blocks_{block_idx}_0", h)
                ch = mult * mc
                layer_idx = 1
                if ds in sp.attention_resolutions:
                    if not film_only:
                        h = mvt(ch, f"output_ds{ds}", f"output_blocks_{block_idx}_{layer_idx}")(
                            h, context, num_frames
                        )
                    layer_idx += 1
                if level and i == sp.num_res_blocks:
                    if film_only:
                        b_, hh, ww, _ = h.shape
                        h = _ShapeOnly((b_, 2 * hh, 2 * ww, ch))
                    else:
                        h = Upsample(ch, name=f"output_blocks_{block_idx}_{layer_idx}", **kw)(h)
                    ds //= 2
                block_idx += 1

        if film_only:
            return films

        # ---- head (reference seva/model.py:170-174) ----
        h = nn.silu(GroupNorm32(param_dtype=self.param_dtype, name="out_gn")(h))
        return conv3(sp.out_channels, "out_conv")(h).astype(jnp.float32)


def assemble_network_input(
    latents: jnp.ndarray, concat: jnp.ndarray
) -> jnp.ndarray:
    """Concatenate the 7 conditioning channels (mask ++ Plücker) onto the 4
    noisy latent channels — the SGMWrapper role (reference seva/model.py:219-234),
    NHWC."""
    return jnp.concatenate([latents, concat.astype(latents.dtype)], axis=-1)
