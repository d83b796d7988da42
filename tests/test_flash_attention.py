"""Pallas flash-attention kernel vs plain einsum attention (interpret mode on
CPU; the compiled path runs on TPU in bench)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stable_virtual_camera_tpu.ops.attention import attention_chunked, attention_xla
from stable_virtual_camera_tpu.ops import flash_attention as fa


@pytest.mark.parametrize("B,L,H,D", [(2, 1296, 3, 64), (1, 1500, 2, 64)])
def test_flash_matches_xla_interpret(B, L, H, D):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, L, H, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, L, H, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, L, H, D)).astype(np.float32))
    ref = attention_xla(q, k, v)
    out = fa.flash_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_chunked_matches_xla():
    rng = np.random.default_rng(1)
    B, L, H, D = 2, 2100, 2, 64
    q = jnp.asarray(rng.normal(size=(B, L, H, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, L, H, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, L, H, D)).astype(np.float32))
    ref = attention_xla(q, k, v)
    out = attention_chunked(q, k, v, kv_chunk=512)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("B,L,H", [(2, 1701, 4), (1, 1200, 2)])
def test_flash_packed_matches_xla_interpret(B, L, H):
    """Head-packed kernel on (B, L, H*64) == einsum attention (no layout ops)."""
    from stable_virtual_camera_tpu.ops import flash_attention_packed as fap

    rng = np.random.default_rng(0)
    W = H * 64
    q = jnp.asarray(rng.normal(size=(B, L, W)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, L, W)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, L, W)).astype(np.float32))
    ref = attention_xla(
        q.reshape(B, L, H, 64), k.reshape(B, L, H, 64), v.reshape(B, L, H, 64)
    ).reshape(B, L, W)
    out = fap.flash_attention_packed(q, k, v, H, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_packed_supported_predicate():
    from stable_virtual_camera_tpu.ops import flash_attention_packed as fap

    ok = jnp.zeros((2, 2048, 640), jnp.bfloat16)
    assert fap.supported(ok, ok, 10)
    # W % 128 != 0 (odd head count) falls back to the (B,L,H,D) path
    odd = jnp.zeros((2, 2048, 320), jnp.bfloat16)
    assert not fap.supported(odd, odd, 5)
    # short sequences stay on einsum
    short = jnp.zeros((2, 512, 640), jnp.bfloat16)
    assert not fap.supported(short, short, 10)


def test_supported_predicate():
    q = jnp.zeros((2, 2048, 4, 64), jnp.bfloat16)
    assert fa.supported(q, q, q)
    assert not fa.supported(
        jnp.zeros((2, 512, 4, 64)), jnp.zeros((2, 512, 4, 64)), jnp.zeros((2, 512, 4, 64))
    )
    # cross-attention (S != L) unsupported
    assert not fa.supported(
        jnp.zeros((2, 2048, 4, 64)), jnp.zeros((2, 1, 4, 64)), jnp.zeros((2, 1, 4, 64))
    )


def test_align_corners_resize_matches_torch():
    """ops/resize align-corners bilinear == torch F.interpolate(align_corners=True)
    (the ResBlock FiLM path, reference seva/modules/layers.py:126-128)."""
    import torch
    import torch.nn.functional as F

    from stable_virtual_camera_tpu.ops.resize import resize_bilinear_align_corners

    rng = np.random.default_rng(0)
    for (hin, win), (hout, wout) in [((72, 72), (36, 36)), ((72, 72), (9, 9)),
                                     ((6, 6), (72, 72)), ((5, 7), (13, 3))]:
        x = rng.normal(size=(2, hin, win, 6)).astype(np.float32)
        ours = np.asarray(resize_bilinear_align_corners(jnp.asarray(x), (hout, wout)))
        theirs = (
            F.interpolate(
                torch.from_numpy(np.moveaxis(x, -1, 1)),
                size=(hout, wout),
                mode="bilinear",
                align_corners=True,
            )
            .numpy()
        )
        np.testing.assert_allclose(ours, np.moveaxis(theirs, 1, -1), atol=1e-4)


def test_upsample_nearest_matches_torch():
    import torch
    import torch.nn.functional as F

    from stable_virtual_camera_tpu.ops.resize import upsample_nearest_2x

    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 9, 9, 4)).astype(np.float32)
    ours = np.asarray(upsample_nearest_2x(jnp.asarray(x)))
    theirs = F.interpolate(
        torch.from_numpy(np.moveaxis(x, -1, 1)), scale_factor=2, mode="nearest"
    ).numpy()
    np.testing.assert_allclose(ours, np.moveaxis(theirs, 1, -1))


def test_flash_trainable_grads_match_xla():
    """custom_vjp flash attention: forward == kernel, backward (recompute via
    the chunked scan) == grads of plain einsum attention."""
    from jax.experimental.pallas import tpu as pltpu

    from stable_virtual_camera_tpu.ops.attention import (
        flash_attention_trainable,
    )

    rng = np.random.default_rng(3)
    B, L, H, D = 1, 1280, 2, 64
    q = jnp.asarray(rng.normal(size=(B, L, H, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, L, H, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, L, H, D)).astype(np.float32))
    cot = jnp.asarray(rng.normal(size=(B, L, H, D)).astype(np.float32))

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention_trainable(q, k, v) * cot)

    def loss_xla(q, k, v):
        return jnp.sum(attention_xla(q, k, v) * cot)

    with pltpu.force_tpu_interpret_mode():
        gq, gk, gv = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    rq, rk, rv = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for g, r, name in ((gq, rq, "dq"), (gk, rk, "dk"), (gv, rv, "dv")):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), atol=5e-4, rtol=1e-3, err_msg=name
        )


def test_time_attention_kernel_matches_einsum():
    """ops/time_attention.time_attention_bhds (interpret mode) == the batched
    einsum temporal attention, including the S lane-padding path (S=81)."""
    from stable_virtual_camera_tpu.ops.time_attention import time_attention_bhds

    rng = np.random.default_rng(7)
    for b, T, S, H, D, s_block in [(2, 21, 81, 2, 64, 128), (1, 5, 256, 3, 16, 128)]:
        q, k, v = (
            jnp.asarray(rng.normal(size=(b * T, H, D, S)).astype(np.float32))
            for _ in range(3)
        )
        out = time_attention_bhds(q, k, v, T, s_block=s_block, interpret=True)
        qh = q.transpose(0, 3, 1, 2).reshape(b, T, S, H, D)
        kh = k.transpose(0, 3, 1, 2).reshape(b, T, S, H, D)
        vh = v.transpose(0, 3, 1, 2).reshape(b, T, S, H, D)
        s = jnp.einsum("bqshd,bkshd->bshqk", qh, kh) * (D**-0.5)
        p = jax.nn.softmax(s, -1)
        ref = (
            jnp.einsum("bshqk,bkshd->bqshd", p, vh)
            .reshape(b * T, S, H, D)
            .transpose(0, 2, 3, 1)
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=5e-5, rtol=1e-4
        )


def test_flash_model_dispatch_matches_einsum():
    """Attention's layout-fused upstream flash path (interpret mode) == the
    plain einsum path at the same params: proves the kernel dispatch wiring
    end-to-end through the module."""
    from jax.experimental.pallas import tpu as pltpu

    from stable_virtual_camera_tpu.models.unet import Attention

    rng = np.random.default_rng(17)
    B, L, C = 2, 1296, 128
    x = jnp.asarray(rng.normal(size=(B, L, C)).astype(np.float32) * 0.3)
    att_ref = Attention(heads=2, dim_head=64, use_pallas=False)
    att_pl = Attention(heads=2, dim_head=64, use_pallas=True)
    params = att_ref.init(jax.random.PRNGKey(0), x)["params"]
    ref = att_ref.apply({"params": params}, x)
    with pltpu.force_tpu_interpret_mode():
        out = att_pl.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3, rtol=2e-2)


def test_time_attention_grads_match_einsum():
    """time_attention_bhds's custom VJP (einsum-recompute backward) ==
    autodiff through the reference einsum formulation."""
    from stable_virtual_camera_tpu.ops.time_attention import time_attention_bhds

    rng = np.random.default_rng(13)
    b, T, S, H, D = 1, 5, 64, 2, 16
    q, k, v = (
        jnp.asarray(rng.normal(size=(b * T, H, D, S)).astype(np.float32))
        for _ in range(3)
    )
    cot = jnp.asarray(rng.normal(size=(b * T, H, D, S)).astype(np.float32))

    def ref(q, k, v):
        qh = q.transpose(0, 3, 1, 2).reshape(b, T, S, H, D)
        kh = k.transpose(0, 3, 1, 2).reshape(b, T, S, H, D)
        vh = v.transpose(0, 3, 1, 2).reshape(b, T, S, H, D)
        s = jnp.einsum("bqshd,bkshd->bshqk", qh, kh) * (D**-0.5)
        p = jax.nn.softmax(s, -1)
        o = jnp.einsum("bshqk,bkshd->bqshd", p, vh)
        return o.reshape(b * T, S, H, D).transpose(0, 2, 3, 1)

    loss_k = lambda *a: jnp.sum(  # noqa: E731
        time_attention_bhds(*a, T, 32, True) * cot
    )
    loss_r = lambda *a: jnp.sum(ref(*a) * cot)  # noqa: E731
    gk = jax.grad(loss_k, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(q, k, v)
    for g, r, name in zip(gk, gr, ("dq", "dk", "dv")):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), atol=5e-4, rtol=1e-3, err_msg=name
        )


def test_time_attention_model_path_matches_einsum_path(monkeypatch):
    """Attention(time_frames=...) with the Pallas backend (interpret mode) ==
    the einsum fallback, same params — the layout-fused projections must be
    numerically equivalent to the Dense path."""
    from jax.experimental.pallas import tpu as pltpu

    from stable_virtual_camera_tpu.models.unet import Attention

    monkeypatch.setenv("SVC_TIME_PALLAS", "1")  # force past the platform gate

    rng = np.random.default_rng(9)
    b, T, S, C = 2, 7, 81, 64
    x = jnp.asarray(rng.normal(size=(b * T, S, C)).astype(np.float32))
    att_ein = Attention(heads=2, dim_head=32, use_pallas=False)
    att_pl = Attention(heads=2, dim_head=32, use_pallas=True)
    params = att_ein.init(jax.random.PRNGKey(0), x, time_frames=T)["params"]
    ref = att_ein.apply({"params": params}, x, time_frames=T)
    with pltpu.force_tpu_interpret_mode():
        out = att_pl.apply({"params": params}, x, time_frames=T)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5, rtol=1e-4)


def test_group_norm_matches_flax():
    """ops/norms.group_norm_nhwc == flax nn.GroupNorm (fp32 two-pass) at
    model-activation scales, including a mean-offset case that stresses the
    E[x^2]-E[x]^2 form."""
    import flax.linen as nn

    from stable_virtual_camera_tpu.ops.norms import group_norm_nhwc

    rng = np.random.default_rng(5)
    for B, H, W, C, G, offset in [
        (4, 9, 9, 320, 32, 0.0),
        (2, 5, 5, 64, 32, 30.0),   # large common-mode offset
        (3, 7, 7, 128, 32, -5.0),
    ]:
        x = (rng.normal(size=(B, H, W, C)) * 3 + offset).astype(np.float32)
        gamma = rng.normal(size=(C,)).astype(np.float32)
        beta = rng.normal(size=(C,)).astype(np.float32)
        ref_mod = nn.GroupNorm(num_groups=G, epsilon=1e-5, dtype=jnp.float32)
        ref = ref_mod.apply(
            {"params": {"scale": jnp.asarray(gamma), "bias": jnp.asarray(beta)}},
            jnp.asarray(x),
        )
        out = group_norm_nhwc(
            jnp.asarray(x), jnp.asarray(gamma), jnp.asarray(beta), G, 1e-5
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-4, rtol=1e-3
        )


def test_gelu_policy():
    """auto-GELU: exact erf for fp32 models (parity contract), tanh approx
    for bf16 (deviation <= 4.7e-4 abs — within one bf16 ulp, round-3
    journal). Checks the mode wiring and the deviation bound."""
    import jax
    import jax.numpy as jnp

    from stable_virtual_camera_tpu.models.unet import FeedForward

    rng = np.random.default_rng(7)
    x32 = jnp.asarray(rng.normal(size=(3, 11, 64)).astype(np.float32))

    ff32 = FeedForward(dtype=jnp.float32, param_dtype=jnp.float32)
    params = ff32.init(jax.random.PRNGKey(0), x32)
    out_auto = ff32.apply(params, x32)

    import os

    os.environ["SVC_GELU_MODE"] = "exact"
    try:
        out_exact = ff32.apply(params, x32)
    finally:
        os.environ.pop("SVC_GELU_MODE")
    # fp32 auto == exact erf (bitwise: same graph)
    np.testing.assert_array_equal(np.asarray(out_auto), np.asarray(out_exact))

    # the tanh deviation stays within the documented bound on fp32 inputs
    os.environ["SVC_GELU_MODE"] = "tanh"
    try:
        out_tanh = ff32.apply(params, x32)
    finally:
        os.environ.pop("SVC_GELU_MODE")
    dev = np.abs(np.asarray(out_tanh) - np.asarray(out_exact))
    # deviation passes through proj_out, bound loosened by its gain
    assert dev.max() < 5e-3, dev.max()


def test_layer_norm_fp32_matches_flax():
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from stable_virtual_camera_tpu.ops.norms import layer_norm_fp32

    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=(4, 17, 96)).astype(np.float32) * 3.0 + 0.5)
    gamma = jnp.asarray(rng.normal(size=(96,)).astype(np.float32))
    beta = jnp.asarray(rng.normal(size=(96,)).astype(np.float32))
    ln = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, use_bias=True, use_scale=True)
    ref = ln.apply({"params": {"scale": gamma, "bias": beta}}, x)
    out = layer_norm_fp32(x, gamma, beta, 1e-5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


