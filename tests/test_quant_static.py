"""Static-calibrated W8A8 (ops/quant.py `w8a8-static` + QuantSite +
UNetDenoiser.ensure_quant_calibrated).

The dynamic W8A8 TPU A/B (docs/ARCHITECTURE.md) showed the int8 MXU win is
real but in-scan weight requantization + per-token activation reduces lose
end-to-end; the static form prequantizes weights once and uses calibrated
per-tensor activation scales so the in-scan quantization is a fused
round/clip/convert. Covered here: the static kernels' error bounds, the
checkpoint contract (params tree identical, quant state in its own
collection), and the full calibrate-then-serve flow through the real
sampler on a topology-complete tiny UNet.
"""

import numpy as np

import jax
import jax.numpy as jnp

from stable_virtual_camera_tpu.config import SevaSpec
from stable_virtual_camera_tpu.models.unet import SevaUNet
from stable_virtual_camera_tpu.ops.quant import (
    quantize_colwise,
    quantized_dense_static,
    quantized_conv_static,
)
from stable_virtual_camera_tpu.sampling.discretization import DDPMDiscretization
from stable_virtual_camera_tpu.sampling.sampler import (
    ChunkConditioning,
    UNetDenoiser,
    make_sampling_plan,
)


def test_dense_static_matches_exact_within_int8_noise():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(5, 33, 48)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(48, 64)).astype(np.float32) * 0.05)
    b = jnp.asarray(rng.normal(size=(64,)).astype(np.float32) * 0.1)
    wq, ws = quantize_colwise(w)
    ax = jnp.max(jnp.abs(x))  # a perfectly calibrated per-tensor scale
    got = np.asarray(quantized_dense_static(x, wq, ws, ax, bias=b), np.float32)
    ref = np.asarray(jnp.einsum("bld,dn->bln", x, w) + b, np.float32)
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    # per-tensor activation scales are coarser than per-token dynamic ones
    assert rel < 0.08, rel


def test_static_saturates_out_of_range_instead_of_rescaling():
    """Activations beyond the calibrated range must clip at ±127, not wrap
    or explode — the serving-time behavior when a scene drifts past the
    calibration chunk's range."""
    w = jnp.eye(4, dtype=jnp.float32)
    wq, ws = quantize_colwise(w)
    ax = jnp.float32(1.0)  # calibrated for |x| <= 1
    x = jnp.asarray([[0.5, 1.0, 4.0, -9.0]], jnp.float32)
    got = np.asarray(quantized_dense_static(x, wq, ws, ax), np.float32)[0]
    np.testing.assert_allclose(got[:2], [0.5, 1.0], atol=0.02)
    np.testing.assert_allclose(got[2:], [1.0, -1.0], atol=0.02)  # saturated


def test_conv_static_matches_exact_within_int8_noise():
    from stable_virtual_camera_tpu.ops.quant import quantize_conv_kernel

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 10, 10, 12)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 12, 16)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.normal(size=(16,)).astype(np.float32) * 0.1)
    wq, ws = quantize_conv_kernel(w)
    ax = jnp.max(jnp.abs(x))
    got = np.asarray(
        quantized_conv_static(x, wq, ws, ax, bias=b, padding=[(1, 1), (1, 1)]),
        np.float32,
    )
    ref = np.asarray(
        jax.lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        + b,
        np.float32,
    )
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 0.08, rel


def _tiny_spec():
    return SevaSpec(
        model_channels=32,
        num_frames=3,
        num_head_channels=16,
        context_dim=16,
    )


def _tiny_cond(rng, T, h, w, ctx=16):
    crossattn = rng.normal(size=(T, 1, ctx)).astype(np.float32)
    plucker = rng.normal(size=(T, h, w, 6)).astype(np.float32)
    mask_map = np.zeros((T, h, w, 1), np.float32)
    mask_map[0] = 1.0
    replace = rng.normal(size=(T, h, w, 5)).astype(np.float32) * mask_map
    return ChunkConditioning(
        crossattn=np.concatenate([np.zeros_like(crossattn), crossattn], 0),
        concat=np.concatenate(
            [
                np.concatenate([np.zeros_like(mask_map), plucker], -1),
                np.concatenate([mask_map, plucker], -1),
            ],
            0,
        ),
        dense=np.concatenate([plucker, plucker], 0),
        replace=np.concatenate([np.zeros_like(replace), replace], 0),
        scale=np.full((T,), 2.0, np.float32),
    )


def test_static_param_tree_and_quant_collection(monkeypatch):
    """w8a8-static keeps the checkpoint contract: the "params" tree is
    byte-identical to the off-mode tree; all quantization state lives in
    the separate "quant" collection (int8 wq + fp32 ws/ax per site)."""
    spec = _tiny_spec()
    rng = np.random.default_rng(2)
    T, H, W = 3, 16, 16
    x = jnp.asarray(rng.normal(size=(2 * T, H, W, 11)).astype(np.float32))
    t_idx = jnp.asarray(rng.integers(0, 1000, size=(2 * T,)))
    context = jnp.asarray(rng.normal(size=(2 * T, 1, 16)).astype(np.float32))
    dense = jnp.asarray(rng.normal(size=(2 * T, H, W, 6)).astype(np.float32))
    unet = SevaUNet(spec, dtype=jnp.float32, param_dtype=jnp.float32)

    monkeypatch.delenv("SVC_QUANT", raising=False)
    tree_off = jax.eval_shape(
        lambda: unet.init(jax.random.PRNGKey(0), x, t_idx, context, dense,
                          num_frames=T)
    )
    monkeypatch.setenv("SVC_QUANT", "w8a8-calib")
    tree_calib = jax.eval_shape(
        lambda: unet.init(jax.random.PRNGKey(0), x, t_idx, context, dense,
                          num_frames=T)
    )
    assert "quant" in tree_calib
    flat = {
        jax.tree_util.keystr(p): v
        for p, v in jax.tree_util.tree_flatten_with_path(tree_calib["quant"])[0]
    }
    assert flat, "no QuantSites bound"
    for key, v in flat.items():
        if key.endswith("['wq']"):
            assert v.dtype == jnp.int8, key
        else:
            assert v.dtype == jnp.float32, key
    off = {
        jax.tree_util.keystr(p): v.shape
        for p, v in jax.tree_util.tree_flatten_with_path(tree_off["params"])[0]
    }
    calib = {
        jax.tree_util.keystr(p): v.shape
        for p, v in jax.tree_util.tree_flatten_with_path(
            tree_calib["params"]
        )[0]
    }
    assert off == calib


def test_static_calibrate_then_serve_through_sampler(monkeypatch):
    """The full flow on the real sampler: under SVC_QUANT=w8a8-static the
    first sample() calibrates (capture trajectory + one batched calib
    forward), binds the quant collection next to the params, and the served
    latents track the exact bf16-contract result within quantization noise.
    The second call reuses the frozen state."""
    spec = _tiny_spec()
    rng = np.random.default_rng(3)
    T, h, w = 3, 16, 16
    cond = _tiny_cond(rng, T, h, w)
    plan = make_sampling_plan(DDPMDiscretization(), 5)
    key = jax.random.PRNGKey(7)
    noise = jax.random.normal(key, (T, h, w, 4), jnp.float32)

    unet = SevaUNet(spec, dtype=jnp.float32, param_dtype=jnp.float32)
    monkeypatch.delenv("SVC_QUANT", raising=False)
    x0 = jnp.asarray(rng.normal(size=(2 * T, h, w, 11)).astype(np.float32))
    t0 = jnp.asarray(rng.integers(0, 1000, size=(2 * T,)))
    params = unet.init(
        jax.random.PRNGKey(0), x0, t0,
        jnp.asarray(cond.crossattn), jnp.asarray(cond.dense), num_frames=T,
    )["params"]

    den_exact = UNetDenoiser(unet, params)
    ref = np.asarray(den_exact.sample(noise, plan, cond, key), np.float32)

    monkeypatch.setenv("SVC_QUANT", "w8a8-static")
    den_q = UNetDenoiser(unet, params)
    got = den_q.sample(noise, plan, cond, key)
    assert isinstance(den_q.params, dict) and "quant" in den_q.params
    got = np.asarray(got, np.float32)
    assert np.isfinite(got).all()
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    # the 5-step trajectory ACCUMULATES per-step int8 noise, and random
    # synthetic weights give far wilder activation ranges than trained ones
    # (per-tensor static scales are range-sensitive); observed ~0.26 here vs
    # ~0.1 for one forward. The bound catches broken scales (rel ~ 1), the
    # correlation check catches direction loss.
    assert 0 < rel < 0.4, rel
    corr = np.corrcoef(got.ravel(), ref.ravel())[0, 1]
    assert corr > 0.95, corr

    # the frozen state is reused — same program, deterministic result
    again = np.asarray(den_q.sample(noise, plan, cond, key), np.float32)
    np.testing.assert_array_equal(again, got)

    # the keyed engine path serves from the same frozen state
    keyed = den_q.sample_from_key(
        (T, h, w, 4), plan, cond, jax.random.PRNGKey(9),
        np.array([0, 0], np.int32),
    )
    assert np.isfinite(np.asarray(keyed)).all()
