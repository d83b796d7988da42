"""LoRA adapters (training/lora.py): zero-init identity, target selection,
frozen-base training, merge algebra on rank-2 kernels.

Contract: step 0 reproduces the pretrained model exactly; only adapter
leaves ever change; the merged tree equals base + (a@b)*alpha/rank.
"""

import numpy as np
import optax
import pytest

import jax
import jax.numpy as jnp

from stable_virtual_camera_tpu.config import SevaSpec
from stable_virtual_camera_tpu.models.unet import SevaUNet
from stable_virtual_camera_tpu.training.lora import (
    init_lora,
    lora_target_paths,
    make_lora_train_step,
    merge_lora,
)
from stable_virtual_camera_tpu.training.train_step import synthetic_batch


@pytest.fixture(scope="module")
def setup():
    spec = SevaSpec(
        model_channels=32, num_frames=8, num_head_channels=16, context_dim=64
    )
    T, h, w = spec.num_frames, 16, 16
    unet = SevaUNet(spec, dtype=jnp.float32, param_dtype=jnp.float32)
    params = unet.init(
        jax.random.PRNGKey(0),
        jnp.zeros((T, h, w, spec.in_channels)),
        jnp.zeros((T,), jnp.int32),
        jnp.zeros((T, 1, spec.context_dim)),
        jnp.zeros((T, h, w, spec.dense_in_channels)),
        num_frames=T,
    )["params"]
    batch = synthetic_batch(spec, T, h, w, jax.random.PRNGKey(1))
    return spec, unet, params, batch


def test_targets_are_transformer_projections(setup):
    _, _, params, _ = setup
    paths = lora_target_paths(params)
    assert paths, "no LoRA targets found"
    # every target is an attention/FF projection kernel
    for p in paths:
        assert p.endswith("kernel"), p
        assert any(t in p for t in
                   ("attn1", "attn2", "ff", "proj_in", "proj_out")), p
    # and the big conv / norm / embedding kernels are NOT targeted
    assert not any("in_conv" in p or "gn" in p or "emb" in p for p in paths)


def test_zero_init_is_identity(setup):
    _, _, params, _ = setup
    lora = init_lora(params, rank=4, key=jax.random.PRNGKey(3))
    merged = merge_lora(params, lora)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(merged)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_merge_algebra():
    params = {"blk": {"attn1": {"qkv": {"kernel": jnp.ones((6, 4))}}},
              "other": {"kernel": jnp.zeros((3, 3))}}
    lora = init_lora(params, rank=2, key=jax.random.PRNGKey(0))
    assert set(lora) == {"blk/attn1/qkv/kernel"}
    ab = lora["blk/attn1/qkv/kernel"]
    ab["b"] = jnp.full((2, 4), 0.5)
    merged = merge_lora(params, lora, alpha=4.0)  # scale = 4/2 = 2
    want = np.ones((6, 4)) + np.asarray(ab["a"] @ ab["b"]) * 2.0
    np.testing.assert_allclose(
        np.asarray(merged["blk"]["attn1"]["qkv"]["kernel"]), want, rtol=1e-6
    )
    # untouched leaf stays identical
    np.testing.assert_array_equal(np.asarray(merged["other"]["kernel"]), 0.0)


@pytest.mark.slow
def test_lora_step_trains_adapters_only(setup):
    spec, unet, params, batch = setup
    T = spec.num_frames
    opt = optax.adamw(1e-3)
    step = make_lora_train_step(unet, opt, T)
    lora = init_lora(params, rank=4, key=jax.random.PRNGKey(3))
    opt_state = opt.init(lora)
    base_before = jax.tree.map(jnp.copy, params)
    key = jax.random.PRNGKey(2)
    losses = []
    for _ in range(8):
        lora, opt_state, loss = step(params, lora, opt_state, batch, key)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
    assert np.isfinite(losses).all()
    # the frozen base is bit-identical after training
    for a, b in zip(jax.tree.leaves(base_before), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # adapters moved
    assert any(
        float(jnp.abs(ab["b"]).max()) > 0 for ab in lora.values()
    )
