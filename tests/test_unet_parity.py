"""Golden-value parity: JAX SevaUNet vs the reference torch Seva model.

Strategy (SURVEY.md §4): instantiate the reference model at a tiny but
topology-complete spec (every level, every attention pattern incl. joint
unflatten layers and time-mix), randomly initialize, convert its state_dict
with models/convert.py, and compare fp32 forwards element-wise.
"""

import contextlib

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from stable_virtual_camera_tpu.config import SevaSpec
from stable_virtual_camera_tpu.models.convert import convert_seva_state_dict
from stable_virtual_camera_tpu.models.unet import SevaUNet


@pytest.fixture(scope="module")
def torch_sdpa_cpu():
    """Force-allow SDPA on CPU (the reference pins the flash backend, which may
    be unavailable on CPU torch); fall back to the math backend."""
    import seva.modules.transformer as ref_transformer

    @contextlib.contextmanager
    def _null(*args, **kwargs):
        yield

    orig = ref_transformer.sdpa_kernel
    ref_transformer.sdpa_kernel = _null
    yield
    ref_transformer.sdpa_kernel = orig


def _tiny_spec():
    return SevaSpec(
        model_channels=32,
        num_frames=3,
        num_head_channels=16,
        context_dim=64,
    )


def _ref_tiny_model(ref):
    params = ref.model.SevaParams(
        model_channels=32,
        num_frames=3,
        num_head_channels=16,
        context_dim=64,
    )
    torch.manual_seed(0)
    model = ref.model.Seva(params).eval()
    return model


@pytest.mark.slow
def test_unet_matches_reference(ref, torch_sdpa_cpu):
    spec = _tiny_spec()
    model = _ref_tiny_model(ref)

    T, H, W = spec.num_frames, 32, 32  # latent-res input; ds up to 8 -> 4x4
    B = 2 * T  # CFG-doubled batch as in real sampling
    rng = np.random.default_rng(1)
    x = rng.normal(size=(B, 11, H, W)).astype(np.float32)
    t_idx = rng.integers(0, 1000, size=(B,))
    context = rng.normal(size=(B, 1, spec.context_dim)).astype(np.float32)
    dense = rng.normal(size=(B, 6, H, W)).astype(np.float32)

    with torch.no_grad():
        ref_out = model(
            torch.from_numpy(x),
            t=torch.from_numpy(t_idx),
            y=torch.from_numpy(context),
            dense_y=torch.from_numpy(dense),
            num_frames=T,
        ).numpy()

    params = convert_seva_state_dict(model.state_dict(), spec)
    unet = SevaUNet(spec, dtype=jnp.float32, param_dtype=jnp.float32)
    out = unet.apply(
        {"params": params},
        jnp.asarray(np.moveaxis(x, 1, -1)),
        jnp.asarray(t_idx),
        jnp.asarray(context),
        jnp.asarray(np.moveaxis(dense, 1, -1)),
        num_frames=T,
    )
    out_nchw = np.moveaxis(np.asarray(out), -1, 1)

    np.testing.assert_allclose(out_nchw, ref_out, atol=2e-4, rtol=1e-3)


@pytest.mark.slow
def test_unet_init_shapes_match_conversion(ref):
    """Every converted parameter has exactly the shape flax init produces."""
    spec = _tiny_spec()
    model = _ref_tiny_model(ref)
    params = convert_seva_state_dict(model.state_dict(), spec)

    unet = SevaUNet(spec, dtype=jnp.float32, param_dtype=jnp.float32)
    T, H, W = spec.num_frames, 16, 16
    init = unet.init(
        jax.random.PRNGKey(0),
        jnp.zeros((T, H, W, 11)),
        jnp.zeros((T,), jnp.int32),
        jnp.zeros((T, 1, spec.context_dim)),
        jnp.zeros((T, H, W, 6)),
        num_frames=T,
    )["params"]

    flat_init = jax.tree_util.tree_leaves_with_path(init)
    flat_conv = jax.tree_util.tree_leaves_with_path(params)
    init_map = {jax.tree_util.keystr(p): v.shape for p, v in flat_init}
    conv_map = {jax.tree_util.keystr(p): v.shape for p, v in flat_conv}
    assert init_map == conv_map


@pytest.mark.slow
def test_unet_parity_alt_topology(ref, torch_sdpa_cpu):
    """A second architecture (different depths/mults/attention resolutions)
    to prove the topology walk + converter generalize beyond the flagship."""
    spec = SevaSpec(
        model_channels=32,
        num_frames=2,
        num_res_blocks=1,
        attention_resolutions=(2, 1),
        channel_mult=(1, 2, 2),
        num_head_channels=16,
        transformer_depth=(1, 2, 1),
        context_dim=32,
        unflatten_names=("middle_ds4", "output_ds2"),
    )
    params_t = ref.model.SevaParams(
        model_channels=32,
        num_frames=2,
        num_res_blocks=1,
        attention_resolutions=[2, 1],
        channel_mult=[1, 2, 2],
        num_head_channels=16,
        transformer_depth=[1, 2, 1],
        context_dim=32,
        unflatten_names=["middle_ds4", "output_ds2"],
    )
    torch.manual_seed(1)
    model = ref.model.Seva(params_t).eval()

    T, H, W = 2, 16, 16
    B = 2 * T
    rng = np.random.default_rng(2)
    x = rng.normal(size=(B, 11, H, W)).astype(np.float32)
    t_idx = rng.integers(0, 1000, size=(B,))
    context = rng.normal(size=(B, 1, 32)).astype(np.float32)
    dense = rng.normal(size=(B, 6, H, W)).astype(np.float32)

    with torch.no_grad():
        ref_out = model(
            torch.from_numpy(x),
            t=torch.from_numpy(t_idx),
            y=torch.from_numpy(context),
            dense_y=torch.from_numpy(dense),
            num_frames=T,
        ).numpy()

    params = convert_seva_state_dict(model.state_dict(), spec)
    unet = SevaUNet(spec, dtype=jnp.float32, param_dtype=jnp.float32)
    out = unet.apply(
        {"params": params},
        jnp.asarray(np.moveaxis(x, 1, -1)),
        jnp.asarray(t_idx),
        jnp.asarray(context),
        jnp.asarray(np.moveaxis(dense, 1, -1)),
        num_frames=T,
    )
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(out), -1, 1), ref_out, atol=2e-4, rtol=1e-3
    )
