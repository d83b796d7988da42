"""FULL-SCALE (1.3B) weight-conversion validation against the reference
architecture (VERDICT.md Missing #1: naming bugs at 1.3B scale would only
surface at full scale).

No network egress exists in this image, so the released checkpoint cannot be
downloaded; instead the reference torch model is instantiated at its REAL
default spec (seva/model.py:17-36 SevaParams — the exact architecture the
released `model.safetensors` was saved from), randomly initialized, and:

  1. every state_dict key converts (strict=True — zero missing/unexpected),
  2. every converted leaf matches the flax init shape exactly,
  3. the parameter count is the published 1.3B,
  4. a full-scale fp32 forward matches element-wise at a small latent.

Together these pin the converter's behavior on the real checkpoint's naming
and shapes; scripts/convert_released_weights.py reuses the same code path.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from stable_virtual_camera_tpu.config import SevaSpec
from stable_virtual_camera_tpu.models.convert import convert_seva_state_dict
from stable_virtual_camera_tpu.models.unet import SevaUNet

from test_unet_parity import torch_sdpa_cpu  # noqa: F401 (fixture)


@pytest.fixture(scope="module")
def full_ref_model(ref):
    torch.manual_seed(0)
    return ref.model.Seva(ref.model.SevaParams()).eval()  # the real 1.3B spec


@pytest.mark.slow
def test_fullscale_state_dict_converts_strict(ref, full_ref_model):
    spec = SevaSpec()  # flagship defaults == reference SevaParams defaults
    sd = full_ref_model.state_dict()
    n_params = sum(v.numel() for v in sd.values())
    assert 1.2e9 < n_params < 1.5e9, n_params  # the published "1.3B"

    params = convert_seva_state_dict(sd, spec, dtype=np.float32, strict=True)

    # every leaf matches flax init shapes (structure + shape, full scale)
    unet = SevaUNet(spec, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    shapes = jax.eval_shape(
        lambda: unet.init(
            jax.random.PRNGKey(0),
            jnp.zeros((2, 8, 8, spec.in_channels)),
            jnp.zeros((2,), jnp.int32),
            jnp.zeros((2, 1, spec.context_dim)),
            jnp.zeros((2, 8, 8, spec.dense_in_channels)),
            num_frames=1,
        )["params"]
    )
    flat_conv = jax.tree_util.tree_leaves_with_path(params)
    flat_init = dict(
        (jax.tree_util.keystr(p), v.shape)
        for p, v in jax.tree_util.tree_leaves_with_path(shapes)
    )
    assert len(flat_conv) == len(flat_init)
    for path, leaf in flat_conv:
        key = jax.tree_util.keystr(path)
        assert key in flat_init, f"converted leaf {key} not in flax init"
        assert leaf.shape == flat_init[key], (key, leaf.shape, flat_init[key])


@pytest.mark.slow
def test_fullscale_forward_parity(ref, full_ref_model, torch_sdpa_cpu):  # noqa: F811
    """Element-wise fp32 forward parity at the REAL 1.3B scale (tiny latent
    to keep CPU time bounded; every block still executes)."""
    spec = SevaSpec()
    model = full_ref_model
    T, H, W = 2, 16, 16
    B = 2 * T
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
    np.testing.assert_allclose(out_nchw, ref_out, atol=5e-4, rtol=1e-3)
