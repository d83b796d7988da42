"""Mid-tier parity: oracle-parity checks small enough for the default
(`-m "not slow"`) selection, so every routine test run still exercises the
numerics contract — the full-size versions live under the `slow` mark
(test_unet_parity.py, test_engine.py).

Covers the three layers the slow tier proves at scale:
- UNet forward vs the reference torch model (micro spec, every attention
  pattern incl. a joint unflatten layer and time-mix),
- the Euler-EDM denoise loop (already fast-tier in test_sampling.py),
- one engine chunk end-to-end through SceneEngine.
"""

import os.path as osp

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from stable_virtual_camera_tpu.config import (
    EngineOptions,
    SevaSpec,
    VersionConfig,
)
from stable_virtual_camera_tpu.models.convert import convert_seva_state_dict
from stable_virtual_camera_tpu.models.unet import SevaUNet

pytestmark = pytest.mark.midtier


def _micro_spec():
    # topology-complete (2 levels, joint "middle" attention, time-mix) but
    # smaller than the tiny spec (fewer frames/levels; GroupNorm needs
    # channels divisible by 32) so the 1-core CPU compile stays small
    return SevaSpec(
        model_channels=32,
        num_frames=2,
        num_head_channels=16,
        context_dim=32,
        channel_mult=(1, 2),
        attention_resolutions=(1,),
        transformer_depth=(1, 1),
        unflatten_names=("middle_ds2",),
    )


def test_unet_parity_micro(ref, monkeypatch):
    """JAX UNet forward == reference torch forward at a micro spec, fp32."""
    import contextlib

    import seva.modules.transformer as ref_transformer

    @contextlib.contextmanager
    def _null(*args, **kwargs):
        yield

    monkeypatch.setattr(ref_transformer, "sdpa_kernel", _null)

    spec = _micro_spec()
    params_ref = ref.model.SevaParams(
        model_channels=32,
        num_frames=2,
        num_head_channels=16,
        context_dim=32,
        channel_mult=[1, 2],
        attention_resolutions=[1],
        transformer_depth=[1, 1],
        unflatten_names=["middle_ds2"],
    )
    torch.manual_seed(0)
    model = ref.model.Seva(params_ref).eval()

    T, H, W = spec.num_frames, 16, 16
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
    np.testing.assert_allclose(out_nchw, ref_out, atol=2e-4, rtol=1e-3)


def test_engine_single_chunk(tmp_path, monkeypatch):
    """One single-pass engine chunk end-to-end (plan -> conditioning ->
    denoise scan -> decode -> save) on a random micro bundle.

    Runs with SVC_ENGINE_TIMING=1 so the StageTimer decomposition path is
    exercised (regression: a missing import once crashed every timed render).
    """
    monkeypatch.setenv("SVC_ENGINE_TIMING", "1")
    from conftest import random_c2ws
    from stable_virtual_camera_tpu.engine.runner import SceneEngine
    from stable_virtual_camera_tpu.models.io import random_bundle
    from stable_virtual_camera_tpu.utils.video import read_video

    bundle = random_bundle(image_hw=(64, 64))
    T = bundle.spec.num_frames
    rng = np.random.default_rng(3)
    n = T  # 1 input + (T-1) targets: exactly one chunk
    imgs = rng.uniform(0, 255, size=(n, 64, 64, 3)).astype(np.uint8)
    c2ws = random_c2ws(rng, n).astype(np.float32)[:, :3]
    Ks = np.repeat(
        np.array(
            [[1.2, 0.0, 0.5], [0.0, 1.2, 0.5], [0.0, 0.0, 1.0]],
            dtype=np.float32,
        )[None],
        n,
        axis=0,
    )
    version = VersionConfig(H=64, W=64, T=T)
    options = EngineOptions(
        chunk_strategy="gt", num_steps=2, cfg=2.0, guider_types=1,
        sampler_verbose=False, encoding_t=0, decoding_t=0,
    )
    engine = SceneEngine(bundle, version, options)
    save_path = str(tmp_path / "out")
    paths = list(
        engine.run_one_scene(
            "img2img",
            {"img": [im for im in imgs], "input_indices": [0]},
            {
                "c2w": c2ws,
                "K": [k for k in Ks],
                "input_indices": list(range(n)),
            },
            save_path=save_path,
            seed=23,
        )
    )
    assert paths and osp.exists(paths[-1])
    frames = read_video(osp.join(save_path, "samples-rgb.mp4"))
    assert frames.shape[0] == n - 1  # all targets delivered
