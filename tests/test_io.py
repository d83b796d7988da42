"""Weight IO tests: safetensors roundtrip through the converters and the
orbax converted-checkpoint cache."""

import numpy as np

import jax.numpy as jnp


def test_safetensors_unet_roundtrip(tmp_path):
    """Write a torch-named safetensors file for the tiny spec, load via
    load_seva_params, compare trees."""
    import torch
    from safetensors.torch import save_file

    import sys

    sys.path.insert(0, "/root/reference")
    from seva.model import Seva, SevaParams

    from stable_virtual_camera_tpu.config import SevaSpec
    from stable_virtual_camera_tpu.models.convert import convert_seva_state_dict
    from stable_virtual_camera_tpu.models.io import load_seva_params

    torch.manual_seed(0)
    spec = SevaSpec.tiny()
    model = Seva(
        SevaParams(
            model_channels=32, num_frames=3, num_head_channels=16, context_dim=64
        )
    )
    sd = {k: v.contiguous() for k, v in model.state_dict().items()}
    path = tmp_path / "model.safetensors"
    save_file(sd, str(path))

    params = load_seva_params(str(path), spec, param_dtype=jnp.float32)
    direct = convert_seva_state_dict(model.state_dict(), spec)
    import jax

    for (p1, a), (p2, b) in zip(
        jax.tree_util.tree_leaves_with_path(params),
        jax.tree_util.tree_leaves_with_path(direct),
    ):
        assert jax.tree_util.keystr(p1) == jax.tree_util.keystr(p2)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_orbax_converted_roundtrip(tmp_path):
    from stable_virtual_camera_tpu.models.io import load_converted, save_converted

    tree = {
        "unet": {"layer": {"kernel": np.ones((4, 4), np.float32)}},
        "vae": {"conv": {"bias": np.arange(3, dtype=np.float32)}},
        "clip": {"proj": np.full((2, 2), 7.0, np.float32)},
    }
    out = tmp_path / "converted"
    save_converted(tree, str(out))
    back = load_converted(str(out))
    np.testing.assert_allclose(
        back["unet"]["layer"]["kernel"], tree["unet"]["layer"]["kernel"]
    )
    np.testing.assert_allclose(back["vae"]["conv"]["bias"], tree["vae"]["conv"]["bias"])
    np.testing.assert_allclose(back["clip"]["proj"], tree["clip"]["proj"])


def test_lowvram_offload_roundtrip():
    """lowvram mode (VaeApplier/ClipApplier lowvram=True) keeps weights in
    host RAM (numpy leaves, not device arrays) and still produces the exact
    same outputs — the TPU analogue of the reference's stage-wise
    load/unload_model (seva/eval.py:325-341); VERDICT.md Weak #7."""
    import jax
    import jax.numpy as jnp

    from stable_virtual_camera_tpu.engine.runner import VaeApplier, ClipApplier
    from stable_virtual_camera_tpu.models.clip import ClipVisionSpec, ClipVisionTower
    from stable_virtual_camera_tpu.models.vae import AutoEncoderKL

    rng = np.random.default_rng(0)
    vae = AutoEncoderKL(dtype=jnp.float32, param_dtype=jnp.float32)
    vae_params = vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))["params"]

    hot = VaeApplier(vae, vae_params)
    cold = VaeApplier(vae, vae_params, lowvram=True)
    # offloaded leaves are host arrays
    leaves_hot = jax.tree_util.tree_leaves(hot.params)
    leaves_cold = jax.tree_util.tree_leaves(cold.params)
    assert any(isinstance(leaf, jax.Array) for leaf in leaves_hot)
    assert all(isinstance(leaf, np.ndarray) for leaf in leaves_cold)

    imgs = rng.uniform(-1, 1, size=(2, 32, 32, 3)).astype(np.float32)
    np.testing.assert_array_equal(hot.encode(imgs), cold.encode(imgs))
    z = rng.normal(size=(2, 4, 4, 4)).astype(np.float32)
    np.testing.assert_array_equal(hot.decode(z), cold.decode(z))

    spec = ClipVisionSpec.tiny()
    clip = ClipVisionTower(spec, dtype=jnp.float32, param_dtype=jnp.float32)
    sz = spec.image_size
    clip_params = clip.init(jax.random.PRNGKey(1), jnp.zeros((1, sz, sz, 3)))[
        "params"
    ]
    hot_c = ClipApplier(clip, clip_params)
    cold_c = ClipApplier(clip, clip_params, lowvram=True)
    assert all(
        isinstance(leaf, np.ndarray)
        for leaf in jax.tree_util.tree_leaves(cold_c.params)
    )
    imgs2 = rng.uniform(-1, 1, size=(3, sz, sz, 3)).astype(np.float32)
    np.testing.assert_array_equal(hot_c.embed(imgs2), cold_c.embed(imgs2))


def test_checkpoint_specs_manifest_roundtrip(tmp_path):
    """save_converted(specs=...) writes specs.json; load_checkpoint_specs /
    _spec_from_dict rebuild the exact dataclasses (tuples restored, unknown
    keys dropped) — the self-describing-checkpoint contract load_bundle
    uses to pick non-default topologies (e.g. the day-0 drill's tiny mode)."""
    from stable_virtual_camera_tpu.config import SevaSpec
    from stable_virtual_camera_tpu.models.clip import ClipVisionSpec
    from stable_virtual_camera_tpu.models.io import (
        _spec_from_dict,
        load_checkpoint_specs,
        save_converted,
    )

    spec = SevaSpec.tiny()
    clip_spec = ClipVisionSpec.tiny()
    out = tmp_path / "ckpt"
    save_converted(
        {"unet": {"w": np.zeros(2, np.float32)}},
        str(out),
        specs={"seva": spec, "clip": clip_spec},
    )
    stored = load_checkpoint_specs(str(out))
    assert set(stored) == {"seva", "clip"}
    assert _spec_from_dict(SevaSpec, stored["seva"]) == spec
    assert _spec_from_dict(ClipVisionSpec, stored["clip"]) == clip_spec
    # forward compatibility: unknown keys are ignored
    stored["seva"]["future_knob"] = 1
    assert _spec_from_dict(SevaSpec, stored["seva"]) == spec
    # incremental save keeps prior spec entries
    save_converted(
        {"vae": {"b": np.zeros(1, np.float32)}}, str(out),
        specs={"seva": spec},
    )
    assert set(load_checkpoint_specs(str(out))) == {"seva", "clip"}
