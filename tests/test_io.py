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
