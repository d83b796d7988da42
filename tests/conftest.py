"""Test configuration.

Forces JAX onto a virtual 8-device CPU platform (the standard JAX substitute
for multi-chip testing) BEFORE jax is imported anywhere, and provides helpers
to import the read-only reference implementation at /root/reference for
golden-parity tests (we run the reference as an oracle; we never copy it).
"""

import os
import sys
import types

os.environ["JAX_PLATFORMS"] = "cpu"  # tests always run on (virtual 8-device) CPU
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The image preloads jax via PYTHONPATH sitecustomize with JAX_PLATFORMS=axon
# (real TPU through a tunnel) before conftest runs, so the env var alone is
# not enough — force the platform on the already-imported module too.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# XLA:CPU in this image computes fp32 dots with bf16-class fast-math under
# some thread configurations (measured abs err ~0.3 vs float64 on unit-normal
# 1701x1280 matmuls!). Parity tolerances are meaningless under that; force
# true fp32 dots for all CPU test comparisons.
jax.config.update("jax_default_matmul_precision", "highest")
# Persistent compilation cache: this box has ONE cpu core, and tiny-model
# engine compiles dominate test wall time; cache them across runs/sessions.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import pytest

REFERENCE_ROOT = "/root/reference"


def _install_reference_stubs():
    """Stub the reference's GUI/vision deps that are absent in this image so
    its numerical modules (geometry, sampling, eval planners) can be imported
    and run as test oracles."""
    import importlib.machinery

    def _mk_module(name: str) -> types.ModuleType:
        mod = types.ModuleType(name)
        # a real ModuleSpec so importlib.util.find_spec (e.g. transformers'
        # dependency probing) doesn't choke on the stub
        mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
        return mod

    if "gradio" not in sys.modules:
        gradio = _mk_module("gradio")
        gradio.Progress = object
        sys.modules["gradio"] = gradio
    if "torchvision" not in sys.modules:
        import torch

        torchvision = _mk_module("torchvision")
        transforms = _mk_module("torchvision.transforms")
        functional = _mk_module("torchvision.transforms.functional")

        def _crop(img, top, left, height, width):
            return img[..., top : top + height, left : left + width]

        def _pad(img, padding, fill=0):
            pl, pt, pr, pb = padding
            return torch.nn.functional.pad(
                img, (pl, pr, pt, pb), mode="constant", value=fill
            )

        functional.crop = _crop
        functional.pad = _pad
        transforms.functional = functional
        torchvision.transforms = transforms
        sys.modules["torchvision"] = torchvision
        sys.modules["torchvision.transforms"] = transforms
        sys.modules["torchvision.transforms.functional"] = functional
    if "roma" not in sys.modules:
        import torch

        roma = _mk_module("roma")

        def rotvec_to_rotmat(rotvec: "torch.Tensor") -> "torch.Tensor":
            from stable_virtual_camera_tpu.core.trajectories import (
                rotvec_to_rotmat as np_rodrigues,
            )

            return torch.from_numpy(
                np_rodrigues(rotvec.detach().cpu().numpy())
            ).to(rotvec.dtype)

        roma.rotvec_to_rotmat = rotvec_to_rotmat
        sys.modules["roma"] = roma


@pytest.fixture(scope="session")
def ref():
    """Namespace of reference modules imported from /root/reference."""
    _install_reference_stubs()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import seva.eval as ref_eval
    import seva.geometry as ref_geometry
    import seva.model as ref_model
    import seva.sampling as ref_sampling

    ns = types.SimpleNamespace(
        eval=ref_eval,
        geometry=ref_geometry,
        model=ref_model,
        sampling=ref_sampling,
    )
    return ns


@pytest.fixture()
def rng():
    return np.random.default_rng(0)


def random_c2ws(rng: np.random.Generator, n: int, radius: float = 3.0) -> np.ndarray:
    """Random look-at cameras on a sphere around the origin (well-conditioned)."""
    from stable_virtual_camera_tpu.core.trajectories import get_lookat_w2cs

    positions = rng.normal(size=(n, 3))
    positions = positions / np.linalg.norm(positions, axis=-1, keepdims=True) * radius
    positions += rng.normal(scale=0.3, size=(n, 3))
    lookat = rng.normal(scale=0.1, size=3)
    up = np.array([0.0, -1.0, 0.0])
    w2cs = get_lookat_w2cs(positions, lookat, up)
    return np.linalg.inv(w2cs)
