"""Native LPIPS (VGG16 variant) in flax — the benchmark protocol's third
metric, implemented TPU-side so quality scoring never needs the torch
`lpips` package at eval time.

The reference computes no metrics in-repo (SURVEY.md §4); its benchmark
protocol scores PSNR/SSIM/LPIPS externally (reference
benchmark/README.md:150-152). PSNR/SSIM are numpy (benchmark/metrics.py);
LPIPS needs pretrained VGG16 features + the LPIPS linear heads, so this
module provides:

  * `LPIPS` — the exact LPIPS-v0.1 computation graph (Zhang et al. 2018,
    `lpips` package semantics): inputs in [-1, 1] NHWC, the ScalingLayer
    shift/scale, VGG16 features at relu1_2/relu2_2/relu3_3/relu4_3/relu5_3,
    per-channel unit normalization (eps 1e-10), squared diffs, 1x1 no-bias
    linear heads, spatial mean, sum over the 5 levels.
  * `convert_lpips` — converter from the standard torch checkpoint layouts:
    torchvision `vgg16` state dict (`features.{idx}.weight/bias`, OIHW) and
    the lpips package's `vgg.pth` head file (`lin{i}.model.1.weight`,
    (1, C, 1, 1)). One command once the weights can land (zero-egress env:
    they currently cannot — see VERDICT r4 missing #2).
  * `save_lpips` / `load_lpips` — msgpack round-trip of converted params.
  * `synthetic_lpips_params` — random weights with the real topology, so the
    whole scoring path executes today (day-0-drill style).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any

# torchvision vgg16 `features` conv indices and their output channels
_VGG16_CONVS: tuple[tuple[int, int], ...] = (
    (0, 64), (2, 64),
    (5, 128), (7, 128),
    (10, 256), (12, 256), (14, 256),
    (17, 512), (19, 512), (21, 512),
    (24, 512), (26, 512), (28, 512),
)
# features are tapped AFTER the relu following these conv indices
_TAP_AFTER: tuple[int, ...] = (2, 7, 14, 21, 28)
# maxpool sits before these conv indices
_POOL_BEFORE: tuple[int, ...] = (5, 10, 17, 24)

# LPIPS ScalingLayer constants (lpips/lpips.py ScalingLayer)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class VGG16Features(nn.Module):
    """VGG16 `features` trunk returning the 5 LPIPS tap activations."""

    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> list[jnp.ndarray]:
        taps = []
        for idx, ch in _VGG16_CONVS:
            if idx in _POOL_BEFORE:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            x = nn.Conv(
                ch, (3, 3), padding=1, dtype=self.dtype,
                param_dtype=self.param_dtype, name=f"conv{idx}",
            )(x)
            x = nn.relu(x)
            if idx in _TAP_AFTER:
                taps.append(x)
        return taps


class LPIPS(nn.Module):
    """lpips(pred, target) for NHWC inputs in [-1, 1]; returns (B,)."""

    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    eps: float = 1e-10

    @nn.compact
    def __call__(self, pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        vgg = VGG16Features(
            dtype=self.dtype, param_dtype=self.param_dtype, name="vgg"
        )
        shift = jnp.asarray(_SHIFT, self.dtype)
        scale = jnp.asarray(_SCALE, self.dtype)
        f_pred = vgg((pred - shift) / scale)
        f_tgt = vgg((target - shift) / scale)  # same instance -> shared params

        def unit_norm(f):
            n = jnp.sqrt(jnp.sum(jnp.square(f), axis=-1, keepdims=True))
            return f / (n + self.eps)

        total = 0.0
        for i, (fp, ft) in enumerate(zip(f_pred, f_tgt)):
            d = jnp.square(unit_norm(fp) - unit_norm(ft))
            r = nn.Conv(
                1, (1, 1), use_bias=False, dtype=self.dtype,
                param_dtype=self.param_dtype, name=f"lin{i}",
            )(d)
            total = total + jnp.mean(r, axis=(1, 2, 3))
        return total


def convert_lpips(
    vgg_state_dict: dict, lin_state_dict: dict, dtype=np.float32
) -> dict:
    """torch checkpoints -> LPIPS flax params.

    `vgg_state_dict`: torchvision vgg16 (full or `features`-only) —
    `features.{idx}.weight` (O, I, 3, 3) and `.bias`; classifier keys are
    ignored. `lin_state_dict`: the lpips `vgg.pth` layout —
    `lin{i}.model.1.weight` of shape (1, C, 1, 1)."""

    def t(v):
        return np.asarray(v, dtype)

    params: dict = {"vgg": {}}
    for idx, ch in _VGG16_CONVS:
        w = t(vgg_state_dict[f"features.{idx}.weight"])
        b = t(vgg_state_dict[f"features.{idx}.bias"])
        assert w.shape[0] == ch, (idx, w.shape)
        params["vgg"][f"conv{idx}"] = {
            "kernel": np.transpose(w, (2, 3, 1, 0)),  # OIHW -> HWIO
            "bias": b,
        }
    for i in range(5):
        w = t(lin_state_dict[f"lin{i}.model.1.weight"])  # (1, C, 1, 1)
        params[f"lin{i}"] = {"kernel": np.transpose(w, (2, 3, 1, 0))}
    return params


def synthetic_lpips_params(seed: int = 0) -> dict:
    """Random weights with the exact real topology (pipeline drills)."""
    module = LPIPS()
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    return module.init(jax.random.PRNGKey(seed), x, x)["params"]


def save_lpips(params: dict, path: str) -> None:
    from flax import serialization

    with open(path, "wb") as f:
        f.write(serialization.to_bytes(params))


def load_lpips(path: str) -> dict:
    from flax import serialization

    template = jax.eval_shape(synthetic_lpips_params)
    template = jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, s.dtype), template
    )
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def lpips_apply_fn(params: dict):
    """Jitted (pred, target) -> float scorer over HWC [0, 1] numpy images
    (the benchmark/metrics.py contract)."""
    module = LPIPS()
    apply = jax.jit(
        lambda p, a, b: module.apply({"params": p}, a, b)
    )

    def compute(pred: np.ndarray, target: np.ndarray) -> float:
        a = jnp.asarray(np.asarray(pred, np.float32))[None] * 2.0 - 1.0
        b = jnp.asarray(np.asarray(target, np.float32))[None] * 2.0 - 1.0
        return float(np.asarray(apply(params, a, b))[0])

    return compute
