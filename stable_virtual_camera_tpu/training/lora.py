"""LoRA: parameter-efficient fine-tuning of the multiview UNet.

The reference is inference-only (SURVEY.md §2.8: no training code at all);
the training subsystem (training/train_step.py) adds full fine-tuning, and
this module adds the production-standard cheap variant: low-rank adapters
(Hu et al. 2021) on the transformer projection kernels. Only the adapters
train — optimizer state and checkpoints are megabytes instead of the 1.3B
model's ~16 GB fp32 AdamW state, and the tuned result merges back into a
single weight tree for serving (zero inference-time overhead, same
artifact/export path as the base model).

TPU-native formulation: adapters live in a SEPARATE flat tree
(`{path: {"a", "b"}}`) keyed by the parameter path, and the train step
computes `merged = base + (a @ b) * (alpha / rank)` functionally inside the
jitted program — no model-code changes, no module surgery; `jax.grad` w.r.t.
the adapter tree alone leaves the frozen base untouched (and XLA folds the
rank-r delta GEMMs into the step). Works on any kernel: rank>2 kernels
(e.g. the layout-fused attention projections `(c, h, d)`) fold their
trailing dims, so `a: (in, r)`, `b: (r, prod(rest))`.
"""

from __future__ import annotations

import re
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from stable_virtual_camera_tpu.training.train_step import _make_loss_fn

# attention projections + feed-forward matmuls of every transformer block
# (spatial and temporal): the standard LoRA target set
DEFAULT_PATTERN = r"(attn1|attn2|ff|ff_in)/.*kernel$|/(proj_in|proj_out)/kernel$"


def _path_str(path) -> str:
    return "/".join(
        str(getattr(k, "key", getattr(k, "idx", k))) for k in path
    )


def lora_target_paths(params, pattern: str = DEFAULT_PATTERN) -> list[str]:
    """Parameter paths (joined with '/') whose kernels get adapters."""
    rx = re.compile(pattern)
    out = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        p = _path_str(path)
        if rx.search(p) and leaf.ndim >= 2:
            out.append(p)
    return sorted(out)


def init_lora(
    params,
    rank: int,
    key: jax.Array,
    pattern: str = DEFAULT_PATTERN,
    dtype=jnp.float32,
) -> dict:
    """Adapter tree {path: {"a": (in, r), "b": (r, out)}} for every target.

    `a` is Gaussian (std 1/rank), `b` is ZERO — merged weights start exactly
    equal to the base, so step 0 reproduces the pretrained model."""
    paths = lora_target_paths(params, pattern)
    if not paths:
        raise ValueError(f"no kernels match LoRA pattern {pattern!r}")
    leaves = {
        _path_str(p): leaf
        for p, leaf in jax.tree_util.tree_flatten_with_path(params)[0]
    }
    lora = {}
    for p in paths:
        k = leaves[p]
        d_in, d_out = k.shape[0], int(np.prod(k.shape[1:]))
        key, sub = jax.random.split(key)
        lora[p] = {
            "a": (jax.random.normal(sub, (d_in, rank), dtype) / rank),
            "b": jnp.zeros((rank, d_out), dtype),
        }
    return lora


def merge_lora(params, lora: dict, alpha: float | None = None):
    """base + (a @ b) * (alpha / rank), reshaped back to the kernel's shape.

    `alpha=None` uses alpha=rank (scale 1.0, the common default)."""
    flat = {
        _path_str(p): (p, leaf)
        for p, leaf in jax.tree_util.tree_flatten_with_path(params)[0]
    }

    def one(pstr, ab):
        _, kernel = flat[pstr]
        rank = ab["a"].shape[-1]
        scale = 1.0 if alpha is None else float(alpha) / rank
        delta = (ab["a"] @ ab["b"]).reshape(kernel.shape) * scale
        return kernel + delta.astype(kernel.dtype)

    merged = dict(flat)
    for pstr, ab in lora.items():
        if pstr not in flat:
            raise ValueError(f"adapter path {pstr!r} not in parameter tree")
        merged[pstr] = (flat[pstr][0], one(pstr, ab))

    leaves = [merged[_path_str(p)][1]
              for p, _ in jax.tree_util.tree_flatten_with_path(params)[0]]
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def make_lora_train_step(
    unet,
    optimizer: optax.GradientTransformation,
    num_frames: int,
    alpha: float | None = None,
    discretization=None,
    remat: bool = False,
):
    """Jitted `step(base_params, lora, opt_state, batch, key) ->
    (lora, opt_state, loss)`.

    The frozen base flows in as a (donation-free) argument — never as
    captured constants (a 1.3B literal tree bloats compilation) — and only
    the adapter tree is differentiated, updated, and donated. Optimizer
    state is over the adapters only: AdamW moments for a rank-16 sweep of
    the 1.3B model are ~50 MB instead of ~16 GB."""
    loss_fn = _make_loss_fn(unet, num_frames, discretization, remat)

    def lora_loss(lora, base_params, batch, key):
        return loss_fn(merge_lora(base_params, lora, alpha), batch, key)

    @partial(jax.jit, donate_argnums=(1, 2))
    def step(base_params, lora, opt_state, batch, key):
        loss, grads = jax.value_and_grad(lora_loss)(lora, base_params, batch, key)
        updates, opt_state = optimizer.update(grads, opt_state, lora)
        lora = optax.apply_updates(lora, updates)
        return lora, opt_state, loss

    return step
