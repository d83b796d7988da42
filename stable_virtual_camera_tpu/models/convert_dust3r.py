"""Torch-checkpoint -> flax converter for the DUSt3R stereo network.

The released `naver/DUSt3R_ViTLarge_BaseDecoder_512_dpt` checkpoint (loaded
by reference seva/modules/preprocessor.py:37-39) is a torch state dict over
the CroCo/dust3r module tree. This maps it, name by name, onto
models/dust3r.AsymmetricCroCoStereo's parameter pytree.

Layout rules (validated numerically against torch primitives in
tests/test_dust3r.py):
- Linear weight (O, I)            -> Dense kernel (I, O)
- Conv2d weight (O, I, kh, kw)    -> Conv kernel (kh, kw, I, O)
- ConvTranspose2d weight (I, O, kh, kw) -> ConvTranspose(transpose_kernel=
  True) kernel (kh, kw, O, I)  [transpose(2, 3, 1, 0)]
- LayerNorm weight/bias           -> scale/bias

The checkpoint also carries CroCo leftovers that the inference graph never
uses (`mask_token`, duplicate `act_postprocess.{i}.{j}` ModuleList aliases of
the `act_{i}_postprocess` modules); those are skipped. Real weights cannot be
downloaded in this offline image — the converter's mechanics are exercised by
round-tripping a synthetic torch-style dict generated from
`expected_torch_keys` (tests/test_dust3r.py), and the one-time offline
conversion procedure is documented in scripts/convert_released_weights.py.
"""

from __future__ import annotations

from typing import Callable

import numpy as np

from stable_virtual_camera_tpu.models.dust3r import Dust3rSpec


def _linear(w):
    return np.ascontiguousarray(w.T)


def _conv(w):
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _convT(w):
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _ln_tree(get, prefix):
    return {"ln": {"scale": get(prefix + ".weight"), "bias": get(prefix + ".bias")}}


def _dense_tree(get, prefix):
    return {
        "kernel": _linear(get(prefix + ".weight")),
        "bias": get(prefix + ".bias"),
    }


def _conv_tree(get, prefix, bias=True):
    out = {"kernel": _conv(get(prefix + ".weight"))}
    if bias:
        out["bias"] = get(prefix + ".bias")
    return out


def _convT_tree(get, prefix):
    return {
        "kernel": _convT(get(prefix + ".weight")),
        "bias": get(prefix + ".bias"),
    }


def _enc_block(get, p):
    return {
        "norm1": _ln_tree(get, p + ".norm1"),
        "attn": {
            "qkv": _dense_tree(get, p + ".attn.qkv"),
            "proj": _dense_tree(get, p + ".attn.proj"),
        },
        "norm2": _ln_tree(get, p + ".norm2"),
        "mlp": {
            "fc1": _dense_tree(get, p + ".mlp.fc1"),
            "fc2": _dense_tree(get, p + ".mlp.fc2"),
        },
    }


def _dec_block(get, p):
    return {
        "norm1": _ln_tree(get, p + ".norm1"),
        "attn": {
            "qkv": _dense_tree(get, p + ".attn.qkv"),
            "proj": _dense_tree(get, p + ".attn.proj"),
        },
        "norm_y": _ln_tree(get, p + ".norm_y"),
        "norm2": _ln_tree(get, p + ".norm2"),
        "cross_attn": {
            "projq": _dense_tree(get, p + ".cross_attn.projq"),
            "projk": _dense_tree(get, p + ".cross_attn.projk"),
            "projv": _dense_tree(get, p + ".cross_attn.projv"),
            "proj": _dense_tree(get, p + ".cross_attn.proj"),
        },
        "norm3": _ln_tree(get, p + ".norm3"),
        "mlp": {
            "fc1": _dense_tree(get, p + ".mlp.fc1"),
            "fc2": _dense_tree(get, p + ".mlp.fc2"),
        },
    }


def _dpt_head(get, p):
    """p = 'downstream_head{n}.dpt'."""
    out = {
        "act1_proj": _conv_tree(get, p + ".act_1_postprocess.0"),
        "act1_up": _convT_tree(get, p + ".act_1_postprocess.1"),
        "act2_proj": _conv_tree(get, p + ".act_2_postprocess.0"),
        "act2_up": _convT_tree(get, p + ".act_2_postprocess.1"),
        "act3_proj": _conv_tree(get, p + ".act_3_postprocess.0"),
        "act4_proj": _conv_tree(get, p + ".act_4_postprocess.0"),
        "act4_down": _conv_tree(get, p + ".act_4_postprocess.1"),
        "head_conv1": _conv_tree(get, p + ".head.0"),
        "head_conv2": _conv_tree(get, p + ".head.2"),
        "head_out": _conv_tree(get, p + ".head.4"),
    }
    for i in range(1, 5):
        out[f"layer{i}_rn"] = _conv_tree(get, p + f".scratch.layer{i}_rn", bias=False)
        rn: dict = {
            "rcu2": {
                "conv1": _conv_tree(get, p + f".scratch.refinenet{i}.resConfUnit2.conv1"),
                "conv2": _conv_tree(get, p + f".scratch.refinenet{i}.resConfUnit2.conv2"),
            },
            "out_conv": _conv_tree(get, p + f".scratch.refinenet{i}.out_conv"),
        }
        # refinenet4 has no skip input -> no rcu1 in the graph; torch still
        # instantiates resConfUnit1 there (unused params, skipped).
        if i != 4:
            rn["rcu1"] = {
                "conv1": _conv_tree(get, p + f".scratch.refinenet{i}.resConfUnit1.conv1"),
                "conv2": _conv_tree(get, p + f".scratch.refinenet{i}.resConfUnit1.conv2"),
            }
        out[f"refinenet{i}"] = rn
    return out


def convert_dust3r_state_dict(
    state: dict[str, np.ndarray], spec: Dust3rSpec
) -> dict:
    """Flat torch state dict (str -> array-like) -> flax params pytree for
    AsymmetricCroCoStereo. Raises KeyError naming any missing torch key."""

    used: set[str] = set()

    def get(name: str) -> np.ndarray:
        used.add(name)
        return np.asarray(state[name], dtype=np.float32)

    params: dict = {
        "patch_embed": _conv_tree(get, "patch_embed.proj"),
        "enc_norm": _ln_tree(get, "enc_norm"),
        "decoder_embed": _dense_tree(get, "decoder_embed"),
        "dec_norm": _ln_tree(get, "dec_norm"),
        "head1": _dpt_head(get, "downstream_head1.dpt"),
        "head2": _dpt_head(get, "downstream_head2.dpt"),
    }
    for i in range(spec.enc_depth):
        params[f"enc_block_{i}"] = _enc_block(get, f"enc_blocks.{i}")
    for i in range(spec.dec_depth):
        params[f"dec_block_{i}"] = _dec_block(get, f"dec_blocks.{i}")
        params[f"dec2_block_{i}"] = _dec_block(get, f"dec_blocks2.{i}")

    leftovers = sorted(
        k
        for k in state
        if k not in used
        and not k.startswith(("mask_token", "prediction_head"))
        and ".act_postprocess." not in k  # ModuleList aliases of act_{i}_...
        # refinenet4's resConfUnit1 is instantiated-but-unused in torch
        and ".refinenet4.resConfUnit1." not in k
    )
    if leftovers:
        print(f"[convert_dust3r] {len(leftovers)} unconsumed torch keys, e.g. "
              f"{leftovers[:8]}")
    return params


def expected_torch_keys(spec: Dust3rSpec) -> dict[str, tuple[int, ...]]:
    """Name -> shape manifest of every torch key the converter consumes.
    Used to synthesize a checkpoint-shaped dict in tests and to sanity-check
    a real checkpoint before conversion."""
    E, D = spec.enc_dim, spec.dec_dim
    P = spec.patch_size
    keys: dict[str, tuple[int, ...]] = {
        "patch_embed.proj.weight": (E, 3, P, P),
        "patch_embed.proj.bias": (E,),
        "enc_norm.weight": (E,),
        "enc_norm.bias": (E,),
        "decoder_embed.weight": (D, E),
        "decoder_embed.bias": (D,),
        "dec_norm.weight": (D,),
        "dec_norm.bias": (D,),
    }

    def ln(p, dim):
        keys[p + ".weight"] = (dim,)
        keys[p + ".bias"] = (dim,)

    def dense(p, o, i):
        keys[p + ".weight"] = (o, i)
        keys[p + ".bias"] = (o,)

    def conv(p, o, i, k, bias=True):
        keys[p + ".weight"] = (o, i, k, k)
        if bias:
            keys[p + ".bias"] = (o,)

    def convT(p, i, o, k):
        keys[p + ".weight"] = (i, o, k, k)
        keys[p + ".bias"] = (o,)

    for i in range(spec.enc_depth):
        p = f"enc_blocks.{i}"
        ln(p + ".norm1", E)
        dense(p + ".attn.qkv", 3 * E, E)
        dense(p + ".attn.proj", E, E)
        ln(p + ".norm2", E)
        dense(p + ".mlp.fc1", int(E * spec.mlp_ratio), E)
        dense(p + ".mlp.fc2", E, int(E * spec.mlp_ratio))
    for side in ("dec_blocks", "dec_blocks2"):
        for i in range(spec.dec_depth):
            p = f"{side}.{i}"
            ln(p + ".norm1", D)
            dense(p + ".attn.qkv", 3 * D, D)
            dense(p + ".attn.proj", D, D)
            ln(p + ".norm_y", D)
            ln(p + ".norm2", D)
            for q in ("projq", "projk", "projv", "proj"):
                dense(p + f".cross_attn.{q}", D, D)
            ln(p + ".norm3", D)
            dense(p + ".mlp.fc1", int(D * spec.mlp_ratio), D)
            dense(p + ".mlp.fc2", D, int(D * spec.mlp_ratio))

    ld, fd = spec.dpt_layer_dims, spec.dpt_feature_dim
    dims_in = (spec.enc_dim, D, D, D)
    for n in (1, 2):
        p = f"downstream_head{n}.dpt"
        conv(p + ".act_1_postprocess.0", ld[0], dims_in[0], 1)
        convT(p + ".act_1_postprocess.1", ld[0], ld[0], 4)
        conv(p + ".act_2_postprocess.0", ld[1], dims_in[1], 1)
        convT(p + ".act_2_postprocess.1", ld[1], ld[1], 2)
        conv(p + ".act_3_postprocess.0", ld[2], dims_in[2], 1)
        conv(p + ".act_4_postprocess.0", ld[3], dims_in[3], 1)
        conv(p + ".act_4_postprocess.1", ld[3], ld[3], 3)
        for i in range(1, 5):
            conv(p + f".scratch.layer{i}_rn", fd, ld[i - 1], 3, bias=False)
            for unit in ("resConfUnit1", "resConfUnit2"):
                if i == 4 and unit == "resConfUnit1":
                    continue  # unused in the graph; absent from the manifest
                conv(p + f".scratch.refinenet{i}.{unit}.conv1", fd, fd, 3)
                conv(p + f".scratch.refinenet{i}.{unit}.conv2", fd, fd, 3)
            conv(p + f".scratch.refinenet{i}.out_conv", fd, fd, 1)
        conv(p + ".head.0", fd // 2, fd, 3)
        conv(p + ".head.2", spec.dpt_last_dim, fd // 2, 3)
        conv(p + ".head.4", spec.out_channels, spec.dpt_last_dim, 1)
    return keys
