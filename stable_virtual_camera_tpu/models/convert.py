"""Torch-checkpoint -> JAX-pytree weight conversion.

The released Seva weights are a torch safetensors state_dict keyed by the
reference's module tree (seva/model.py; loaded at seva/utils.py:29-56). This
module generates the (torch_key, flax_path) mapping *programmatically* by
replaying the same topology walk the model constructor performs, so the
mapping provably covers every parameter for any `SevaSpec`.

Tensor transforms:
  conv   weight (O, I, kh, kw) -> kernel (kh, kw, I, O)
  linear weight (O, I)         -> kernel (I, O)
  norm   weight/bias           -> scale/bias (unchanged)
"""

from __future__ import annotations

from typing import Any, Iterator

import numpy as np

from stable_virtual_camera_tpu.config import SevaSpec

# (kind) -> for each torch suffix, (flax leaf name, transform)
_KIND_LEAVES = {
    "conv": {"weight": ("kernel", lambda w: np.transpose(w, (2, 3, 1, 0))),
             "bias": ("bias", lambda b: b)},
    "linear": {"weight": ("kernel", lambda w: np.transpose(w, (1, 0))),
               "bias": ("bias", lambda b: b)},
    "linear_nobias": {"weight": ("kernel", lambda w: np.transpose(w, (1, 0)))},
    "norm": {"weight": ("scale", lambda w: w), "bias": ("bias", lambda b: b)},
}


def _attention_entries(tp: str, fp: tuple[str, ...]):
    # attn1 is self-attention -> fused qkv (see models/unet.py Attention);
    # the fused torch key is synthesized by `_fuse_self_attention_qkv`.
    # attn2 is cross-attention over a SINGLE CLIP token: its output is exactly
    # to_out(to_v(context)) (softmax over one key == 1), so to_q/to_k weights
    # are dead parameters — dropped here, marked consumed in the converter.
    yield (f"{tp}.attn1.qkv", fp + ("attn1", "qkv"), "linear_nobias")
    yield (f"{tp}.attn1.to_out.0", fp + ("attn1", "to_out"), "linear")
    yield (f"{tp}.attn2.to_v", fp + ("attn2", "to_v"), "linear_nobias")
    yield (f"{tp}.attn2.to_out.0", fp + ("attn2", "to_out"), "linear")


def _fuse_self_attention_qkv(sd: dict) -> dict:
    """Concat every `*.attn1.to_{q,k,v}.weight` triple into `*.attn1.qkv.weight`
    ((3*out, in) torch layout, order q|k|v)."""
    out = dict(sd)
    for key in list(sd):
        if key.endswith(".attn1.to_q.weight"):
            base = key[: -len("to_q.weight")]
            q, k, v = (out.pop(f"{base}to_{n}.weight") for n in ("q", "k", "v"))
            out[f"{base}qkv.weight"] = np.concatenate([q, k, v], axis=0)
    return out


def _ff_entries(tp: str, fp: tuple[str, ...], ff_name: str):
    yield (f"{tp}.{ff_name}.net.0.proj", fp + (ff_name, "proj_gate"), "linear")
    yield (f"{tp}.{ff_name}.net.2", fp + (ff_name, "proj_out"), "linear")


def _spatial_block_entries(tp: str, fp: tuple[str, ...]):
    yield from _attention_entries(tp, fp)
    yield from _ff_entries(tp, fp, "ff")
    for n in ("norm1", "norm2", "norm3"):
        yield (f"{tp}.{n}", fp + (n, "ln"), "norm")


def _temporal_block_entries(tp: str, fp: tuple[str, ...]):
    yield (f"{tp}.norm_in", fp + ("norm_in", "ln"), "norm")
    yield from _ff_entries(tp, fp, "ff_in")
    yield from _attention_entries(tp, fp)
    yield from _ff_entries(tp, fp, "ff")
    for n in ("norm1", "norm2", "norm3"):
        yield (f"{tp}.{n}", fp + (n, "ln"), "norm")


def _resblock_entries(tp: str, fname: str, has_skip: bool):
    fp = (fname,)
    yield (f"{tp}.in_layers.0", fp + ("in_gn", "gn"), "norm")
    yield (f"{tp}.in_layers.2", fp + ("in_conv",), "conv")
    yield (f"{tp}.emb_layers.1", fp + ("emb_proj",), "linear")
    yield (f"{tp}.dense_emb_layers.0", fp + ("dense_proj",), "conv")
    yield (f"{tp}.out_layers.0", fp + ("out_gn", "gn"), "norm")
    yield (f"{tp}.out_layers.3", fp + ("out_conv",), "conv")
    if has_skip:
        yield (f"{tp}.skip_connection", fp + ("skip",), "conv")


def _mvt_entries(tp: str, fname: str, depth: int):
    fp = (fname,)
    yield (f"{tp}.norm", fp + ("norm", "gn"), "norm")
    yield (f"{tp}.proj_in", fp + ("proj_in",), "linear")
    yield (f"{tp}.proj_out", fp + ("proj_out",), "linear")
    for d in range(depth):
        yield from _spatial_block_entries(
            f"{tp}.transformer_blocks.{d}", fp + (f"spatial_{d}",)
        )
        yield from _temporal_block_entries(
            f"{tp}.time_mix_blocks.{d}", fp + (f"temporal_{d}",)
        )


def seva_key_map(spec: SevaSpec) -> Iterator[tuple[str, tuple[str, ...], str]]:
    """Yield (torch_prefix, flax_path, kind) by replaying the topology walk of
    reference seva/model.py:40-174."""
    mc = spec.model_channels
    yield ("time_embed.0", ("time_embed_0",), "linear")
    yield ("time_embed.2", ("time_embed_2",), "linear")
    yield ("input_blocks.0.0", ("input_blocks_0_0",), "conv")

    ch, ds, block_idx = mc, 1, 1
    for level, mult in enumerate(spec.channel_mult):
        for _ in range(spec.num_res_blocks):
            has_skip = ch != mult * mc
            yield from _resblock_entries(
                f"input_blocks.{block_idx}.0", f"input_blocks_{block_idx}_0", has_skip
            )
            ch = mult * mc
            if ds in spec.attention_resolutions:
                yield from _mvt_entries(
                    f"input_blocks.{block_idx}.1",
                    f"input_blocks_{block_idx}_1",
                    spec.transformer_depth[level],
                )
            block_idx += 1
        if level != len(spec.channel_mult) - 1:
            yield (
                f"input_blocks.{block_idx}.0.op",
                (f"input_blocks_{block_idx}_0", "conv"),
                "conv",
            )
            ds *= 2
            block_idx += 1

    yield from _resblock_entries("middle_block.0", "middle_block_0", False)
    yield from _mvt_entries(
        "middle_block.1", "middle_block_1", spec.transformer_depth[-1]
    )
    yield from _resblock_entries("middle_block.2", "middle_block_2", False)

    # decoder: skip concat changes input channels, so ResBlocks always project
    input_block_chans = [mc]
    c = mc
    for level, mult in enumerate(spec.channel_mult):
        for _ in range(spec.num_res_blocks):
            c = mult * mc
            input_block_chans.append(c)
        if level != len(spec.channel_mult) - 1:
            input_block_chans.append(c)
    block_idx = 0
    for level, mult in list(enumerate(spec.channel_mult))[::-1]:
        for i in range(spec.num_res_blocks + 1):
            ich = input_block_chans.pop()
            has_skip = (ch + ich) != mult * mc
            yield from _resblock_entries(
                f"output_blocks.{block_idx}.0", f"output_blocks_{block_idx}_0", has_skip
            )
            ch = mult * mc
            layer_idx = 1
            if ds in spec.attention_resolutions:
                yield from _mvt_entries(
                    f"output_blocks.{block_idx}.{layer_idx}",
                    f"output_blocks_{block_idx}_{layer_idx}",
                    spec.transformer_depth[level],
                )
                layer_idx += 1
            if level and i == spec.num_res_blocks:
                yield (
                    f"output_blocks.{block_idx}.{layer_idx}.conv",
                    (f"output_blocks_{block_idx}_{layer_idx}", "conv"),
                    "conv",
                )
                ds //= 2
            block_idx += 1

    yield ("out.0", ("out_gn", "gn"), "norm")
    yield ("out.2", ("out_conv",), "conv")


def _set_path(tree: dict, path: tuple[str, ...], leaf: str, value) -> None:
    node = tree
    for p in path:
        node = node.setdefault(p, {})
    node[leaf] = value


def convert_seva_state_dict(
    state_dict: dict[str, Any],
    spec: SevaSpec,
    dtype=np.float32,
    strict: bool = True,
) -> dict:
    """Convert a torch state_dict (tensors or numpy arrays) into the flax param
    tree of `SevaUNet`. Returns {"params": ...}-compatible inner dict."""
    sd = {
        k: (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))
        for k, v in state_dict.items()
    }
    sd = _fuse_self_attention_qkv(sd)
    params: dict = {}
    used = set()
    for torch_prefix, flax_path, kind in seva_key_map(spec):
        for torch_suffix, (leaf, tf) in _KIND_LEAVES[kind].items():
            key = f"{torch_prefix}.{torch_suffix}"
            if key not in sd:
                if strict:
                    raise KeyError(f"Missing torch key {key}")
                continue
            _set_path(params, flax_path[:-1] + (flax_path[-1],), leaf,
                      tf(sd[key]).astype(dtype))
            used.add(key)
    if strict:
        unused = set(sd) - used
        # cross-attention q/k weights are dead math for this model (single
        # context token) — intentionally not converted
        unused = {
            k for k in unused
            if not (k.endswith(".attn2.to_q.weight") or k.endswith(".attn2.to_k.weight"))
        }
        if unused:
            raise KeyError(f"{len(unused)} unconverted torch keys, e.g. {sorted(unused)[:5]}")
    return params


# ---------------------------------------------------------------------------
# VAE (diffusers AutoencoderKL naming, both modern `to_q` and legacy `query`)
# ---------------------------------------------------------------------------

_VAE_ENC_BLOCKS = (128, 256, 512, 512)


def _vae_resnet_entries(tp: str, fp: tuple[str, ...], has_skip: bool):
    yield (f"{tp}.norm1", fp + ("norm1", "gn"), "norm")
    yield (f"{tp}.conv1", fp + ("conv1",), "conv")
    yield (f"{tp}.norm2", fp + ("norm2", "gn"), "norm")
    yield (f"{tp}.conv2", fp + ("conv2",), "conv")
    if has_skip:
        yield (f"{tp}.conv_shortcut", fp + ("conv_shortcut",), "conv")


def _vae_mid_entries(tp: str, fp: tuple[str, ...]):
    yield from _vae_resnet_entries(f"{tp}.resnets.0", fp + ("resnet_0",), False)
    yield (f"{tp}.attentions.0.group_norm", fp + ("attn", "group_norm", "gn"), "norm")
    for t_name, f_name in (
        ("to_q", "to_q"), ("to_k", "to_k"), ("to_v", "to_v"), ("to_out.0", "to_out"),
    ):
        yield (f"{tp}.attentions.0.{t_name}", fp + ("attn", f_name), "linear")
    yield from _vae_resnet_entries(f"{tp}.resnets.1", fp + ("resnet_1",), False)


def vae_key_map():
    """(torch_prefix, flax_path, kind) for the SD2.1 AutoencoderKL layout."""
    blocks = _VAE_ENC_BLOCKS
    # encoder
    yield ("encoder.conv_in", ("encoder", "conv_in"), "conv")
    ch = blocks[0]
    for i, out in enumerate(blocks):
        for j in range(2):
            yield from _vae_resnet_entries(
                f"encoder.down_blocks.{i}.resnets.{j}",
                ("encoder", f"down_{i}_resnet_{j}"),
                has_skip=(ch != out),
            )
            ch = out
        if i < len(blocks) - 1:
            yield (
                f"encoder.down_blocks.{i}.downsamplers.0.conv",
                ("encoder", f"down_{i}_downsample", "conv"),
                "conv",
            )
    yield from _vae_mid_entries("encoder.mid_block", ("encoder", "mid"))
    yield ("encoder.conv_norm_out", ("encoder", "conv_norm_out", "gn"), "norm")
    yield ("encoder.conv_out", ("encoder", "conv_out"), "conv")
    yield ("quant_conv", ("quant_conv",), "conv")
    # decoder
    yield ("post_quant_conv", ("post_quant_conv",), "conv")
    yield ("decoder.conv_in", ("decoder", "conv_in"), "conv")
    yield from _vae_mid_entries("decoder.mid_block", ("decoder", "mid"))
    rev = tuple(reversed(blocks))
    ch = rev[0]
    for i, out in enumerate(rev):
        for j in range(3):
            yield from _vae_resnet_entries(
                f"decoder.up_blocks.{i}.resnets.{j}",
                ("decoder", f"up_{i}_resnet_{j}"),
                has_skip=(ch != out),
            )
            ch = out
        if i < len(rev) - 1:
            yield (
                f"decoder.up_blocks.{i}.upsamplers.0.conv",
                ("decoder", f"up_{i}_upsample", "conv"),
                "conv",
            )
    yield ("decoder.conv_norm_out", ("decoder", "conv_norm_out", "gn"), "norm")
    yield ("decoder.conv_out", ("decoder", "conv_out"), "conv")


_VAE_LEGACY_ATTN = {  # pre-0.15 diffusers attention key spelling
    "to_q": "query", "to_k": "key", "to_v": "value", "to_out.0": "proj_attn",
}


def convert_vae_state_dict(state_dict, dtype=np.float32, strict: bool = True) -> dict:
    sd = {
        k: (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))
        for k, v in state_dict.items()
    }
    params: dict = {}
    used = set()
    for torch_prefix, flax_path, kind in vae_key_map():
        for torch_suffix, (leaf, tf) in _KIND_LEAVES[kind].items():
            key = f"{torch_prefix}.{torch_suffix}"
            if key not in sd:
                # legacy attention naming fallback
                for new, old in _VAE_LEGACY_ATTN.items():
                    if torch_prefix.endswith(new):
                        alt = f"{torch_prefix[: -len(new)]}{old}.{torch_suffix}"
                        if alt in sd:
                            key = alt
                        break
            if key not in sd:
                if strict:
                    raise KeyError(f"Missing torch key {key}")
                continue
            val = sd[key]
            if kind == "linear" and val.ndim == 4:  # legacy 1x1-conv attn weights
                val = val[:, :, 0, 0]
            _set_path(params, flax_path, leaf, tf(val).astype(dtype))
            used.add(key)
    if strict:
        unused = set(sd) - used
        if unused:
            raise KeyError(f"{len(unused)} unconverted VAE keys, e.g. {sorted(unused)[:5]}")
    return params


# ---------------------------------------------------------------------------
# CLIP vision tower (open_clip `visual.*` naming, plus HF transformers naming)
# ---------------------------------------------------------------------------


def convert_clip_open_clip(state_dict, spec, dtype=np.float32) -> dict:
    """Convert open_clip visual-tower weights (keys may or may not carry the
    `visual.` prefix) into the `ClipVisionTower` param tree."""
    sd = {
        (k[len("visual."):] if k.startswith("visual.") else k): (
            v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
        )
        for k, v in state_dict.items()
    }
    p: dict = {}
    p["class_embedding"] = sd["class_embedding"].astype(dtype)
    p["positional_embedding"] = sd["positional_embedding"].astype(dtype)
    p["proj"] = sd["proj"].astype(dtype)  # already (width, embed_dim)
    p["patch_embed"] = {
        "kernel": np.transpose(sd["conv1.weight"], (2, 3, 1, 0)).astype(dtype)
    }
    for ln_t, ln_f in (("ln_pre", "ln_pre"), ("ln_post", "ln_post")):
        p[ln_f] = {"ln": {
            "scale": sd[f"{ln_t}.weight"].astype(dtype),
            "bias": sd[f"{ln_t}.bias"].astype(dtype),
        }}
    for i in range(spec.layers):
        tp = f"transformer.resblocks.{i}"
        blk: dict = {}
        for ln in ("ln_1", "ln_2"):
            blk[ln] = {"ln": {
                "scale": sd[f"{tp}.{ln}.weight"].astype(dtype),
                "bias": sd[f"{tp}.{ln}.bias"].astype(dtype),
            }}
        blk["qkv"] = {
            "kernel": np.transpose(sd[f"{tp}.attn.in_proj_weight"], (1, 0)).astype(dtype),
            "bias": sd[f"{tp}.attn.in_proj_bias"].astype(dtype),
        }
        blk["out_proj"] = {
            "kernel": np.transpose(sd[f"{tp}.attn.out_proj.weight"], (1, 0)).astype(dtype),
            "bias": sd[f"{tp}.attn.out_proj.bias"].astype(dtype),
        }
        blk["c_fc"] = {
            "kernel": np.transpose(sd[f"{tp}.mlp.c_fc.weight"], (1, 0)).astype(dtype),
            "bias": sd[f"{tp}.mlp.c_fc.bias"].astype(dtype),
        }
        blk["c_proj"] = {
            "kernel": np.transpose(sd[f"{tp}.mlp.c_proj.weight"], (1, 0)).astype(dtype),
            "bias": sd[f"{tp}.mlp.c_proj.bias"].astype(dtype),
        }
        p[f"block_{i}"] = blk
    return p


def convert_clip_hf(state_dict, spec, dtype=np.float32) -> dict:
    """Convert HF transformers CLIPVisionModelWithProjection weights."""
    sd = {
        k: (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))
        for k, v in state_dict.items()
    }
    vp = "vision_model"
    p: dict = {}
    p["class_embedding"] = sd[f"{vp}.embeddings.class_embedding"].astype(dtype)
    p["positional_embedding"] = sd[f"{vp}.embeddings.position_embedding.weight"].astype(dtype)
    p["proj"] = np.transpose(sd["visual_projection.weight"], (1, 0)).astype(dtype)
    p["patch_embed"] = {
        "kernel": np.transpose(
            sd[f"{vp}.embeddings.patch_embedding.weight"], (2, 3, 1, 0)
        ).astype(dtype)
    }
    pre_key = (
        f"{vp}.pre_layrnorm" if f"{vp}.pre_layrnorm.weight" in sd else f"{vp}.pre_layernorm"
    )
    p["ln_pre"] = {"ln": {
        "scale": sd[f"{pre_key}.weight"].astype(dtype),
        "bias": sd[f"{pre_key}.bias"].astype(dtype),
    }}
    p["ln_post"] = {"ln": {
        "scale": sd[f"{vp}.post_layernorm.weight"].astype(dtype),
        "bias": sd[f"{vp}.post_layernorm.bias"].astype(dtype),
    }}
    for i in range(spec.layers):
        tp = f"{vp}.encoder.layers.{i}"
        blk: dict = {}
        blk["ln_1"] = {"ln": {
            "scale": sd[f"{tp}.layer_norm1.weight"].astype(dtype),
            "bias": sd[f"{tp}.layer_norm1.bias"].astype(dtype),
        }}
        blk["ln_2"] = {"ln": {
            "scale": sd[f"{tp}.layer_norm2.weight"].astype(dtype),
            "bias": sd[f"{tp}.layer_norm2.bias"].astype(dtype),
        }}
        qw = sd[f"{tp}.self_attn.q_proj.weight"]
        kw_ = sd[f"{tp}.self_attn.k_proj.weight"]
        vw = sd[f"{tp}.self_attn.v_proj.weight"]
        qb = sd[f"{tp}.self_attn.q_proj.bias"]
        kb = sd[f"{tp}.self_attn.k_proj.bias"]
        vb = sd[f"{tp}.self_attn.v_proj.bias"]
        blk["qkv"] = {
            "kernel": np.transpose(np.concatenate([qw, kw_, vw], 0), (1, 0)).astype(dtype),
            "bias": np.concatenate([qb, kb, vb], 0).astype(dtype),
        }
        blk["out_proj"] = {
            "kernel": np.transpose(sd[f"{tp}.self_attn.out_proj.weight"], (1, 0)).astype(dtype),
            "bias": sd[f"{tp}.self_attn.out_proj.bias"].astype(dtype),
        }
        blk["c_fc"] = {
            "kernel": np.transpose(sd[f"{tp}.mlp.fc1.weight"], (1, 0)).astype(dtype),
            "bias": sd[f"{tp}.mlp.fc1.bias"].astype(dtype),
        }
        blk["c_proj"] = {
            "kernel": np.transpose(sd[f"{tp}.mlp.fc2.weight"], (1, 0)).astype(dtype),
            "bias": sd[f"{tp}.mlp.fc2.bias"].astype(dtype),
        }
        p[f"block_{i}"] = blk
    return p
