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
    for attn in ("attn1", "attn2"):
        yield (f"{tp}.{attn}.to_q", fp + (attn, "to_q"), "linear_nobias")
        yield (f"{tp}.{attn}.to_k", fp + (attn, "to_k"), "linear_nobias")
        yield (f"{tp}.{attn}.to_v", fp + (attn, "to_v"), "linear_nobias")
        yield (f"{tp}.{attn}.to_out.0", fp + (attn, "to_out"), "linear")


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
        if unused:
            raise KeyError(f"{len(unused)} unconverted torch keys, e.g. {sorted(unused)[:5]}")
    return params
