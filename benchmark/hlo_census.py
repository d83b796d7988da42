"""Static FLOP census of one CFG-doubled UNet forward, from the lowered HLO.

Runs anywhere (no TPU, no execution): traces the full-scale forward, parses
the StableHLO text, and prints every convolution / dot_general shape with its
exact FLOP count. Combined with a measured per-category time split (e.g. the
round-3 trace: flash 335 ms, matmul fusions 216 ms, convs 206 ms per fwd)
this yields per-category TF/s — the data that decides which kernel family is
furthest from the calibrated 135 TF/s peak and therefore worth a custom
Pallas kernel next.

Caveat: ops inside `lax.scan`/`while` bodies appear ONCE in the lowered text
but execute once per iteration, so anything kv-chunked or scanned (the XLA
SDPA fallback chunks long-kv scores) is undercounted; straight-line convs,
projections and feed-forwards — the families this census is for — are exact.

Usage: python benchmark/hlo_census.py [--T 21] [--hw 72] [--tiny]
"""

from __future__ import annotations

import argparse
import collections
import re
import sys

sys.path.insert(0, "/root/repo")


def _prod(xs):
    out = 1
    for x in xs:
        out *= int(x)
    return out


_TENSOR = re.compile(r"tensor<([0-9x]+)x[a-z0-9]+>")


def _shapes(sig: str) -> list[list[int]]:
    return [[int(d) for d in m.split("x")] for m in _TENSOR.findall(sig)]


def census(hlo_text: str):
    """Yield (kind, key, flops, count) aggregated over the module text."""
    agg: dict = collections.defaultdict(lambda: [0, 0])  # key -> [flops, n]

    # stablehlo.convolution(...) {...dim_numbers = [b, 0, 1, f]x[0, 1, i, o]->...}
    #   : (tensor<AxBxCxDxbf16>, tensor<KhxKwxCixCoxbf16>) -> tensor<...>
    for m in re.finditer(
        r"stablehlo\.convolution.*?:\s*\(([^)]*)\)\s*->\s*(tensor<[^>]*>)",
        hlo_text,
    ):
        ins, out = _shapes(m.group(1)), _shapes(m.group(2))
        if len(ins) != 2 or not out:
            continue
        # NHWC x HWIO (the only layout this model emits); grouped convs have
        # I = C_in/groups already, so FLOPs = 2*out_elems*Kh*Kw*I.
        kern = ins[1]
        flops = 2 * _prod(out[0]) * _prod(kern[:-1])
        key = ("conv", f"{'x'.join(map(str, ins[0]))} * {'x'.join(map(str, kern))}")
        agg[key][0] += flops
        agg[key][1] += 1

    # stablehlo.dot_general(%a, %b, batching_dims=..., contracting_dims=
    #   [i]x[j], ...) : (tensor<...>, tensor<...>) -> tensor<...>
    for m in re.finditer(
        r"stablehlo\.dot_general.*?contracting_dims\s*=\s*\[([0-9, ]*)\]\s*x\s*"
        r"\[[0-9, ]*\].*?:\s*\(([^)]*)\)\s*->\s*(tensor<[^>]*>)",
        hlo_text,
    ):
        lhs_cdims = [int(x) for x in m.group(1).split(",") if x.strip()]
        ins, out = _shapes(m.group(2)), _shapes(m.group(3))
        if len(ins) != 2 or not out:
            continue
        cprod = _prod(ins[0][d] for d in lhs_cdims)
        flops = 2 * _prod(out[0]) * cprod
        key = ("dot", f"{'x'.join(map(str, ins[0]))} . {'x'.join(map(str, ins[1]))}"
               f" (K={cprod})")
        agg[key][0] += flops
        agg[key][1] += 1

    for (kind, sig), (flops, n) in agg.items():
        yield kind, sig, flops, n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--T", type=int, default=21)
    ap.add_argument("--hw", type=int, default=72, help="latent h=w")
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _synthetic_params
    from stable_virtual_camera_tpu.config import SevaSpec
    from stable_virtual_camera_tpu.models.unet import SevaUNet

    spec = SevaSpec.tiny() if args.tiny else SevaSpec()
    T, h, w = args.T, args.hw, args.hw
    unet = SevaUNet(spec, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
                    use_pallas=False)  # pallas calls hide FLOPs; census the XLA form
    params = _synthetic_params(unet, T, h, w, spec, jnp, jax)
    B = 2 * T

    def fwd(p, x, t, ctx, dense):
        return unet.apply({"params": p}, x, t, ctx, dense, num_frames=T)

    x = jax.ShapeDtypeStruct((B, h, w, spec.in_channels), jnp.bfloat16)
    t = jax.ShapeDtypeStruct((B,), jnp.int32)
    ctx = jax.ShapeDtypeStruct((B, 1, spec.context_dim), jnp.bfloat16)
    dense = jax.ShapeDtypeStruct((B, h, w, spec.dense_in_channels), jnp.bfloat16)
    text = jax.jit(fwd).lower(params, x, t, ctx, dense).as_text()

    rows = sorted(census(text), key=lambda r: -r[2])
    tot = {"conv": 0, "dot": 0}
    print(f"{'kind':5} {'GFLOP':>10} {'n':>3}  shape")
    for kind, sig, flops, n in rows:
        tot[kind] += flops
        if flops >= 1e9:
            print(f"{kind:5} {flops/1e9:10.1f} {n:3d}  {sig}")
    print(f"\nTOTAL conv: {tot['conv']/1e12:.2f} TFLOP   "
          f"dot: {tot['dot']/1e12:.2f} TFLOP   "
          f"(attention is dispatched to Pallas at runtime; with use_pallas="
          f"False its QK/PV dots are included in 'dot' above)")


if __name__ == "__main__":
    main()
