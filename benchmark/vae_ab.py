"""In-session ablation timing of VAE decoder stages on the TPU.

The decoder measured ~315 ms/frame in round 1 (~9 TF/s — far below the
66 TF/s the UNet's convs reach), with zero optimization work so far
(VERDICT.md Weak #2d). This times each stage shape separately (distinct
inputs per call, host-transfer sync, min-of-N — docs/ARCHITECTURE.md
methodology) so the slow stage is unambiguous.

Usage: python benchmark/vae_ab.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from stable_virtual_camera_tpu.models.vae import (
    VaeAttention,
    VaeResnetBlock,
    VaeUpsample,
)

B = 3  # decode chunk size in bench.py


def sync(x):
    return np.asarray(x[0, 0])


def bench(module, shape, n=3, flops=None):
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, shape, jnp.bfloat16)
    params = module.init(jax.random.PRNGKey(1), x0)["params"]
    fn = jax.jit(lambda p, x: module.apply({"params": p}, x))
    sync(fn(params, x0))  # compile
    best = float("inf")
    for i in range(n):
        x = jax.random.normal(jax.random.PRNGKey(2 + i), shape, jnp.bfloat16)
        t0 = time.perf_counter()
        sync(fn(params, x))
        best = min(best, time.perf_counter() - t0)
    tf = f" ({flops / best / 1e12:5.1f} TF/s)" if flops else ""
    return best, tf


def conv_flops(b, h, w, cin, cout, k=3):
    return 2 * b * h * w * cin * cout * k * k


def resnet_flops(b, h, w, cin, cout):
    f = conv_flops(b, h, w, cin, cout) + conv_flops(b, h, w, cout, cout)
    if cin != cout:
        f += conv_flops(b, h, w, cin, cout, 1)
    return f


def main():
    kw = dict(dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    print(f"device={jax.devices()[0]}, decode chunk B={B}")
    stages = [
        # (label, module, input shape, flops, count per decode)
        ("mid_attn 72²x512", VaeAttention(**kw), (B, 72, 72, 512),
         2 * B * (72 * 72) ** 2 * 512 * 2 + 4 * B * 72 * 72 * 512 * 512 * 2, 1),
        ("resnet 72²x512", VaeResnetBlock(**kw), (B, 72, 72, 512),
         resnet_flops(B, 72, 72, 512, 512), 5),
        ("upsample 72→144x512", VaeUpsample(512, **kw), (B, 72, 72, 512),
         conv_flops(B, 144, 144, 512, 512), 1),
        ("resnet 144²x512", VaeResnetBlock(**kw), (B, 144, 144, 512),
         resnet_flops(B, 144, 144, 512, 512), 3),
        ("upsample 144→288x512", VaeUpsample(512, **kw), (B, 144, 144, 512),
         conv_flops(B, 288, 288, 512, 512), 1),
        ("resnet 288²x512→256", VaeResnetBlock(256, **kw), (B, 288, 288, 512),
         resnet_flops(B, 288, 288, 512, 256), 1),
        ("resnet 288²x256", VaeResnetBlock(**kw), (B, 288, 288, 256),
         resnet_flops(B, 288, 288, 256, 256), 2),
        ("upsample 288→576x256", VaeUpsample(256, **kw), (B, 288, 288, 256),
         conv_flops(B, 576, 576, 256, 256), 1),
        ("resnet 576²x256→128", VaeResnetBlock(128, **kw), (B, 576, 576, 256),
         resnet_flops(B, 576, 576, 256, 128), 1),
        ("resnet 576²x128", VaeResnetBlock(**kw), (B, 576, 576, 128),
         resnet_flops(B, 576, 576, 128, 128), 2),
    ]
    total = 0.0
    for label, mod, shape, fl, count in stages:
        t, tf = bench(mod, shape, flops=fl)
        total += t * count
        print(f"{label:24s}: {t*1e3:7.1f} ms{tf} x{count}", flush=True)
    # 7 chunks of 3 frames cover 21 frames
    print(f"sum per chunk ≈ {total*1e3:.0f} ms → per 21 frames ≈ {total*7:.2f} s")


if __name__ == "__main__":
    main()
