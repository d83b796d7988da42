"""One-shot jax.profiler capture of a single CFG-doubled UNet forward at the
full 1.3B scale (42 frames @ 72^2 latents) + per-op category table. Only the
FIRST capture per executable is trustworthy on the axon relay
(docs/ARCHITECTURE.md)."""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _synthetic_params
from stable_virtual_camera_tpu.config import SevaSpec
from stable_virtual_camera_tpu.models.unet import SevaUNet
from stable_virtual_camera_tpu.utils.trace_analysis import summarize

T, h, w = 21, 72, 72
LOGDIR = "/tmp/unet_trace"


def main():
    spec = SevaSpec()
    unet = SevaUNet(spec, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
                    use_pallas=True)
    params = _synthetic_params(unet, T, h, w, spec, jnp, jax)
    B = 2 * T

    fwd = jax.jit(
        lambda p, x, t, ctx, dense: unet.apply(
            {"params": p}, x, t, ctx, dense, num_frames=T
        )
    )
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, h, w, spec.in_channels), jnp.bfloat16)
    t = jnp.full((B,), 500, jnp.int32)
    ctx = jax.random.normal(key, (B, 1, spec.context_dim), jnp.bfloat16)
    dense = jax.random.normal(key, (B, h, w, spec.dense_in_channels), jnp.bfloat16)
    np.asarray(fwd(params, x, t, ctx, dense)[0, 0, 0, :2])  # compile
    import time
    t0 = time.perf_counter()
    np.asarray(fwd(params, x * 1.001, t, ctx, dense)[0, 0, 0, :2])
    print(f"fwd wall: {(time.perf_counter() - t0) * 1e3:.0f} ms", flush=True)
    with jax.profiler.trace(LOGDIR):
        np.asarray(fwd(params, x * 1.002, t, ctx, dense)[0, 0, 0, :2])
    print(summarize(LOGDIR, top=20))
    from stable_virtual_camera_tpu.utils.trace_analysis import top_fusion_details

    print(top_fusion_details(LOGDIR, top=12))


if __name__ == "__main__":
    main()
