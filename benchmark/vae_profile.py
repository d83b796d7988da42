"""One-shot jax.profiler capture of a full-scale VAE decode (21 frames @
576^2 out) + category/fusion tables. First capture per executable only
(docs/ARCHITECTURE.md relay caveat)."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from stable_virtual_camera_tpu.models.vae import AutoEncoderKL
from stable_virtual_camera_tpu.utils.trace_analysis import (
    summarize,
    top_fusion_details,
)

T, h, w = 21, 72, 72
LOGDIR = "/tmp/vae_trace"


def main():
    vae = AutoEncoderKL(dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)

    def fill(path, s):
        name = path[-1].key
        if name == "scale":
            return jnp.ones(s.shape, s.dtype)
        if name == "bias":
            return jnp.zeros(s.shape, s.dtype)
        fan_in = int(np.prod(s.shape[:-1])) if len(s.shape) > 1 else 1
        return (
            jax.random.normal(jax.random.PRNGKey(hash(str(path)) % (2**31)), s.shape)
            * (1.0 / max(fan_in, 1)) ** 0.5
        ).astype(s.dtype)

    params = jax.tree_util.tree_map_with_path(
        fill,
        jax.eval_shape(
            lambda: vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))[
                "params"
            ]
        ),
    )
    decode = jax.jit(
        lambda p, zs: vae.apply({"params": p}, zs, method=AutoEncoderKL.decode)
    )
    z = jax.random.normal(jax.random.PRNGKey(1), (T, h, w, 4), jnp.float32)
    np.asarray(decode(params, z)[0, 0, 0, 0])  # compile
    t0 = time.perf_counter()
    np.asarray(decode(params, z * 1.001)[0, 0, 0, 0])
    print(f"decode wall: {(time.perf_counter() - t0):.3f} s", flush=True)
    with jax.profiler.trace(LOGDIR):
        np.asarray(decode(params, z * 1.002)[0, 0, 0, 0])
    print(summarize(LOGDIR, top=16))
    print(top_fusion_details(LOGDIR, top=10))


if __name__ == "__main__":
    main()
