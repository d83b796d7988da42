"""One-shot jax.profiler capture of a single VAE-decode dispatch (chunk of 3
frames at 576², bf16) + per-op category table. Only the FIRST capture per
executable is trustworthy on the axon relay (docs/ARCHITECTURE.md), so this
script profiles exactly one run."""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from stable_virtual_camera_tpu.models.vae import AutoEncoderKL
from stable_virtual_camera_tpu.utils.trace_analysis import summarize

B = 3
LOGDIR = "/tmp/vae_trace"


def main():
    vae = AutoEncoderKL(dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    shapes = jax.eval_shape(
        lambda: vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))["params"]
    )

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

    params = jax.tree_util.tree_map_with_path(fill, shapes)
    decode = jax.jit(
        lambda p, z: vae.apply({"params": p}, z, method=AutoEncoderKL.decode)
    )
    z = jax.random.normal(jax.random.PRNGKey(1), (B, 72, 72, 4), jnp.float32)
    np.asarray(decode(params, z))  # compile outside the trace
    z2 = z * 1.001
    with jax.profiler.trace(LOGDIR):
        np.asarray(decode(params, z2))
    summarize(LOGDIR, top=25)


if __name__ == "__main__":
    main()
