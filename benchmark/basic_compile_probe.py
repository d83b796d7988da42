"""Isolate the Basic-workload (72x96-latent) scan compile on the real chip.

`bench.py --scenario basic` died in warmup with a remote-compile HTTP 500
(tpu_compile_helper exit 1) while compiling its first big program. Each
tuned attention layout compiled standalone (attn_probe_basic), so this
probe compiles the FULL T=21 x 72x96 denoise-scan program — the exact
serving program — under selectable layout policy to bisect:

  python benchmark/basic_compile_probe.py            # tuned table
  SVC_FLASH_TUNED=0 python benchmark/basic_compile_probe.py   # generic
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    import jax
    import jax.numpy as jnp

    import bench
    from stable_virtual_camera_tpu.sampling.sampler import ChunkConditioning

    print(
        f"device={jax.devices()[0]} SVC_FLASH_TUNED="
        f"{os.environ.get('SVC_FLASH_TUNED', '1')}",
        flush=True,
    )
    steps = (
        int(sys.argv[sys.argv.index("--steps") + 1])
        if "--steps" in sys.argv
        else 2
    )
    bundle = bench._full_scale_bundle()
    T, h, w, C = 21, 72, 96, 4
    spec = bundle.spec
    cond = ChunkConditioning(
        crossattn=jnp.zeros((2 * T, 1, spec.context_dim), jnp.bfloat16),
        concat=jnp.zeros((2 * T, h, w, 7), jnp.bfloat16),
        dense=jnp.zeros((2 * T, h, w, 6), jnp.bfloat16),
        replace=jnp.zeros((2 * T, h, w, 5), jnp.float32),
        scale=jnp.full((T,), 2.0, jnp.float32),
    )
    den = bundle.denoiser
    plan = bundle.plan(steps)
    noise = jax.random.normal(jax.random.PRNGKey(0), (T, h, w, C), jnp.float32)
    t0 = time.time()
    x = den.sample(noise, plan, cond, jax.random.PRNGKey(1))
    import numpy as np

    np.asarray(x[..., :1])
    print(f"compile+run OK in {time.time() - t0:.1f} s", flush=True)


if __name__ == "__main__":
    main()
