"""A/B ops/flash_v2 (software-pipelined) vs the tuned upstream kernel at the
real model attention shapes, on the TPU.

8 dependent calls per timed scan inside one jit (relay dispatch floor);
distinct inputs per timed call; host transfer as sync; min of 3.
Optionally pass shape names to restrict, e.g. `flash_v2_probe.py pf_ds1`.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from stable_virtual_camera_tpu.ops.flash_upstream import (
    flash_attention_upstream_bhld,
)
from stable_virtual_camera_tpu.ops.flash_v2 import flash_v2_bhld

SHAPES = [
    ("joint_ds2", 2, 27216, 10),
    ("joint_ds4", 2, 6804, 20),
    ("joint_ds8", 2, 1701, 20),
    ("pf_ds1", 42, 5184, 5),
    ("pf_ds2", 42, 1296, 10),
]
N_IT = 8


def make(fn, B, H, L, D):
    @jax.jit
    def run(q, k, v):
        def body(h, _):
            o = fn(h, k, v)
            return (o * jnp.bfloat16(0.1) + h * jnp.bfloat16(0.9)), ()

        out, _ = jax.lax.scan(body, q, None, length=N_IT)
        return out[0, 0, 0, :2]

    return run


def main():
    only = set(sys.argv[1:])
    key = jax.random.PRNGKey(0)
    flops = lambda B, H, L, D: 4 * L * L * D * H * B  # noqa: E731
    for name, B, L, H in SHAPES:
        if only and name not in only:
            continue
        D = 64
        kq, kk, kv = jax.random.split(key, 3)
        q = jax.random.normal(kq, (B, H, L, D), jnp.bfloat16)
        k = jax.random.normal(kk, (B, H, L, D), jnp.bfloat16)
        v = jax.random.normal(kv, (B, H, L, D), jnp.bfloat16)
        for variant, fn in [
            ("upstream", flash_attention_upstream_bhld),
            ("v2", flash_v2_bhld),
        ]:
            run = make(fn, B, H, L, D)
            np.asarray(run(q, k, v))  # compile
            times = []
            for i in range(3):
                qi = q + jnp.bfloat16(1e-3 * (i + 1))
                t0 = time.perf_counter()
                np.asarray(run(qi, k, v))
                times.append(time.perf_counter() - t0)
            ms = min(times) / N_IT * 1e3
            tf = flops(B, H, L, D) / (ms * 1e-3) / 1e12
            print(f"{name} {variant}: {ms:.2f} ms/call  {tf:.1f} TF/s", flush=True)
        # numerics
        a = np.asarray(flash_attention_upstream_bhld(q, k, v), np.float32)
        b = np.asarray(flash_v2_bhld(q, k, v), np.float32)
        print(f"{name} max abs diff: {np.abs(a - b).max():.5f}", flush=True)


if __name__ == "__main__":
    main()
