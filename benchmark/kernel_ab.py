"""In-session A/B of attention kernels at the real model shapes, on the TPU.

Methodology (docs/ARCHITECTURE.md): the axon relay memoizes identical
dispatches and block_until_ready is unreliable — every timed call gets a
distinct input and synchronizes via a host transfer; report min over repeats.

Compares, per UNet attention shape:
  old      — in-repo kernel, (B*H, L, D) layout INCLUDING its entry/exit
             transposes (that is what the model paid),
  upstream — JAX's tuned kernel via the ops/flash_upstream adapter
             (the current default), (B, L, H, D) in,
  packed   — head-packed kernel on (B, L, H*64) directly (opt-in).

NOTE: standalone numbers here carry the ~35-40 ms relay dispatch floor —
only end-to-end bench.py comparisons decide (docs/ARCHITECTURE.md).

Usage: python benchmark/kernel_ab.py [--dtype bf16]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from stable_virtual_camera_tpu.ops import flash_attention as fa
from stable_virtual_camera_tpu.ops import flash_attention_packed as fap
from stable_virtual_camera_tpu.ops import flash_upstream as fau

# (name, B, L, heads) — SURVEY.md §3.4 per-fwd attention shapes at 576²,
# CFG-doubled batch (2T = 42 frames per group of 21)
SHAPES = [
    ("joint_ds2", 2, 27216, 10),
    ("joint_ds4", 2, 6804, 20),
    ("joint_ds8", 2, 1701, 20),
    ("pf_ds1", 42, 5184, 5),
    ("pf_ds2", 42, 1296, 10),
]


def sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0][0, 0])


def time_min(fn, inputs, n=3):
    best = float("inf")
    for i in range(n):
        args = inputs[i]
        t0 = time.perf_counter()
        sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main(dtype=jnp.bfloat16):
    key = jax.random.PRNGKey(0)
    print(f"device={jax.devices()[0]}, dtype={dtype.__name__}")
    for name, B, L, H in SHAPES:
        W = H * 64
        keys = jax.random.split(key, 16)
        packed_inputs = [
            tuple(
                jax.random.normal(keys[3 * i + j], (B, L, W), dtype)
                for j in range(3)
            )
            for i in range(4)
        ]
        old_inputs = [
            tuple(x.reshape(B, L, H, 64) for x in trip) for trip in packed_inputs
        ]

        variants = {
            "old": jax.jit(lambda q, k, v: fa.flash_attention(q, k, v)),
            "upstream": jax.jit(
                lambda q, k, v: fau.flash_attention_upstream(q, k, v)
            ),
            "packed": jax.jit(
                lambda q, k, v: fap.flash_attention_packed(q, k, v, heads=H)
            ),
        }
        flops = 4 * B * L * L * W
        row = [f"{name:10s} B{B} L{L} H{H}:"]
        for vname, fn in variants.items():
            inputs = packed_inputs if vname == "packed" else old_inputs
            try:
                sync(fn(*inputs[3]))  # compile
                t = time_min(fn, inputs)
                row.append(f"{vname} {t*1e3:7.1f} ms ({flops/t/1e12:5.1f} TF/s)")
            except Exception as e:  # noqa: BLE001
                row.append(f"{vname} FAILED({repr(e)[:60]})")
        print(" | ".join(row), flush=True)


if __name__ == "__main__":
    main(jnp.float32 if "--dtype=f32" in sys.argv else jnp.bfloat16)
