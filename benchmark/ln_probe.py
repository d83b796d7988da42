"""A/B LayerNorm formulations on the real TPU at the UNet's dominant LN
shape: (a) the current XLA lane-reduce, (b) width-1 MXU dots for the stats,
(c) a fused one-pass Pallas kernel (read x once, stats in VMEM, apply, write).

Each variant runs a 32-iteration dependent scan inside ONE jit (the ~35-40 ms
relay dispatch floor makes single-op timings meaningless —
docs/ARCHITECTURE.md). Distinct inputs per timed call; host transfer as sync.

Round-3 result: (b) is NEUTRAL (1.71 vs 1.76 ms/LN, bitwise-identical output
— XLA canonicalizes the width-1 dot back to a reduce), hence not adopted.
"""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from stable_virtual_camera_tpu.ops.norms import layer_norm_fp32

R, C = 42 * 5184, 320
N_IT = 32


def ln_reduce(x, gamma, beta, eps=1e-5):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    msq = jnp.mean(xf * xf, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(jnp.maximum(msq - mean * mean, 0.0) + eps)
    y = (xf - mean) * rstd * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    return y.astype(x.dtype)


def _ln_kernel(x_ref, g_ref, b_ref, o_ref, *, eps):
    xf = x_ref[...].astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    msq = jnp.mean(xf * xf, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(jnp.maximum(msq - mean * mean, 0.0) + eps)
    y = (xf - mean) * rstd * g_ref[...].astype(jnp.float32) + b_ref[...].astype(
        jnp.float32
    )
    o_ref[...] = y.astype(o_ref.dtype)


def ln_pallas(x, gamma, beta, eps=1e-5, block_r=1152):
    rows, c = x.shape
    block_r = min(block_r, rows)
    assert rows % block_r == 0
    return pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        grid=(rows // block_r,),
        in_specs=[
            pl.BlockSpec((block_r, c), lambda i: (i, 0)),
            pl.BlockSpec((c,), lambda i: (0,)),
            pl.BlockSpec((c,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((block_r, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, c), x.dtype),
    )(x, gamma, beta)


def make(fn, gamma, beta):
    @jax.jit
    def run(x):
        def body(h, _):
            return fn(h, gamma, beta) + h * 1e-3, ()

        out, _ = jax.lax.scan(body, x, None, length=N_IT)
        return out[0, :2]

    return run


def main():
    key = jax.random.PRNGKey(0)
    gamma = jnp.ones((C,), jnp.bfloat16)
    beta = jnp.zeros((C,), jnp.bfloat16)
    for name, fn in [
        ("vpu_reduce", ln_reduce),
        ("current", layer_norm_fp32),
        ("pallas_fused", ln_pallas),
    ]:
        run = make(fn, gamma, beta)
        x = jax.random.normal(key, (R, C), jnp.bfloat16)
        np.asarray(run(x))  # compile
        times = []
        for i in range(3):
            xi = x + jnp.bfloat16(1e-3 * (i + 1))
            t0 = time.perf_counter()
            np.asarray(run(xi))
            times.append(time.perf_counter() - t0)
        per_ln = min(times) / N_IT * 1e3
        print(f"{name}: {per_ln:.3f} ms/LN  (min of 3, {N_IT}-scan)", flush=True)
    # numerics: same values up to summation order
    x = jax.random.normal(key, (1024, C), jnp.bfloat16) * 3 + 1.5
    a = np.asarray(ln_reduce(x, gamma, beta), np.float32)
    for name, fn in [("current", layer_norm_fp32), ("pallas_fused", ln_pallas)]:
        b = np.asarray(fn(x, gamma, beta), np.float32)
        print(f"max abs diff vs reduce [{name}]:", np.abs(a - b).max())


if __name__ == "__main__":
    main()
