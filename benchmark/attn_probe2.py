"""Round-3 attention probes: asymmetric q/kv padding for the upstream flash
kernel, and the splash-attention kernel family, per model shape.

The upstream kernel constrains block_k to a multiple of 128 (or == kv len)
but q blocks only need to divide the (separately padded) q length — so pad
q and kv INDEPENDENTLY: q to an exact-divisor block (usually zero pad), kv
to the nearest 128-multiple with a usable 128-multiple divisor.

Methodology per docs/ARCHITECTURE.md: one jitted lax.scan of ITERS dependent
calls, distinct inputs, min-of-N, host sync.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas.ops.tpu.flash_attention import (
    BlockSizes,
    SegmentIds,
    flash_attention as upstream,
)

D = 64


def timed(fn, make_q, k, v, iters, flops, label):
    try:
        np.asarray(fn(make_q(0), k, v)[0, 0, 0])  # compile
        best = float("inf")
        for i in (1, 2):
            q = make_q(i)
            t0 = time.perf_counter()
            np.asarray(fn(q, k, v)[0, 0, 0])
            best = min(best, (time.perf_counter() - t0) / iters)
        print(f"{label}: {best * 1e3:7.2f} ms/it ({flops / best / 1e12:5.1f} TF/s)",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{label}: FAILED {repr(e)[:120]}", flush=True)


def flash_asym(B, H, Lq, Lkv_pad, bq, bk, iters, L):
    """Upstream kernel, q length Lq (possibly unpadded), kv padded to
    Lkv_pad; segment ids mask the padded keys."""
    need_seg = Lkv_pad != L or Lq != L
    if need_seg:
        q_ids = (jnp.arange(Lq) >= L).astype(jnp.int32)
        kv_ids = (jnp.arange(Lkv_pad) >= L).astype(jnp.int32)
        seg = SegmentIds(
            q=jnp.broadcast_to(q_ids, (B, Lq)),
            kv=jnp.broadcast_to(kv_ids, (B, Lkv_pad)),
        )
    else:
        seg = None
    sizes = BlockSizes(
        block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
        block_q_major_dkv=bq, block_k_major_dkv=bk, block_k_dkv=bk,
        block_q_dkv=bq, block_k_major_dq=bk, block_k_dq=bk, block_q_dq=bq,
    )

    @jax.jit
    def run(q, k, v):
        def step(carry, _):
            out = upstream(carry, k, v, segment_ids=seg,
                           sm_scale=float(D) ** -0.5, block_sizes=sizes)
            return out.astype(carry.dtype), None

        out, _ = jax.lax.scan(step, q, None, length=iters)
        return out

    return run


def splash_fn(B, H, L, bq, bkv, iters):
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_kernel as sk,
        splash_attention_mask as sm,
    )

    mask = sm.MultiHeadMask([sm.FullMask((L, L)) for _ in range(H)])
    block_sizes = sk.BlockSizes(
        block_q=bq, block_kv=bkv, block_kv_compute=bkv,
        block_q_dkv=bq, block_kv_dkv=bkv, block_kv_dkv_compute=bkv,
        block_q_dq=bq, block_kv_dq=bkv,
    )
    kernel = sk.make_splash_mha_single_device(mask=mask, block_sizes=block_sizes)
    scale = float(D) ** -0.5

    @jax.jit
    def run(q, k, v):
        def one(qb, kb, vb):
            return kernel(qb * scale, kb, vb)

        def step(carry, _):
            out = jax.vmap(one)(carry, k, v)
            return out.astype(carry.dtype), None

        out, _ = jax.lax.scan(step, q, None, length=iters)
        return out

    return run


def main(iters=8):
    key = jax.random.PRNGKey(0)
    print(f"device={jax.devices()[0]}, iters={iters}")

    # (label, B, H, L, Lq, Lkv_pad, bq, bk)
    flash_cases = [
        ("pf_ds1  asym q5184/b648 kv5376/b1792", 42, 5, 5184, 5184, 5376, 648, 1792),
        ("pf_ds1  asym q5184/b1296 kv5376/b1792", 42, 5, 5184, 5184, 5376, 1296, 1792),
        ("pf_ds1  asym q5184/b648 kv5376/b896", 42, 5, 5184, 5184, 5376, 648, 896),
        ("pf_ds1  asym q5184/b5184 kv5376/b1792", 42, 5, 5184, 5184, 5376, 5184, 1792),
        ("joint_ds2 asym q27216/b1296 kv27648/b1024", 2, 10, 27216, 27216, 27648, 1296, 1024),
        ("joint_ds2 asym q27216/b1008 kv27648/b3072", 2, 10, 27216, 27216, 27648, 1008, 3072),
        ("joint_ds4 asym q6804/b972 kv6912/b1152", 2, 20, 6804, 6804, 6912, 972, 1152),
        ("joint_ds4 asym q6804/b972 kv6912/b2304", 2, 20, 6804, 6804, 6912, 972, 2304),
        ("joint_ds8 asym q1701/b567 kv1792/b896", 2, 20, 1701, 1701, 1792, 567, 896),
        ("joint_ds8 asym q1701/b567 kv1792/b1792", 2, 20, 1701, 1701, 1792, 567, 1792),
        ("joint_ds8 asym q1701/b1701 kv1792/b1792", 2, 20, 1701, 1701, 1792, 1701, 1792),
    ]
    for label, B, H, L, Lq, Lkv, bq, bk in flash_cases:
        flops = 4 * B * H * L * L * D
        fn = flash_asym(B, H, Lq, Lkv, bq, bk, iters, L)
        mk = lambda i: jax.random.normal(  # noqa: E731
            jax.random.fold_in(key, i), (B, H, Lq, D), jnp.bfloat16)
        k = jax.random.normal(jax.random.fold_in(key, 10), (B, H, Lkv, D),
                              jnp.bfloat16)
        v = jax.random.normal(jax.random.fold_in(key, 11), (B, H, Lkv, D),
                              jnp.bfloat16)
        timed(fn, mk, k, v, iters, flops, label)

    # splash: q (B, H, L, D) vmapped over B; L must be divisible by blocks
    splash_cases = [
        ("splash pf_ds1  b1296/1344?", 42, 5, 5184, 648, 576),
        ("splash joint_ds2", 2, 10, 27216, 1296, 1008),
        ("splash joint_ds2 big", 2, 10, 27216, 2268, 3024),
        ("splash pf_ds2", 42, 10, 1296, 648, 648),
        ("splash joint_ds4", 2, 20, 6804, 972, 756),
    ]
    for label, B, H, L, bq, bkv in splash_cases:
        flops = 4 * B * H * L * L * D
        try:
            fn = splash_fn(B, H, L, bq, bkv, iters)
        except Exception as e:  # noqa: BLE001
            print(f"{label}: BUILD FAILED {repr(e)[:120]}", flush=True)
            continue
        mk = lambda i: jax.random.normal(  # noqa: E731
            jax.random.fold_in(key, i), (B, H, L, D), jnp.bfloat16)
        k = jax.random.normal(jax.random.fold_in(key, 10), (B, H, L, D),
                              jnp.bfloat16)
        v = jax.random.normal(jax.random.fold_in(key, 11), (B, H, L, D),
                              jnp.bfloat16)
        timed(fn, mk, k, v, iters, flops, label)


if __name__ == "__main__":
    it = 8
    if "--iters" in sys.argv:
        it = int(sys.argv[sys.argv.index("--iters") + 1])
    main(it)
