"""Per-shape block-size sweep for the upstream flash kernel + VAE decode
batching probe, on the real TPU.

Methodology (docs/ARCHITECTURE.md): single-kernel timings through the axon
relay are meaningless (~35-40 ms dispatch floor), so each config times ONE
jitted `lax.scan` of ITERS dependent kernel calls (output feeds the next
query) — per-iteration time is honest. Distinct inputs per timed call,
min-of-N, host-transfer sync.

Usage: python benchmark/attn_block_sweep.py [--iters 8]
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

# (name, B, L, heads, configs) at 576^2, CFG-doubled. Round-3 insight: the
# model's sequence lengths are 16-smooth multiples of 81/1296 — exact-divisor
# blocks (1296 = 81*16 divides both 5184 and 27216) eliminate the pad copies
# AND the segment-id masking (segment ids only exist to mask padding).
SHAPES = [
    ("pf_ds1", 42, 5184, 5,
     [(1024, 1024), (1296, 1296), (648, 1296), (1296, 648), (648, 648)]),
    ("joint_ds2", 2, 27216, 10,
     [(1024, 1024), (1296, 1296), (1008, 1008), (1296, 2268)]),
    ("pf_ds2", 42, 1296, 10,
     [(512, 512), (1296, 1296), (648, 648), (432, 432), (648, 1296)]),
    ("joint_ds4", 2, 6804, 20,
     [(1024, 1024), (864, 864), (432, 864), (972, 972), (2268, 2268)]),
    ("joint_ds8", 2, 1701, 20,
     [(1024, 1024), (576, 576), (864, 864), (567, 567)]),
    ("pf_ds4", 42, 324, 20,
     [(128, 128), (384, 384), (324, 324), (256, 256)]),
]


def _round_up(x, m):
    return -(-x // m) * m


def make_fn(B, H, L, D, bq, bk, iters):
    L_pad = _round_up(L, max(bq, bk))
    if L_pad == L:
        seg = None  # no padding -> no masking work at all
    else:
        ids = (jnp.arange(L_pad) >= L).astype(jnp.int32)
        seg = SegmentIds(
            q=jnp.broadcast_to(ids, (B, L_pad)),
            kv=jnp.broadcast_to(ids, (B, L_pad)),
        )
    sizes = BlockSizes(
        block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
        block_q_major_dkv=bq, block_k_major_dkv=bk, block_k_dkv=bk,
        block_q_dkv=bq, block_k_major_dq=bk, block_k_dq=bk, block_q_dq=bq,
    )

    @jax.jit
    def run(q, k, v):
        def step(carry, _):
            out = upstream(
                carry, k, v, segment_ids=seg, sm_scale=float(D) ** -0.5,
                block_sizes=sizes,
            )
            return out.astype(carry.dtype), None

        out, _ = jax.lax.scan(step, q, None, length=iters)
        return out

    return run, L_pad


def main(iters=8):
    key = jax.random.PRNGKey(0)
    D = 64
    print(f"device={jax.devices()[0]}, iters={iters}")
    for name, B, L, H, configs in SHAPES:
        flops = 4 * B * H * L * L * D
        for bq, bk in configs:
            if bq > _round_up(L, bq) or bk > _round_up(L, bk):
                continue
            try:
                fn, L_pad = make_fn(B, H, L, D, bq, bk, iters)
                qs = [
                    jax.random.normal(jax.random.fold_in(key, i),
                                      (B, H, L_pad, D), jnp.bfloat16)
                    for i in range(3)
                ]
                k = jax.random.normal(jax.random.fold_in(key, 10),
                                      (B, H, L_pad, D), jnp.bfloat16)
                v = jax.random.normal(jax.random.fold_in(key, 11),
                                      (B, H, L_pad, D), jnp.bfloat16)
                np.asarray(fn(qs[0], k, v)[0, 0, 0])  # compile
                best = float("inf")
                for q in qs[1:]:
                    t0 = time.perf_counter()
                    np.asarray(fn(q, k, v)[0, 0, 0])
                    best = min(best, (time.perf_counter() - t0) / iters)
                print(
                    f"{name:10s} bq={bq:5d} bk={bk:5d}: {best * 1e3:7.2f} ms/it"
                    f" ({flops / best / 1e12:5.1f} TF/s)",
                    flush=True,
                )
            except Exception as e:  # noqa: BLE001
                print(f"{name:10s} bq={bq} bk={bk}: FAILED {repr(e)[:90]}",
                      flush=True)


def decode_probe():
    """VAE decode batching: lax.map chunks of 7 (current) vs one flat batch."""
    from stable_virtual_camera_tpu.models.vae import AutoEncoderKL

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
    key = jax.random.PRNGKey(1)
    T, h, w = 21, 72, 72
    z = jax.random.normal(key, (T, h, w, 4), jnp.float32)

    variants = {}
    for chunk in (3, 7, 21):
        n_chunks = -(-T // chunk)
        pad = n_chunks * chunk - T

        def run(z, _chunk=chunk, _pad=pad, _n=n_chunks):
            zp = jnp.pad(z, ((0, _pad), (0, 0), (0, 0), (0, 0)))
            zs = zp.reshape((_n, _chunk) + z.shape[1:])
            if _n == 1:
                return vae.apply({"params": params}, zs[0],
                                 method=AutoEncoderKL.decode)
            return jax.lax.map(
                lambda zc: vae.apply({"params": params}, zc,
                                     method=AutoEncoderKL.decode), zs
            )

        variants[f"chunk{chunk}"] = jax.jit(run)

    for vname, fn in variants.items():
        try:
            np.asarray(jax.tree_util.tree_leaves(fn(z))[0]).ravel()[0]
            best = float("inf")
            for i in (1, 2):
                z2 = z * (1 + 0.001 * i)
                t0 = time.perf_counter()
                out = fn(z2)
                np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
                best = min(best, time.perf_counter() - t0)
            print(f"decode {vname}: {best:6.3f} s for {T} frames", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"decode {vname}: FAILED {repr(e)[:90]}", flush=True)


if __name__ == "__main__":
    it = 8
    if "--iters" in sys.argv:
        it = int(sys.argv[sys.argv.index("--iters") + 1])
    main(it)
    decode_probe()
