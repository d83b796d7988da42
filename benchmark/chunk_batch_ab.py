"""Single-chip multi-chunk batched scan A/B (r4 VERDICT next #1).

Question: does vmapping B independent second-pass chunks into ONE scan beat
B serial scans on one chip? T stays 21 per chunk (the T>21 joint-attention
growth that killed large-T buckets does not apply); every matmul's batch
dim widens by B, which is exactly what the narrow-N fusions and D=64
attention heads at ~53% MFU want. The cost is Bx activation HBM.

Method: full-scale (1.3B synthetic) UNetDenoiser at 576^2 latents,
`sample` (one chunk) vs `sample_many` with B stacked conditionings
(identical per-chunk keys -> serial-equivalent math). Default 10 sigma
steps (per-step cost is step-count-invariant); min-of-N with distinct keys
and host-transfer sync (docs/ARCHITECTURE.md dispatch discipline).

  python benchmark/chunk_batch_ab.py [--steps 10] [--b 2]  # real chip
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    steps = (
        int(sys.argv[sys.argv.index("--steps") + 1])
        if "--steps" in sys.argv
        else 10
    )
    B = int(sys.argv[sys.argv.index("--b") + 1]) if "--b" in sys.argv else 2

    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench
    from stable_virtual_camera_tpu.sampling.sampler import ChunkConditioning

    print(f"device={jax.devices()[0]}, steps={steps}, B={B}", flush=True)
    bundle = bench._full_scale_bundle()
    T, h, w, C = 21, bench.H // 8, bench.W // 8, 4
    spec = bundle.spec

    def cond_for(i: int) -> ChunkConditioning:
        k = jax.random.PRNGKey(100 + i)
        ks = jax.random.split(k, 5)
        return ChunkConditioning(
            crossattn=jax.random.normal(
                ks[0], (2 * T, 1, spec.context_dim), jnp.bfloat16
            ),
            concat=jax.random.normal(ks[1], (2 * T, h, w, 7), jnp.bfloat16),
            dense=jax.random.normal(ks[2], (2 * T, h, w, 6), jnp.bfloat16),
            replace=jax.random.normal(ks[3], (2 * T, h, w, 5), jnp.float32),
            scale=jnp.full((T,), 2.0, jnp.float32),
        )

    den = bundle.denoiser
    plan = bundle.plan(steps)

    def sync(x):
        return np.asarray(jax.tree_util.tree_leaves(x)[0])[..., :1]

    # --- serial: one chunk per scan ---
    key = jax.random.PRNGKey(0)
    noise = jax.random.normal(key, (T, h, w, C), jnp.float32)
    cond0 = cond_for(0)
    sync(den.sample(noise, plan, cond0, key))  # compile
    t_serial = float("inf")
    for i in (1, 2):
        k = jax.random.PRNGKey(i)
        t0 = time.perf_counter()
        sync(den.sample(noise, plan, cond_for(i), k))
        t_serial = min(t_serial, time.perf_counter() - t0)
    print(f"serial: {t_serial:.2f} s/chunk", flush=True)

    # --- batched: B chunks in one vmapped scan ---
    conds_n = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[cond_for(i) for i in range(B)]
    )
    keys_n = jnp.stack([jax.random.PRNGKey(10 + i) for i in range(B)])
    try:
        sync(den.sample_many(keys_n, plan, conds_n, (T, h, w, C)))  # compile
        t_batch = float("inf")
        for i in (1, 2):
            keys_i = jnp.stack(
                [jax.random.PRNGKey(20 + 10 * i + j) for j in range(B)]
            )
            t0 = time.perf_counter()
            sync(den.sample_many(keys_i, plan, conds_n, (T, h, w, C)))
            t_batch = min(t_batch, time.perf_counter() - t0)
        per_chunk = t_batch / B
        print(f"batched B={B}: {t_batch:.2f} s total, {per_chunk:.2f} s/chunk",
              flush=True)
        speedup = t_serial / per_chunk
    except Exception as e:  # noqa: BLE001 - OOM is a valid A/B outcome
        print(f"batched B={B}: FAILED {repr(e)[:300]}", flush=True)
        per_chunk, speedup = None, None

    print(json.dumps({
        "metric": "chunk_batch_ab",
        "steps": steps,
        "b": B,
        "serial_s_per_chunk": round(t_serial, 3),
        "batched_s_per_chunk": round(per_chunk, 3) if per_chunk else None,
        "speedup": round(speedup, 4) if speedup else None,
    }))


if __name__ == "__main__":
    main()
