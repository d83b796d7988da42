"""Attention closure probe: is the D=64 QK^T at its structural MXU bound?

The model's attention runs ~50% of the calibrated MXU peak (round-3
journal). Hypothesis to close: the QK^T contraction (K = head_dim = 64)
can use at most half of the 128-deep MXU accumulation, so the kernel's
~50% is the LAYOUT-STRUCTURAL ceiling, not scheduling slack — in which
case a "head-packed" kernel cannot help (packing two heads along K mixes
head products; packing along N duplicates q) and the attention bucket is
closed at the toolchain level.

Measures, per hot shape (b=CFG-doubled batch x heads, S, D=64):
  - the upstream flash kernel (the shipped path),
  - a bare batched QK^T einsum (bsd,btd->bst) at D=64,
  - the same contraction zero-padded to D=128 (same useful FLOPs, full-depth
    accumulation): if padded-128 is NOT faster than D=64 per useful FLOP,
    the MXU already fuses two 64-deep passes and there is no headroom,
  - a bare PV einsum (bst,btd->bsd) (contraction K=S, structurally full).

Run on the chip: python benchmark/headdim_probe.py
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

# (name, batch*heads, seq, head_dim) — the five hot shapes (round-3 journal)
SHAPES = [
    ("joint_ds2", 2 * 10, 27216, 64),
    ("joint_ds4", 2 * 20, 6804, 64),
    ("joint_ds8", 2 * 20, 1701, 64),
    ("pf_ds1", 2 * 21 * 5, 5184, 64),
    ("pf_ds2", 2 * 21 * 10, 1296, 64),
]


def timeit(fn, *args, n=3):
    out = fn(*args)
    np.asarray(out).ravel()[:1]  # sync
    best = float("inf")
    for i in range(n):
        args2 = tuple(
            a * (1.0 + 1e-3 * (i + 1)) if hasattr(a, "dtype") else a
            for a in args
        )
        t0 = time.perf_counter()
        out = fn(*args2)
        np.asarray(out).ravel()[:1]
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    from stable_virtual_camera_tpu.ops.flash_upstream import flash_attention

    key = jax.random.PRNGKey(0)
    rows = []
    for name, b, s, d in SHAPES:
        q = jax.random.normal(key, (b, s, d), jnp.bfloat16)
        k = jax.random.normal(key, (b, s, d), jnp.bfloat16)
        v = jax.random.normal(key, (b, s, d), jnp.bfloat16)

        flash = jax.jit(lambda q, k, v: flash_attention(q, k, v))
        qk = jax.jit(lambda q, k: jnp.einsum("bsd,btd->bst", q, k))
        pv_p = jax.jit(lambda p, v: jnp.einsum("bst,btd->bsd", p, v))
        qk128 = jax.jit(
            lambda q, k: jnp.einsum(
                "bsd,btd->bst",
                jnp.pad(q, ((0, 0), (0, 0), (0, 64))),
                jnp.pad(k, ((0, 0), (0, 0), (0, 64))),
            )
        )

        p = jax.random.normal(key, (b, s, s), jnp.bfloat16)
        t_flash = timeit(flash, q, k, v)
        t_qk = timeit(qk, q, k)
        t_qk128 = timeit(qk128, q, k)
        t_pv = timeit(pv_p, p, v)

        fl_qk = 2 * b * s * s * d
        fl_attn = 2 * fl_qk  # qk + pv
        rows.append(
            {
                "shape": name,
                "flash_ms": round(t_flash * 1e3, 2),
                "flash_tfs": round(fl_attn / t_flash / 1e12, 1),
                "qk64_ms": round(t_qk * 1e3, 2),
                "qk64_tfs": round(fl_qk / t_qk / 1e12, 1),
                "qk128pad_ms": round(t_qk128 * 1e3, 2),
                "qk128pad_useful_tfs": round(fl_qk / t_qk128 / 1e12, 1),
                "pv_ms": round(t_pv * 1e3, 2),
                "pv_tfs": round(fl_qk / t_pv / 1e12, 1),
            }
        )
        print(json.dumps(rows[-1]), flush=True)
    closed = all(
        r["qk128pad_useful_tfs"] <= r["qk64_tfs"] * 1.1 for r in rows
    )
    print(
        json.dumps(
            {
                "verdict": "closed: K=64 at structural bound"
                if closed
                else "headroom: padded-128 contraction beats K=64",
                "rows": rows,
            }
        )
    )


if __name__ == "__main__":
    main()
