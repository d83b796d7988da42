"""Attention layout probe for the BASIC workload (768x576 -> 72x96 latents).

The round-4 tuned table (ops/flash_upstream._TUNED) covers only the 576^2
sequence lengths; the baseline's SECOND published workload (Basic mode, 80
frames @ 768x576, 0.48 f/s H100 — reference docs/GR_USAGE.md:64-69) runs
different lengths, which currently fall to generic block sizes:

  per-frame: 6912 (ds1, 42x5 heads), 1728 (ds2, 42x10), 432 (ds4, 42x20)
  joint:     36288 (ds2, 2x10), 9072 (ds4, 2x20), 2268 (ds8, 2x20)

Useful number theory (lengths are 27*2^k- or 567*2^k-smooth):
  6912 = 54*128  -> kv needs NO padding at all (a 128-multiple!)
  1728 = 13.5*128 -> bk == kv-length exact, or pad to 1792
  36288 = 283.5*128 -> pad kv to 36352 (=2^9*71, bk<=512) or 36864 (1024s)
  9072 = 70.875*128 -> bk == kv exact, or pad to 9216 (=72*128)
  2268 has NO 8-divisible divisor -> q itself must pad (to 2304)

Methodology: one jitted lax.scan of ITERS dependent calls, distinct inputs,
min-of-N, host-transfer sync (docs/ARCHITECTURE.md dispatch discipline).
Run on the real chip; paste winners into ops/flash_upstream._TUNED.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from benchmark.attn_probe2 import D, flash_asym, timed


def main(iters: int = 8) -> None:
    key = jax.random.PRNGKey(0)
    print(f"device={jax.devices()[0]}, iters={iters}")

    # (label, B, H, L, Lq_pad, Lkv_pad, bq, bk)
    cases = [
        # pf_ds1 L=6912: kv is already a 128-multiple -> zero padding anywhere
        ("pf_ds1 generic q7168/b1024 kv7168/b1024", 42, 5, 6912, 7168, 7168, 1024, 1024),
        ("pf_ds1 exact q6912/b864 kv6912/b1728", 42, 5, 6912, 6912, 6912, 864, 1728),
        ("pf_ds1 exact q6912/b1152 kv6912/b1152", 42, 5, 6912, 6912, 6912, 1152, 1152),
        ("pf_ds1 exact q6912/b1728 kv6912/b1728", 42, 5, 6912, 6912, 6912, 1728, 1728),
        ("pf_ds1 exact q6912/b1152 kv6912/b2304", 42, 5, 6912, 6912, 6912, 1152, 2304),
        ("pf_ds1 exact q6912/b1728 kv6912/b3456", 42, 5, 6912, 6912, 6912, 1728, 3456),
        # pf_ds2 L=1728
        ("pf_ds2 generic q2048/b1024 kv2048/b1024", 42, 10, 1728, 2048, 2048, 1024, 1024),
        ("pf_ds2 exact bk==kv q1728/b1728 kv1728/b1728", 42, 10, 1728, 1728, 1728, 1728, 1728),
        ("pf_ds2 exact q1728/b576 kv1728/b1728", 42, 10, 1728, 1728, 1728, 576, 1728),
        ("pf_ds2 asym q1728/b864 kv1792/b896", 42, 10, 1728, 1728, 1792, 864, 896),
        # pf_ds4 L=432
        ("pf_ds4 generic q512/b512 kv512/b512", 42, 20, 432, 512, 512, 512, 512),
        ("pf_ds4 exact bk==kv q432/b432 kv432/b432", 42, 20, 432, 432, 432, 432, 432),
        # joint_ds2 L=36288 (the longest fused sequence of the Basic workload)
        ("joint_ds2 generic q36864/b1024 kv36864/b1024", 2, 10, 36288, 36864, 36864, 1024, 1024),
        ("joint_ds2 asym q36288/b1296 kv36864/b1024", 2, 10, 36288, 36288, 36864, 1296, 1024),
        ("joint_ds2 asym q36288/b1296 kv36864/b2304", 2, 10, 36288, 36288, 36864, 1296, 2304),
        ("joint_ds2 asym q36288/b1296 kv36352/b512", 2, 10, 36288, 36288, 36352, 1296, 512),
        ("joint_ds2 asym q36288/b1008 kv36864/b1152", 2, 10, 36288, 36288, 36864, 1008, 1152),
        # joint_ds4 L=9072
        ("joint_ds4 generic q9216/b1024 kv9216/b1024", 2, 20, 9072, 9216, 9216, 1024, 1024),
        ("joint_ds4 exact bk==kv q9072/b1296 kv9072/b9072", 2, 20, 9072, 9072, 9072, 1296, 9072),
        ("joint_ds4 asym q9072/b1296 kv9216/b1024", 2, 20, 9072, 9072, 9216, 1296, 1024),
        ("joint_ds4 asym q9072/b1296 kv9216/b2304", 2, 20, 9072, 9072, 9216, 1296, 2304),
        ("joint_ds4 asym q9072/b1008 kv9216/b1152", 2, 20, 9072, 9072, 9216, 1008, 1152),
        # joint_ds8 L=2268 (no 8-divisible divisor: q pads to 2304)
        ("joint_ds8 generic q2560/b512 kv2560/b512", 2, 20, 2268, 2560, 2560, 512, 512),
        ("joint_ds8 asym q2304/b1152 kv2304/b1152", 2, 20, 2268, 2304, 2304, 1152, 1152),
        ("joint_ds8 asym q2304/b2304 kv2304/b2304", 2, 20, 2268, 2304, 2304, 2304, 2304),
        ("joint_ds8 asym q2304/b768 kv2304/b2304", 2, 20, 2268, 2304, 2304, 768, 2304),
    ]
    for label, B, H, L, Lq, Lkv, bq, bk in cases:
        flops = 4 * B * H * L * L * D
        fn = flash_asym(B, H, Lq, Lkv, bq, bk, iters, L)
        mk = lambda i: jax.random.normal(  # noqa: E731
            jax.random.fold_in(key, i), (B, H, Lq, D), jnp.bfloat16)
        k = jax.random.normal(jax.random.fold_in(key, 10), (B, H, Lkv, D),
                              jnp.bfloat16)
        v = jax.random.normal(jax.random.fold_in(key, 11), (B, H, Lkv, D),
                              jnp.bfloat16)
        timed(fn, mk, k, v, iters, flops, label)


if __name__ == "__main__":
    main(int(sys.argv[sys.argv.index("--iters") + 1]) if "--iters" in sys.argv else 8)
