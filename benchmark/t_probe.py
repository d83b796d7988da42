"""How does denoise cost scale with the chunk length T?

Decides the round-4 "larger chunks" lever (docs/ARCHITECTURE.md round-3
journal, e2e decomposition): a T-frame chunk with A anchors delivers T-A
new frames per scan, so if per-step cost grows SLOWER than T, packing more
targets into one chunk raises delivered-frames/sec even though the raw
per-frame rate drops. The joint-attention layers are O((T*h*w)^2) and the
time-mix is O(T^2) per spatial site, so this is not obvious either way —
measure it.

Times an N-step Euler scan (steps are homogeneous; per-step cost at 10
steps == at 50) on the flagship 1.3B UNet at 576x576 for each T, and
prints per-step and per-delivered-frame numbers assuming the reference's
anchor count for the interp-gt second pass (A=8, seva/eval.py chunk
assembly — 13 new targets per T=21 chunk).

Run: python benchmark/t_probe.py [--steps 10] [--T 21,31,42]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SVC_BENCH_PALLAS", "1")


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _synthetic_params
    from stable_virtual_camera_tpu.config import SevaSpec
    from stable_virtual_camera_tpu.models.unet import SevaUNet
    from stable_virtual_camera_tpu.sampling.discretization import DDPMDiscretization
    from stable_virtual_camera_tpu.sampling.sampler import (
        ChunkConditioning,
        euler_edm_sample,
        make_sampling_plan,
        plan_to_device,
    )

    steps = 10
    if "--steps" in sys.argv:
        steps = int(sys.argv[sys.argv.index("--steps") + 1])
    ts = (21, 31, 42)
    if "--T" in sys.argv:
        ts = tuple(int(x) for x in sys.argv[sys.argv.index("--T") + 1].split(","))

    H = W = 576
    h, w = H // 8, W // 8
    anchors = 8  # interp-gt second-pass context frames per chunk

    spec = SevaSpec()
    # production config: Pallas flash + time-mix kernels (bench.py parity).
    # The XLA-SDPA path at T=42 materializes the joint-attention scores and
    # faulted the TPU worker — don't probe large T without the kernels.
    unet = SevaUNet(
        spec, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
        use_pallas=os.environ.get("SVC_BENCH_PALLAS", "1") == "1",
    )
    plan = plan_to_device(make_sampling_plan(DDPMDiscretization(), steps))
    key = jax.random.PRNGKey(0)

    results = []
    for T in ts:
        params = _synthetic_params(unet, T, h, w, spec, jnp, jax)
        noise = jax.random.normal(key, (T, h, w, 4), jnp.float32)
        cond = ChunkConditioning(
            crossattn=jnp.zeros((2 * T, 1, spec.context_dim), jnp.bfloat16),
            concat=jnp.zeros((2 * T, h, w, 7), jnp.bfloat16),
            dense=jnp.zeros((2 * T, h, w, 6), jnp.bfloat16),
            replace=jnp.zeros((2 * T, h, w, 5), jnp.float32),
            scale=jnp.full((T,), 2.0, jnp.float32),
        )

        def net(p, x, c, t_vec, ca, de, _T=T):
            from stable_virtual_camera_tpu.models.unet import (
                assemble_network_input,
            )

            return unet.apply(
                {"params": p}, assemble_network_input(x, c), t_vec, ca, de,
                num_frames=_T,
            )

        sample = jax.jit(
            lambda p, z, pl, c, k, _T=T: euler_edm_sample(
                lambda x, cc, tv, ca, de, nf: net(p, x, cc, tv, ca, de),
                z, pl, c, k, num_frames=_T,
            )
        )
        np.asarray(sample(params, noise, plan, cond, key))  # compile
        best = float("inf")
        for i in (1, 2):
            t0 = time.perf_counter()
            np.asarray(sample(params, noise, plan, cond, jax.random.PRNGKey(i)))
            best = min(best, time.perf_counter() - t0)
        per_step = best / steps
        delivered = T - anchors
        results.append(
            {
                "T": T,
                "s_per_step": round(per_step, 4),
                "s_per_step_per_frame": round(per_step / T, 5),
                "delivered_frames": delivered,
                "delivered_fps_50step": round(delivered / (50 * per_step), 4),
            }
        )
        print(results[-1], flush=True)

    import json

    print(json.dumps({"t_probe": results}))


if __name__ == "__main__":
    main()
