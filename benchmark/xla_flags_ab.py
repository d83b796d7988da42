"""A/B XLA TPU compiler flags on the headline bench (subprocess per config).

Each config runs `python bench.py` in a fresh process with XLA_FLAGS set —
full-fidelity (same 50-step scan + decode), ~2 min/config on the v5e through
the relay. Only within-run comparisons are valid (axon-tpu-measurement:
cross-session wall-clock swings); this script runs all configs back-to-back.

Knobs swept (the two that move fusion-heavy TPU programs):
- --xla_tpu_scoped_vmem_limit_kib: headroom the fusion tiler may assume;
  raising it lets XLA pick larger fusion tiles (default is conservative).
- latency-hiding scheduler on/off (usually on; measure, don't assume).
"""

import json
import os
import subprocess
import sys

CONFIGS = [
    ("default", ""),
    ("vmem64m", "--xla_tpu_scoped_vmem_limit_kib=65536"),
    ("vmem96m", "--xla_tpu_scoped_vmem_limit_kib=98304"),
    ("no_lhs", "--xla_latency_hiding_scheduler_rerun=0 "
               "--xla_tpu_enable_latency_hiding_scheduler=false"),
]


def main():
    only = set(sys.argv[1:])
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for name, flags in CONFIGS:
        if only and name not in only:
            continue
        env = dict(os.environ)
        if flags:
            env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + flags).strip()
        # fresh compile per config: flag changes invalidate the executable,
        # but the persistent cache would serve a stale default-flag binary
        env.pop("JAX_COMPILATION_CACHE_DIR", None)
        try:
            out = subprocess.run(
                [sys.executable, "bench.py"], cwd=repo, env=env,
                capture_output=True, text=True, timeout=2400,
            )
        except subprocess.TimeoutExpired:
            print(f"{name}: TIMEOUT (2400s) — continuing sweep", flush=True)
            continue
        line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else ""
        try:
            rec = json.loads(line)
            print(f"{name}: {rec['value']} {rec['unit']}", flush=True)
        except (json.JSONDecodeError, KeyError):
            print(f"{name}: FAILED rc={out.returncode} "
                  f"tail={out.stderr.strip()[-200:]}", flush=True)


if __name__ == "__main__":
    main()
