"""Parse a jax.profiler Chrome trace into a per-op-category cost table.

Usage:
    with jax.profiler.trace("/tmp/jaxtrace"):
        ... one step ...
    python -m stable_virtual_camera_tpu.utils.trace_analysis /tmp/jaxtrace

Works against the axon remote TPU (verified): device events appear under the
'/device:TPU:0' process; fusion names are collapsed and bucketed into
attention / convolution+matmul / elementwise / copy categories.
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import re
import sys


def load_trace(logdir: str) -> list[dict]:
    paths = sorted(
        glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"), recursive=True)
    )
    assert paths, f"no trace.json.gz under {logdir}"
    data = json.load(gzip.open(paths[-1]))
    return data["traceEvents"] if isinstance(data, dict) else data


def device_events(events: list[dict]) -> list[dict]:
    device_pids = {
        e["pid"]
        for e in events
        if e.get("ph") == "M"
        and e.get("name") == "process_name"
        and "device" in e["args"].get("name", "").lower()
    }
    return [
        e
        for e in events
        if e.get("ph") == "X" and "dur" in e and e.get("pid") in device_pids
    ]


def categorize(name: str, args: dict) -> str:
    hlo = args.get("long_name", name)
    cat = args.get("hlo_category", "")
    if "flash_attention" in hlo or "custom-call" in hlo and "tpu_custom_call" in hlo:
        return "pallas kernels"
    if "convolution" in cat or "convolution" in hlo or "dot" in cat:
        return "conv + matmul"
    if name.startswith(("copy", "pad", "reshape", "slice", "concatenate",
                        "broadcast", "bitcast", "transpose")):
        return "copies / layout"
    if "fusion" in name or name in ("add", "sub", "reduce_sum"):
        return "elementwise / norms"
    if name.startswith("jit_"):
        return "(whole program)"
    return "other"


def summarize(logdir: str, top: int = 20):
    events = load_trace(logdir)
    dev = device_events(events)
    by_cat = collections.Counter()
    by_op = collections.Counter()
    for e in dev:
        args = e.get("args", {})
        cat = categorize(e.get("name", "?"), args)
        if cat == "(whole program)":
            continue
        by_cat[cat] += e["dur"]
        key = re.sub(r"\d+", "#", e.get("name", "?"))[:100]
        by_op[key] += e["dur"]

    lines = ["-- by category (ms) --"]
    for cat, dur in by_cat.most_common():
        lines.append(f"{dur / 1e3:9.2f}  {cat}")
    lines.append("-- top ops (ms) --")
    for op, dur in by_op.most_common(top):
        lines.append(f"{dur / 1e3:9.2f}  {op}")
    return "\n".join(lines)


def top_fusion_details(logdir: str, top: int = 10) -> str:
    """The N most expensive individual fusion/dot ops WITH their HLO
    long_name (shapes included) — identifies what a 'fusion.#' bucket is."""
    events = load_trace(logdir)
    per_op = collections.Counter()
    samples: dict[str, str] = {}
    for e in device_events(events):
        name = e.get("name", "?")
        if not ("fusion" in name or "convolution" in name):
            continue
        key = re.sub(r"\d+$", "#", name)
        per_op[key] += e["dur"]
        long = e.get("args", {}).get("long_name", "")
        if key not in samples or len(long) > len(samples[key]):
            samples[key] = long
    lines = ["-- top fusions with HLO detail (total ms) --"]
    for op, dur in per_op.most_common(top):
        lines.append(f"{dur / 1e3:9.2f}  {op}\n           {samples[op][:360]}")
    return "\n".join(lines)


def instances(logdir: str, top: int = 40, name_filter: str = "") -> str:
    """Every individual device-op INSTANCE (not family-aggregated), sorted by
    duration — finds which specific conv/matmul shapes dominate a family
    bucket. Repeated executions of the same HLO instruction are summed."""
    events = load_trace(logdir)
    per_instr = collections.Counter()
    longs: dict[str, str] = {}
    for e in device_events(events):
        name = e.get("name", "?")
        if name.startswith("jit_"):
            continue
        if name_filter and name_filter not in name:
            continue
        per_instr[name] += e["dur"]
        if name not in longs:
            longs[name] = e.get("args", {}).get("long_name", "")
    lines = [f"-- top {top} op instances (ms) --"]
    for op, dur in per_instr.most_common(top):
        lines.append(f"{dur / 1e3:8.2f}  {op}\n          {longs[op][:300]}")
    return "\n".join(lines)


if __name__ == "__main__":
    logdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jaxtrace"
    print(summarize(logdir))
    if "--fusions" in sys.argv:
        print(top_fusion_details(logdir))
    if "--instances" in sys.argv:
        print(instances(logdir, top=50))
