"""Shared device-trace reporting for the on-chip profilers.

The vm.trace.json.gz written by jax.profiler.trace (works through the axon
tunnel — proven on the Dv=128 PV padding bug in round 2) mixes hierarchy
levels: module spans ("jit_*", a bare number) and while-loop spans
("while.N") CONTAIN the leaf fusions, so summing every X event
double-counts ~3-4x. This helper keeps leaf ops only and rolls them up
into categories so a profile answers "where does the time go" directly.
"""

import glob
import gzip
import json


def _is_container(name):
    return (name.startswith("jit_") or name.startswith("while")
            or name.replace(".", "").isdigit())


def _category(name):
    if name.startswith("attn"):
        return "attention (Pallas fwd+bwd kernels)"
    if "dynamic-update-slice" in name or "dynamic_update" in name:
        return "scan stacking (saved-activation dus)"
    if "convolution" in name:
        return "convolution"
    if "dynamic-slice" in name or "dynamic_slice" in name:
        return "scan unstacking (dynamic-slice)"
    if ".remat" in name:
        return "remat recompute fusions"
    if name.startswith(("fusion", "loop_fusion", "input_fusion",
                        "output_fusion")):
        return "XLA fusions (matmuls + fused elementwise)"
    if "reduce" in name:
        return "reductions (norms/stats)"
    if "copy" in name or "bitcast" in name or "transpose" in name:
        return "layout copies/transposes"
    if "all-reduce" in name or "all-gather" in name or "collective" in name:
        return "collectives"
    return "other"


def leaf_totals(trace_dir):
    """Parse the newest vm trace under trace_dir -> {leaf op name: usec}."""
    traces = glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz")
    if not traces:
        return None
    with gzip.open(traces[0], "rt") as f:
        data = json.load(f)
    ev = data.get("traceEvents", [])
    tpu_pids = {e["pid"] for e in ev
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in str(e.get("args", {}).get("name", ""))}
    totals = {}
    for e in ev:
        if (e.get("ph") == "X" and e.get("pid") in tpu_pids
                and not _is_container(e["name"])):
            totals[e["name"]] = totals.get(e["name"], 0.0) + e.get("dur", 0.0)
    return totals


def report(totals, top=30):
    """Print category rollup + top leaf ops for a leaf_totals() dict."""
    total_us = sum(totals.values())
    print(f"\ndevice leaf total: {total_us/1e3:.2f} ms "
          f"across {len(totals)} op names (containers excluded)")
    cats = {}
    for name, us in totals.items():
        c = _category(name)
        cats[c] = cats.get(c, 0.0) + us
    print("category rollup:")
    for c, us in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"  {us/1e3:9.3f} ms  {us/total_us*100:5.1f}%  {c}")
    print("top leaf ops:")
    for name, us in sorted(totals.items(), key=lambda kv: -kv[1])[:top]:
        print(f"  {us/1e3:9.3f} ms  {us/total_us*100:5.1f}%  {name[:110]}")
