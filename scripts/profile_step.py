"""Profile ONE flagship serving model call on the TPU and print the top
device-time fusions (the round-2 recipe that found the Dv=128 PV padding
bug: wrap a single dispatch in jax.profiler.trace, then parse the
vm.trace.json.gz traceEvents from the pid whose process_name mentions TPU).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/profile_step.py [--bf16]
"""

import glob
import gzip
import json
import sys
import tempfile
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def main():
    quant = "--bf16" not in sys.argv
    sys.path.insert(0, "/root/repo")
    from bench_phases import LATENT_F, LATENT_H, LATENT_W, _flagship_model

    model = _flagship_model(quant=quant)
    B = 1
    key = jax.random.PRNGKey
    lat = jax.random.normal(key(0), (B, LATENT_F, 32, LATENT_H, LATENT_W), jnp.bfloat16)
    enc = jax.random.normal(key(2), (B, 226, 4096), jnp.bfloat16)
    acts = jax.random.normal(key(3), (B, 48, 7), jnp.bfloat16)
    dep = jax.random.normal(key(4), lat.shape, jnp.bfloat16)
    lab = jax.random.normal(key(5), lat.shape, jnp.bfloat16)
    t = jnp.full((B,), 999, jnp.int32)
    print("init...", file=sys.stderr, flush=True)
    params = jax.jit(lambda: model.init(key(0), lat, enc, t, actions=acts,
                                        depths=dep, labels=lab))()
    jax.block_until_ready(params)

    fwd = jax.jit(lambda p, x: model.apply(p, x, enc, t, actions=acts,
                                           depths=dep, labels=lab)[0])
    print("compile...", file=sys.stderr, flush=True)
    float(fwd(params, lat).sum())
    # timed (vary input: the tunnel dedups identical dispatches)
    times = []
    for i in range(3):
        t0 = time.time()
        float(fwd(params, lat * (1 + (i + 1) * 1e-6)).sum())
        times.append(time.time() - t0)
    print(f"model call: min {min(times)*1e3:.1f} ms over {len(times)} trials")

    d = tempfile.mkdtemp(prefix="orvprof_")
    with jax.profiler.trace(d):
        float(fwd(params, lat * 1.000123).sum())
    traces = glob.glob(f"{d}/plugins/profile/*/*.trace.json.gz")
    if not traces:
        print("no trace captured", file=sys.stderr)
        return
    with gzip.open(traces[0], "rt") as f:
        data = json.load(f)
    ev = data.get("traceEvents", [])
    tpu_pids = {e["pid"] for e in ev
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in str(e.get("args", {}).get("name", ""))}
    totals = {}
    for e in ev:
        if e.get("ph") == "X" and e.get("pid") in tpu_pids:
            totals[e["name"]] = totals.get(e["name"], 0.0) + e.get("dur", 0.0)
    total_us = sum(totals.values())
    print(f"\ndevice total: {total_us/1e3:.2f} ms across {len(totals)} op names")
    for name, us in sorted(totals.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {us/1e3:9.3f} ms  {us/total_us*100:5.1f}%  {name[:100]}")


if __name__ == "__main__":
    main()
