"""Profile ONE chunked-VAE-decode dispatch on the TPU and print the top
device-time fusions — the decode-side sibling of profile_step.py (same
vm.trace recipe). Use it to see where the non-conv milliseconds go
(GroupNorm passes, upsample interleaves, relayouts) before guessing at
kernels.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/profile_decode.py [chunk]
"""

import sys
import tempfile
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def main():
    sys.path.insert(0, "/root/repo")
    from orv_tpu.models.vae import CausalVAE, VAEConfig, decode_chunked

    vae = CausalVAE(VAEConfig(), dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    z = jax.random.normal(jax.random.PRNGKey(5), (1, 16, 13, 40, 60))
    params = jax.jit(lambda: vae.init(jax.random.PRNGKey(0), z[:, :, :1, :8, :8],
                                      method=vae.decode))()
    # descend the chunk ladder on RESOURCE_EXHAUSTED: under a co-tenant HBM
    # hold the per-fusion picture from a chunk-4/2 decode still answers
    # "where do the non-conv milliseconds go"
    ladder = [int(sys.argv[1])] if len(sys.argv) > 1 else [6, 4, 2]
    run = None
    for chunk in ladder:
        try:
            run = lambda x, c=chunk: decode_chunked(vae, params, x,
                                                    chunk_latent_frames=c)
            print(f"compile (chunk {chunk})...", file=sys.stderr, flush=True)
            float(run(z).sum())
            break
        except Exception as e:  # noqa: BLE001 — OOM under co-tenant pressure
            print(f"chunk {chunk} failed: {type(e).__name__} — descending",
                  file=sys.stderr, flush=True)
            run = None
    if run is None:
        print("every chunk rung failed", file=sys.stderr)
        sys.exit(1)
    times = []
    for i in range(3):
        t0 = time.time()
        float(run(z * (1 + (i + 1) * 1e-6)).sum())  # vary: the tunnel dedups
        times.append(time.time() - t0)
    print(f"decode (chunk {chunk}): min {min(times):.3f} s over {len(times)} trials")  # noqa: F821 — chunk bound by the successful rung

    d = tempfile.mkdtemp(prefix="orvdecprof_")
    with jax.profiler.trace(d):
        float(run(z * 1.000123).sum())
    sys.path.insert(0, "/root/repo/scripts")
    from _trace_report import leaf_totals, report
    totals = leaf_totals(d)
    if totals is None:
        print("no trace captured", file=sys.stderr)
        return
    report(totals)


if __name__ == "__main__":
    main()
