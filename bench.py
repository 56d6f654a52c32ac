"""Headline benchmark: frames/sec/chip for 49-frame 320x480
occupancy-conditioned generation with the 2B ControlDiT, 50 DPM steps
(BASELINE.md generation config; eval configs run guidance_scale=1.0 so no
CFG batch).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference publishes no numbers (BASELINE.md), so the
denominator is an engineering estimate of the reference stack on one
A100-80GB: ~7.4e13 transformer FLOPs/step-call at ~40% MFU of 312 bf16
TFLOP/s (torch SDPA + diffusers, no compile) -> 0.59s/call -> 50 calls +
~2s VAE decode -> ~1.55 f/s. Both numbers use the same counting, so the
ratio tracks the BASELINE.json north-star (>=2x A100).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

# Persistent compilation cache: compiles through the remote tunnel cost
# 40-300s each; the cache survives across processes so the driver's runs
# reuse this session's compiles.
jax.config.update("jax_compilation_cache_dir", str(__import__("pathlib").Path(__file__).parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


from orv_tpu.models import ControlDiT, DiTConfig
from orv_tpu.models.vae import CausalVAE, VAEConfig

A100_BASELINE_FPS = 1.55

NUM_FRAMES = 49
HEIGHT, WIDTH = 320, 480
LATENT_F, LATENT_H, LATENT_W = 13, 40, 60
STEPS = 50
INNER_ITERS = 10  # forwards per timed device-side loop
TRIALS = 3  # take the min (the tunneled chip is noisy)


def _bench_transformer():
    cfg = DiTConfig(
        num_attention_heads=30, attention_head_dim=64, num_layers=30,
        in_channels=32, out_channels=16, text_embed_dim=4096, time_embed_dim=512,
        modulate_encoder_hidden_states=True, visual_guidance=True,
    )
    model = ControlDiT(cfg, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    B = 1  # guidance_scale 1.0 in the reference eval configs -> no CFG batch
    x = jax.random.normal(jax.random.PRNGKey(0), (B, LATENT_F, 32, LATENT_H, LATENT_W),
                          dtype=jnp.bfloat16)
    enc = jax.random.normal(jax.random.PRNGKey(1), (B, 226, 4096), dtype=jnp.bfloat16)
    acts = jax.random.normal(jax.random.PRNGKey(2), (B, 48, 7), dtype=jnp.bfloat16)
    depths = jax.random.normal(jax.random.PRNGKey(3), x.shape, dtype=jnp.bfloat16)
    labels = jax.random.normal(jax.random.PRNGKey(4), x.shape, dtype=jnp.bfloat16)
    t = jnp.full((B,), 999, dtype=jnp.int32)

    print("bench: init DiT...", file=sys.stderr, flush=True)
    params = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), x, enc, t, actions=acts, depths=depths, labels=labels
    ))()
    jax.block_until_ready(params)

    @jax.jit
    def loop(p, lat):
        def body(c, _):
            out, _, _ = model.apply(p, c, enc, t, actions=acts, depths=depths,
                                    labels=labels)
            # feed output back (keeps the loop un-elidable); re-concat image half
            c2 = jnp.concatenate([out.astype(c.dtype), c[:, :, 16:]], axis=2)
            return c2, ()
        c, _ = jax.lax.scan(body, lat, None, length=INNER_ITERS)
        return c.sum()

    print("bench: compiling DiT loop...", file=sys.stderr, flush=True)
    float(loop(params, x))  # compile
    print("bench: timing DiT...", file=sys.stderr, flush=True)
    best = float("inf")
    for i in range(TRIALS):
        xx = x * (1.0 + (i + 1) * 1e-6)  # vary inputs: the tunnel dedups
        t0 = time.time()
        float(loop(params, xx))
        best = min(best, (time.time() - t0) / INNER_ITERS)
    return best


def _bench_vae():
    # VAE decode cost (conv-cached temporal chunks — full-res 49x320x480
    # activations exceed HBM in one shot; chunked decode beats spatial
    # tiling 2x on v5e because convs keep the full spatial extent)
    vae = CausalVAE(VAEConfig(), dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    z = jax.random.normal(jax.random.PRNGKey(5), (1, 16, LATENT_F, LATENT_H, LATENT_W))
    vparams = jax.jit(lambda: vae.init(jax.random.PRNGKey(0), z[:, :, :1, :8, :8],
                                       method=vae.decode))()
    from orv_tpu.models.vae import decode_chunked
    print("bench: compiling chunked VAE decode...", file=sys.stderr, flush=True)
    jax.block_until_ready(decode_chunked(vae, vparams, z, chunk_latent_frames=6))
    vae_time = float("inf")
    for i in range(2):
        zz = z * (1.0 + (i + 1) * 1e-6)  # vary inputs: the tunnel dedups
        t0 = time.time()
        jax.block_until_ready(decode_chunked(vae, vparams, zz, chunk_latent_frames=6))
        vae_time = min(vae_time, time.time() - t0)

    return vae_time


def _run_phase_subprocess(phase: str) -> float:
    """Each phase runs in its own process: the tunneled TPU backend does not
    reliably return HBM freed mid-process, so phase isolation keeps the VAE
    phase from inheriting the DiT's reservation."""
    import subprocess

    out = subprocess.run(
        [sys.executable, __file__, "--phase", phase],
        capture_output=True, text=True,
    )
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-2000:])
        raise RuntimeError(f"phase {phase} failed (rc={out.returncode})")
    return float(out.stdout.strip().splitlines()[-1])


def main():
    if len(sys.argv) > 2 and sys.argv[1] == "--phase":
        phase = sys.argv[2]
        val = _bench_transformer() if phase == "transformer" else _bench_vae()
        print(val)
        return
    def retry(phase, n=2):
        last = None
        for _ in range(n):
            try:
                return _run_phase_subprocess(phase)
            except Exception as e:  # noqa: BLE001
                last = e
        raise last

    best = retry("transformer")
    vae_time = retry("vae")
    total = STEPS * best + vae_time
    fps = NUM_FRAMES / total
    print(json.dumps({
        "metric": "frames/sec/chip (49x320x480 occupancy-conditioned, 2B DiT, 50-step)",
        "value": round(fps, 4),
        "unit": "frames/s",
        "vs_baseline": round(fps / A100_BASELINE_FPS, 4),
        "detail": {
            "transformer_step_s": round(best, 4),
            "vae_decode_s": round(vae_time, 4),
            "total_s": round(total, 2),
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
