"""Headline benchmark: frames/sec/chip for 49-frame 320x480
occupancy-conditioned generation with the 2B ControlDiT (BASELINE.md
generation config; the reference eval configs run guidance_scale=1.0 so
there is no CFG batch).

The inference figure is the REAL serving path: `make_sampler`'s jitted
50-step DPM denoise scan (scheduler math, noise injection, per-step
image-latent concat — pipelines/sample.py) on the int8-serving model
(W8A8 linears + int8-QK^T flash attention, models/quantize.py), plus the
conv-cached chunked VAE decode. A train-throughput phase (fwd+bwd+adamw,
remat) is reported in `detail`.

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


A100_BASELINE_FPS = 1.55

NUM_FRAMES = 49
HEIGHT, WIDTH = 320, 480
LATENT_F, LATENT_H, LATENT_W = 13, 40, 60
STEPS = 50
TRIALS = 3  # take the min (the tunneled chip is noisy)


def _flagship_model(quant: bool):
    from orv_tpu.models import ControlDiT, DiTConfig

    cfg = DiTConfig(
        num_attention_heads=30, attention_head_dim=64, num_layers=30,
        in_channels=32, out_channels=16, text_embed_dim=4096, time_embed_dim=512,
        modulate_encoder_hidden_states=True, visual_guidance=True,
    )
    return ControlDiT(
        cfg, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
        attn_impl="flash_q8" if quant else "flash", quant=quant,
    )


def _bench_sampler():
    """Full 50-step denoise via the real jitted sampler scan."""
    from orv_tpu.pipelines.sample import SamplerConfig, make_sampler
    from orv_tpu.schedulers import make_schedule

    model = _flagship_model(quant=True)
    B = 1  # guidance_scale 1.0 in the reference eval configs -> no CFG batch
    key = jax.random.PRNGKey
    lat = jax.random.normal(key(0), (B, LATENT_F, 16, LATENT_H, LATENT_W), jnp.float32)
    img = jax.random.normal(key(1), lat.shape, jnp.bfloat16)  # pre-padded image latents
    enc = jax.random.normal(key(2), (B, 226, 4096), jnp.bfloat16)
    acts = jax.random.normal(key(3), (B, 48, 7), jnp.bfloat16)
    dep = jax.random.normal(key(4), (B, LATENT_F, 32, LATENT_H, LATENT_W), jnp.bfloat16)
    lab = jax.random.normal(key(5), dep.shape, jnp.bfloat16)

    print("bench: init quantized DiT...", file=sys.stderr, flush=True)
    t0 = jnp.full((B,), 999, jnp.int32)
    params = jax.jit(lambda: model.init(
        key(0), jnp.concatenate([lat, lat], 2).astype(jnp.bfloat16), enc, t0,
        actions=acts, depths=dep, labels=lab,
    ))()
    jax.block_until_ready(params)

    sampler = make_sampler(model.apply, make_schedule(),
                           SamplerConfig(num_inference_steps=STEPS))
    run = jax.jit(lambda p, l, r: sampler(p, l, img, enc, r, actions=acts,
                                          depths=dep, labels=lab))
    print("bench: compiling sampler scan...", file=sys.stderr, flush=True)
    jax.block_until_ready(run(params, lat, key(10)))
    best = float("inf")
    for i in range(TRIALS):
        ll = lat * (1.0 + (i + 1) * 1e-6)  # vary inputs: the tunnel dedups
        t_start = time.time()
        out = run(params, ll, key(11 + i))
        float(out.sum())  # force full materialization (block_until_ready can return early)
        best = min(best, time.time() - t_start)
    return best


def _bench_vae():
    # VAE decode cost (conv-cached temporal chunks — full-res 49x320x480
    # activations exceed HBM in one shot; chunked decode beats spatial
    # tiling 2x on v5e because convs keep the full spatial extent)
    from orv_tpu.models.vae import CausalVAE, VAEConfig, decode_chunked

    vae = CausalVAE(VAEConfig(), dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    z = jax.random.normal(jax.random.PRNGKey(5), (1, 16, LATENT_F, LATENT_H, LATENT_W))
    vparams = jax.jit(lambda: vae.init(jax.random.PRNGKey(0), z[:, :, :1, :8, :8],
                                       method=vae.decode))()
    chunk = int(sys.argv[3]) if len(sys.argv) > 3 else 6
    if chunk == 0:
        # last-resort rung: spatially tiled decode (~2GB peak — ~4x less
        # than chunk 4) for windows where the co-tenant's HBM hold makes
        # every frame-chunked variant crawl. ~2x slower on a quiet chip.
        from orv_tpu.models.vae import tiled_decode

        print("bench: compiling tiled VAE decode...", file=sys.stderr, flush=True)
        decode_fn = jax.jit(lambda zt: vae.apply(vparams, zt, method=vae.decode))
        run = lambda x: tiled_decode(decode_fn, x, tile_latent_h=24, tile_latent_w=32)
    else:
        print(f"bench: compiling chunked VAE decode (chunk {chunk})...",
              file=sys.stderr, flush=True)
        # NOT fused: the single-dispatch variant compiles at 15.9G of 15.75G
        # HBM and the runtime thrashes (340s observed) — see vae.decode_chunked
        run = lambda x: decode_chunked(vae, vparams, x, chunk_latent_frames=chunk)
    jax.block_until_ready(run(z))
    # time-budgeted min-of-N: co-tenant kernels time-slice against the big
    # convs, so individual trials swing 1.7s..25s — keep trialing until a
    # quiet window lands or the budget runs out
    vae_time = float("inf")
    deadline = time.time() + 150.0
    i = 0
    while True:
        i += 1
        zz = z * (1.0 + i * 1e-6)  # vary inputs: the tunnel dedups
        t0 = time.time()
        out = run(zz)
        float(out.sum())  # force materialization
        vae_time = min(vae_time, time.time() - t0)
        if (i >= 3 and vae_time < 4.0) or time.time() > deadline:
            return vae_time


def _bench_train():
    """Training throughput: fwd+bwd+adamw step seconds for the largest
    recipe that fits one v5e chip's 16GB HBM. The flagship 2B with full
    Adam state does not fit a single chip in ANY framework (the reference
    shards it over 8xA100 with DeepSpeed), so this phase runs the
    reference's 1.4B-from-scratch recipe (traj_image_1.4b_scratch.yaml:
    28 layers x 1792, rope, 17-frame 480x320 clips) with bf16 params and
    bf16 Adam moments, per-block remat, batch 1."""
    from orv_tpu.models import ControlDiT, DiTConfig
    from orv_tpu.parallel import TrainState, make_lr_schedule, make_optimizer, make_train_step
    from orv_tpu.schedulers import make_schedule
    from orv_tpu.utils.embeddings import prepare_rotary_positional_embeddings

    cfg = DiTConfig(
        num_attention_heads=28, attention_head_dim=64, num_layers=28,
        in_channels=32, out_channels=16, text_embed_dim=4096, time_embed_dim=512,
        sample_width=60, sample_height=40, sample_frames=17,
        use_rotary_positional_embeddings=True,
        modulate_encoder_hidden_states=False, recon_action=True,
    )
    model = ControlDiT(cfg, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16, remat=True,
                       remat_policy="dots")  # saves matmul outputs: 461->442ms, fits HBM
    B, F, C, H, W = 1, 5, 16, 40, 60  # 17 frames @ 320x480 latent
    key = jax.random.PRNGKey
    batch = {
        "latents": jax.random.normal(key(0), (B, 2 * C, F, H, W)) * 0.5,
        "image_latents": jax.random.normal(key(1), (B, 2 * C, 1, H, W)) * 0.5,
        "prompt_embeds": jax.random.normal(key(2), (B, 226, 4096), jnp.bfloat16),
        "actions": jax.random.normal(key(3), (B, F * 4 - 4, 7)) * 0.1,
    }
    rope = prepare_rotary_positional_embeddings(
        height=HEIGHT, width=WIDTH, num_frames=F,
        attention_head_dim=cfg.attention_head_dim,
        base_height=320, base_width=480,
    )
    print("bench: init 1.4B train model...", file=sys.stderr, flush=True)
    params = jax.jit(lambda: model.init(
        {"params": key(0), "action_mask": key(1)},
        batch["latents"][:, :C].transpose(0, 2, 1, 3, 4).astype(jnp.bfloat16).repeat(2, 2),
        batch["prompt_embeds"], jnp.zeros((B,), jnp.int32),
        actions=batch["actions"], image_rotary_emb=rope, deterministic=False,
    ))()
    jax.block_until_ready(params)

    tx = make_optimizer(make_lr_schedule(warmup_steps=0, total_steps=1000))
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=tx.init(params))
    step = make_train_step(model.apply, tx, make_schedule(), recon_action=True,
                           image_rotary_emb=rope)
    print("bench: compiling train step...", file=sys.stderr, flush=True)
    state, m = step(state, batch, key(42))
    jax.block_until_ready(state.params)
    best = float("inf")
    for i in range(TRIALS):
        b2 = dict(batch)
        b2["latents"] = batch["latents"] * (1.0 + (i + 1) * 1e-6)
        t0 = time.time()
        state, m = step(state, b2, key(43 + i))
        float(m["loss"])
        best = min(best, time.time() - t0)
    return best


def _run_phase_subprocess(phase: str, extra=()) -> float:
    """Each phase runs in its own process: the tunneled TPU backend does not
    reliably return HBM freed mid-process, so phase isolation keeps the VAE
    phase from inheriting the DiT's reservation (and lets OOM fallbacks
    start from a clean allocator)."""
    import subprocess

    out = subprocess.run(
        [sys.executable, __file__, "--phase", phase, *map(str, extra)],
        capture_output=True, text=True,
    )
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-2000:])
        raise RuntimeError(f"phase {phase} failed (rc={out.returncode})")
    return float(out.stdout.strip().splitlines()[-1])


def main():
    if len(sys.argv) > 2 and sys.argv[1] == "--phase":
        phase = sys.argv[2]
        fn = {"sampler": _bench_sampler, "vae": _bench_vae, "train": _bench_train}[phase]
        print(fn())
        return

    def retry(phase, n=3, attempts_extra=None, sane=None):
        """Run the phase in fresh subprocesses until a sane timing lands.
        The chip is multi-tenant: a window can be contended enough to
        produce 10x-slow (but 'successful') numbers — treat those as
        retryable and keep the best value observed."""
        last_err, best = None, None
        for attempt in range(n):
            try:
                extra = () if attempts_extra is None else attempts_extra[
                    min(attempt, len(attempts_extra) - 1)]
                val = _run_phase_subprocess(phase, extra)
                best = val if best is None else min(best, val)
                if sane is None or best <= sane:
                    return best
                print(f"bench: {phase} took {val:.2f}s (contended window?) — retrying",
                      file=sys.stderr, flush=True)
            except Exception as e:  # noqa: BLE001
                last_err = e
            if attempt + 1 < n:
                time.sleep(90)  # contended/held-HBM windows usually pass
        if best is not None:
            return best  # all windows were slow: report the best, honestly
        raise last_err

    # sanity ceilings ~2x the known-good quiet-window numbers
    sampler_s = retry("sampler", sane=25.0)
    # decode chunk 6 is fastest but needs ~10GB HBM; when another tenant
    # holds memory, fall back to smaller chunks in FRESH subprocesses
    # (freed HBM does not return mid-process on this backend)
    # chunk 4 peaks ~7GB HBM (vs ~10 for chunk 6) — resilient to the
    # co-tenant's typical memory holds at a ~10% quiet-time cost; chunk 0
    # = spatially tiled decode (~2GB peak), the last-resort rung
    vae_time = retry("vae", n=6,
                     attempts_extra=[(6,), (4,), (4,), (6,), (2,), (0,)],
                     sane=4.0)
    try:
        train_s = retry("train", sane=1.0)
    except Exception:  # noqa: BLE001 — train phase is informational
        train_s = None
    total = sampler_s + vae_time
    fps = NUM_FRAMES / total
    detail = {
        "sampler_s": round(sampler_s, 3),
        "per_step_s": round(sampler_s / STEPS, 4),
        "vae_decode_s": round(vae_time, 3),
        # the chip is multi-tenant: when every retry window was slow the
        # decode figure reflects co-tenant load, not this code (quiet-window
        # decode is ~1.7s; the sampler/train phases are contention-stable)
        "vae_contended_window": bool(vae_time > 4.0),
        "total_s": round(total, 2),
        "serving_config": "int8 W8A8 linears + int8-QK^T flash attention (bf16: models default)",
        "device": str(jax.devices()[0]),
    }
    if train_s is not None:
        detail["train_step_s_1p4b_17f"] = round(train_s, 3)
        # 17-frame 480x320 clip -> 5*20*30 = 3000 video tokens + 226 text
        detail["train_tokens_per_s"] = round(3226 / train_s)
    print(json.dumps({
        "metric": "frames/sec/chip (49x320x480 occupancy-conditioned, 2B DiT, 50-step sampler)",
        "value": round(fps, 4),
        "unit": "frames/s",
        "vs_baseline": round(fps / A100_BASELINE_FPS, 4),
        "detail": detail,
    }))


if __name__ == "__main__":
    main()
