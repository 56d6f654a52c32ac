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

Prints JSON lines {"metric", "value", "unit", "vs_baseline", ...} —
**the last line printed is the result**. The chip is multi-tenant and the
driver enforces an outer timeout, so this script is deadline-proof:

- a best-so-far JSON line is printed at startup (from `.bench_cache.json`,
  marked stale) and again after EVERY completed phase, so a kill at any
  point leaves a parseable result;
- one global wall-clock budget (ORV_TPU_BENCH_BUDGET_S, default 840s)
  bounds everything; phases that didn't run are listed in `"incomplete"`;
- RESOURCE_EXHAUSTED descends the VAE chunk ladder (6->4->2->tiled)
  immediately in a fresh subprocess — no sleeps;
- quiet-window timings persist in `.bench_cache.json`; when the current
  window never goes quiet the cached value is reported with a per-phase
  `"stale"` flag instead of a garbage contended number;
- every cache entry is fingerprinted on the source files + ORV_TPU_* knobs
  that produce it: editing e.g. models/vae.py invalidates the cached decode
  number, so a regression is measured and reported, never masked by a
  historical best from code that no longer runs.

vs_baseline: the reference publishes no numbers (BASELINE.md), so the
denominator is an engineering estimate of the reference stack on one
A100-80GB: ~7.4e13 transformer FLOPs/step-call at ~40% MFU of 312 bf16
TFLOP/s (torch SDPA + diffusers, no compile) -> 0.59s/call -> 50 calls +
~2s VAE decode -> ~1.55 f/s. Both numbers use the same counting, and the
JSON carries `"baseline_is_estimate": true` so the ratio is never
mistaken for a measured-vs-measured figure.
"""

import hashlib
import json
import os
import pathlib
import subprocess
import sys
import time

import jax
import jax.numpy as jnp

# Persistent compilation cache: compiles through the remote tunnel cost
# 40-300s each; the cache survives across processes so the driver's runs
# reuse this session's compiles.
jax.config.update("jax_compilation_cache_dir", str(pathlib.Path(__file__).parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


A100_BASELINE_FPS = 1.55

NUM_FRAMES = 49
HEIGHT, WIDTH = 320, 480
LATENT_F, LATENT_H, LATENT_W = 13, 40, 60
STEPS = 50

START = time.time()
GLOBAL_BUDGET_S = float(os.environ.get("ORV_TPU_BENCH_BUDGET_S", "840"))
CACHE_PATH = pathlib.Path(__file__).parent / ".bench_cache.json"

# quiet-window sanity ceilings (~2x known-good): timings above these mean
# the window was contended and the value is not representative
SANE = {"sampler": 25.0, "sampler_pab": 25.0, "vae": 4.0, "train": 1.0, "encode": 8.0}

_PHASE_KEY = {"sampler": "sampler_s", "sampler_pab": "sampler_pab_s",
              "vae": "vae_decode_s", "train": "train_step_s",
              "encode": "vae_encode_s"}

# Cache fingerprinting: each cached timing is keyed on a hash of the source
# files + env knobs that produce it, so a code change invalidates the cached
# number instead of being masked by a historical best (min() across
# different code versions is not a metric). bench.py itself is included in
# every phase: the phase function IS the measurement definition.
_REPO = pathlib.Path(__file__).parent
_COMMON_SRC = ["bench.py", "orv_tpu/models/dit.py", "orv_tpu/models/layers.py",
               "orv_tpu/ops/attention.py", "orv_tpu/ops/adaln.py"]
_SAMPLER_SRC = _COMMON_SRC + ["orv_tpu/models/quantize.py",
                              "orv_tpu/pipelines/sample.py",
                              "orv_tpu/schedulers/scheduling.py"]
_PHASE_DEPS = {
    "sampler": (_SAMPLER_SRC, ["ORV_TPU_FUSED_ADALN"]),
    "sampler_pab": (_SAMPLER_SRC, ["ORV_TPU_FUSED_ADALN"]),
    "vae": (["bench.py", "orv_tpu/models/vae.py"],
            ["ORV_TPU_UPSAMPLE_PHASE", "ORV_TPU_CONV3D_TAPS"]),
    "encode": (["bench.py", "orv_tpu/models/vae.py"], ["ORV_TPU_CONV3D_TAPS"]),
    "train": (_COMMON_SRC + ["orv_tpu/parallel/train_step.py"],
              ["ORV_TPU_FUSED_ADALN"]),
}


def _fingerprint(phase: str) -> str:
    files, envs = _PHASE_DEPS[phase]
    h = hashlib.sha256()
    for f in sorted(files):
        try:
            h.update((_REPO / f).read_bytes())
        except OSError:
            h.update(b"<missing>")
        h.update(b"\0")
    for e in sorted(envs):
        h.update(f"{e}={os.environ.get(e, '')}".encode())
    return h.hexdigest()[:12]


def _remaining() -> float:
    return GLOBAL_BUDGET_S - (time.time() - START)


def _trial_budget() -> float:
    """Per-phase in-subprocess trial budget (seconds), from env."""
    return float(os.environ.get("ORV_TPU_BENCH_TRIAL_BUDGET_S", "60"))


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
    deadline = time.time() + _trial_budget()
    for i in range(3):
        ll = lat * (1.0 + (i + 1) * 1e-6)  # vary inputs: the tunnel dedups
        t_start = time.time()
        out = run(params, ll, key(11 + i))
        float(out.sum())  # force full materialization (block_until_ready can return early)
        best = min(best, time.time() - t_start)
        if time.time() > deadline:
            break
    return best


def _bench_sampler_pab():
    """Detail-only: the 50-step sampler with PAB attention broadcast
    (pab_skip=2, window [0.1, 0.85) — 24 of 50 steps reuse cached
    attention). An APPROXIMATE serving mode (sample.py SamplerConfig);
    the headline number stays the exact sampler."""
    from orv_tpu.pipelines.sample import SamplerConfig, make_sampler
    from orv_tpu.schedulers import make_schedule

    model = _flagship_model(quant=True)
    B = 1
    key = jax.random.PRNGKey
    lat = jax.random.normal(key(0), (B, LATENT_F, 16, LATENT_H, LATENT_W), jnp.float32)
    img = jax.random.normal(key(1), lat.shape, jnp.bfloat16)
    enc = jax.random.normal(key(2), (B, 226, 4096), jnp.bfloat16)
    acts = jax.random.normal(key(3), (B, 48, 7), jnp.bfloat16)
    dep = jax.random.normal(key(4), (B, LATENT_F, 32, LATENT_H, LATENT_W), jnp.bfloat16)
    lab = jax.random.normal(key(5), dep.shape, jnp.bfloat16)

    print("bench: init quantized DiT (pab)...", file=sys.stderr, flush=True)
    t0 = jnp.full((B,), 999, jnp.int32)
    params = jax.jit(lambda: model.init(
        key(0), jnp.concatenate([lat, lat], 2).astype(jnp.bfloat16), enc, t0,
        actions=acts, depths=dep, labels=lab,
    ))()
    jax.block_until_ready(params)

    sampler = make_sampler(model.apply, make_schedule(),
                           SamplerConfig(num_inference_steps=STEPS, pab_skip=2))
    run = jax.jit(lambda p, l, r: sampler(p, l, img, enc, r, actions=acts,
                                          depths=dep, labels=lab))
    print("bench: compiling pab sampler scan (two model variants)...",
          file=sys.stderr, flush=True)
    jax.block_until_ready(run(params, lat, key(10)))
    best = float("inf")
    deadline = time.time() + _trial_budget()
    for i in range(3):
        ll = lat * (1.0 + (i + 1) * 1e-6)
        t_start = time.time()
        out = run(params, ll, key(11 + i))
        float(out.sum())
        best = min(best, time.time() - t_start)
        if time.time() > deadline:
            break
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
    deadline = time.time() + _trial_budget()
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


def _bench_encode():
    """Optional phase (ORV_TPU_BENCH_ENCODE=1): streaming chunked VAE encode
    of a 49x320x480 clip — the offline-latent / raw-pixel-eval ingest cost
    (reference frame-batched vae._encode, encode_dataset.py:793-927). Not in
    the headline f/s (generation = sampler + decode); reported in detail."""
    from orv_tpu.models.vae import CausalVAE, VAEConfig, encode_chunked

    vae = CausalVAE(VAEConfig(), dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    video = jax.random.normal(jax.random.PRNGKey(7),
                              (1, 3, NUM_FRAMES, HEIGHT, WIDTH), jnp.bfloat16)
    vparams = jax.jit(lambda: vae.init(jax.random.PRNGKey(0), video[:, :, :1, :8, :8],
                                       method=vae.encode))()
    chunk = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    print(f"bench: compiling chunked VAE encode (chunk {chunk})...",
          file=sys.stderr, flush=True)
    run = lambda x: encode_chunked(vae, vparams, x, chunk_frames=chunk)
    jax.block_until_ready(run(video))
    best = float("inf")
    deadline = time.time() + _trial_budget()
    i = 0
    while True:
        i += 1
        vv = video * (1.0 + i * 1e-6)  # vary inputs: the tunnel dedups
        t0 = time.time()
        out = run(vv)
        float(out.sum())  # force materialization
        best = min(best, time.time() - t0)
        if (i >= 3 and best < SANE["encode"]) or time.time() > deadline:
            break
    return best


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
    deadline = time.time() + _trial_budget()
    for i in range(3):
        b2 = dict(batch)
        b2["latents"] = batch["latents"] * (1.0 + (i + 1) * 1e-6)
        t0 = time.time()
        state, m = step(state, b2, key(43 + i))
        float(m["loss"])
        best = min(best, time.time() - t0)
        if time.time() > deadline:
            break
    return best


class _PhaseOOM(RuntimeError):
    pass


def _run_phase_subprocess(phase: str, extra=(), timeout=None) -> float:
    """Each phase runs in its own process: the tunneled TPU backend does not
    reliably return HBM freed mid-process, so phase isolation keeps the VAE
    phase from inheriting the DiT's reservation (and lets OOM fallbacks
    start from a clean allocator)."""
    try:
        out = subprocess.run(
            [sys.executable, __file__, "--phase", phase, *map(str, extra)],
            capture_output=True, text=True, timeout=timeout,
        )
    except subprocess.TimeoutExpired as e:
        tail = (e.stderr or b"")
        if isinstance(tail, bytes):
            tail = tail.decode(errors="replace")
        sys.stderr.write(tail[-1000:])
        raise RuntimeError(f"phase {phase} timed out after {timeout:.0f}s")
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-2000:])
        if "RESOURCE_EXHAUSTED" in out.stderr:
            raise _PhaseOOM(f"phase {phase} OOM (co-tenant HBM hold?)")
        raise RuntimeError(f"phase {phase} failed (rc={out.returncode})")
    return float(out.stdout.strip().splitlines()[-1])


def _load_cache() -> dict:
    """Load the v2 cache: {key: {"t": seconds, "fp": fingerprint}}.

    Legacy v1 entries (bare floats, no fingerprint) are migrated with
    fp=None, which never matches a current fingerprint — they surface as
    "cache entry for unknown code" and are replaced on first fresh
    measurement rather than min()-merged."""
    try:
        raw = json.loads(CACHE_PATH.read_text())
    except Exception:  # noqa: BLE001 — missing/corrupt cache is a cold start
        return {}
    cache = {}
    for k, v in raw.items():
        # "fresh" marks entries MEASURED BY THIS PROCESS (set when a phase
        # stores a timing, stripped before writing) — a loaded entry is by
        # definition not fresh, so it can never clobber a different-
        # fingerprint entry another process landed on disk meanwhile
        if isinstance(v, dict) and "t" in v:
            cache[k] = {"t": float(v["t"]), "fp": v.get("fp")}
        elif isinstance(v, (int, float)):
            cache[k] = {"t": float(v), "fp": None}
    return cache


def _cache_get(cache: dict, key: str, fp: str):
    """Cached timing for `key`, or None if absent or measured under a
    different code/env fingerprint (a stale-code number is worse than no
    number: it can mask a regression)."""
    ent = cache.get(key)
    if ent is None or ent.get("fp") != fp:
        return None
    return float(ent["t"])


def _save_cache(cache: dict) -> None:
    try:
        # merge with on-disk contents: another process may have written keys
        # this run never measured. min()-merge ONLY within the same
        # fingerprint — across code versions the in-memory (current-code)
        # entry wins outright, so a regression is reported, not hidden.
        on_disk = _load_cache()
        for k, v in on_disk.items():
            if k in cache:
                # *_rung entries record the last ladder rung that worked —
                # last observation wins, min() would pin the optimistic rung
                if cache[k].get("fp") == v.get("fp") and not k.endswith("_rung"):
                    cache[k] = {"t": min(cache[k]["t"], v["t"]), "fp": v.get("fp")}
            else:
                cache[k] = v
        CACHE_PATH.write_text(json.dumps(cache, indent=1) + "\n")
    except OSError:
        pass  # read-only checkout: cache is an optimization, not a requirement


_DEVICE_STR = None
_PROBE_FAILED = False  # last probe outcome (read by the dead-tunnel check)


def _device_str() -> str:
    # backend init goes through the tunnel and can fail OR HANG (observed
    # 2026-08-17: a dead tunnel leaves init in a retry loop that no
    # exception and no SIGALRM interrupts) — so the parent process must
    # never call jax.devices() itself. Probe in a killable subprocess.
    global _DEVICE_STR, _PROBE_FAILED
    if _DEVICE_STR is not None:
        return _DEVICE_STR
    try:
        out = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.devices()[0])"],
            capture_output=True, text=True, timeout=45.0,
        )
        if out.returncode == 0 and out.stdout.strip():
            _DEVICE_STR = out.stdout.strip().splitlines()[-1]  # cache success
            _PROBE_FAILED = False
            return _DEVICE_STR
        _PROBE_FAILED = True
        return "<unavailable: probe failed>"  # NOT cached: retry next emit
    except Exception as e:  # noqa: BLE001 — incl. TimeoutExpired on a hung tunnel
        _PROBE_FAILED = True
        return f"<unavailable: {type(e).__name__}>"  # NOT cached


_EMITTED = 0


def _emit(results: dict, cache: dict, incomplete: list) -> None:
    """Print one best-so-far JSON result line from measured + cached phase
    timings. Called after every phase (and once at startup) so that an
    outer kill at ANY point leaves a parseable last line."""
    global _EMITTED
    def get(phase: str):
        if phase in results:
            return results[phase], False
        # cached values count only under the CURRENT code fingerprint —
        # an entry measured on since-edited code is no value at all
        val = _cache_get(cache, _PHASE_KEY[phase], _fingerprint(phase))
        if val is not None:
            return val, True
        return None, False

    sampler_s, sampler_stale = get("sampler")
    vae_s, vae_stale = get("vae")
    train_s, train_stale = get("train")
    if sampler_s is None or vae_s is None:
        return  # nothing meaningful to report yet (cold cache, first phase)

    total = sampler_s + vae_s
    fps = NUM_FRAMES / total
    stale = [p for p, s in [("sampler", sampler_stale), ("vae", vae_stale)] if s]
    detail = {
        "sampler_s": round(sampler_s, 3),
        "per_step_s": round(sampler_s / STEPS, 4),
        "vae_decode_s": round(vae_s, 3),
        # the chip is multi-tenant: when every retry window was slow the
        # decode figure reflects co-tenant load, not this code (quiet-window
        # decode is ~1.7s; the sampler/train phases are contention-stable).
        # None = decode came from the cache this run, so the flag is not a
        # statement about the current window at all.
        "vae_contended_window": None if vae_stale else bool(vae_s > SANE["vae"]),
        "total_s": round(total, 2),
        "serving_config": "int8 W8A8 linears + int8-QK^T flash attention (bf16: models default)",
        "device": _device_str(),
        "elapsed_s": round(time.time() - START, 1),
    }
    if stale:
        # cached quiet-window timings (.bench_cache.json) substituted for
        # phases whose current window was contended or never ran
        detail["stale"] = stale
    if incomplete:
        detail["incomplete"] = list(incomplete)
    encode_s, encode_stale = get("encode")
    if encode_s is not None:
        detail["vae_encode_s"] = round(encode_s, 3)
        if encode_stale:
            detail.setdefault("stale", []).append("encode")
    pab_s, pab_stale = get("sampler_pab")
    if pab_s is not None:
        # APPROXIMATE serving mode (PAB attention broadcast, opt-in) —
        # informational only, never the headline value above
        detail["sampler_pab_s"] = round(pab_s, 3)
        detail["pab_frames_per_s"] = round(NUM_FRAMES / (pab_s + vae_s), 4)
        if pab_stale:
            detail.setdefault("stale", []).append("sampler_pab")
    if train_s is not None:
        detail["train_step_s_1p4b_17f"] = round(train_s, 3)
        # 17-frame 480x320 clip -> 5*20*30 = 3000 video tokens + 226 text
        detail["train_tokens_per_s"] = round(3226 / train_s)
        if train_stale:
            detail.setdefault("stale", []).append("train")
    _EMITTED += 1
    print(json.dumps({
        "metric": "frames/sec/chip (49x320x480 occupancy-conditioned, 2B DiT, 50-step sampler)",
        "value": round(fps, 4),
        "unit": "frames/s",
        "vs_baseline": round(fps / A100_BASELINE_FPS, 4),
        "baseline_is_estimate": True,
        "detail": detail,
    }), flush=True)


def _phase_with_retries(phase: str, cache: dict, ladder=None, max_attempts=3,
                        first_timeout=480.0) -> float | None:
    """Run `phase` in fresh subprocesses until a quiet-window (sane) timing
    lands, the attempts run out, or the global budget is exhausted.

    - RESOURCE_EXHAUSTED descends `ladder` (VAE chunk sizes) IMMEDIATELY in
      a fresh subprocess — no sleeping; fresh processes start from a clean
      HBM allocator.
    - a successful-but-slow timing (contended window) also advances the
      ladder (smaller footprint competes better for HBM) and retries.
    - returns the best observed timing, or None if every attempt errored
      or the budget ran out first. Never sleeps: the global deadline is
      the only clock that matters.
    """
    sane = SANE[phase]
    ladder = list(ladder or [()])
    best = None
    rung = 0
    rung_key = f"{_PHASE_KEY[phase]}_rung"
    if len(ladder) > 1:
        # start at the last rung that produced a sane timing under this
        # code fingerprint: re-proving chunk 6 under co-tenant HBM pressure
        # costs an OOM + a ~25-minute recompile before descending
        prev = _cache_get(cache, rung_key, _fingerprint(phase))
        if prev is not None:
            rung = min(int(prev), len(ladder) - 1)
    for attempt in range(max_attempts):
        if _remaining() < 90.0:  # not enough budget for compile + trial
            break
        timeout = max(60.0, min(_remaining() - 20.0, first_timeout))
        extra = ladder[min(rung, len(ladder) - 1)]
        try:
            val = _run_phase_subprocess(phase, extra, timeout=timeout)
            best = val if best is None else min(best, val)
            if best <= sane:
                break
            print(f"bench: {phase}{extra} took {val:.2f}s (contended window) — "
                  f"retrying", file=sys.stderr, flush=True)
            rung += 1
        except _PhaseOOM as e:
            print(f"bench: {e} — descending ladder", file=sys.stderr, flush=True)
            rung += 1
        except Exception as e:  # noqa: BLE001
            print(f"bench: {phase} attempt failed: {e}", file=sys.stderr, flush=True)
    key = _PHASE_KEY[phase]
    fp = _fingerprint(phase)
    if best is not None and best <= sane:
        cached = _cache_get(cache, key, fp)
        if cached is None or best < cached:
            cache[key] = {"t": round(best, 4), "fp": fp}
        if len(ladder) > 1:
            # remember which rung succeeded (last-write-wins, see
            # _save_cache) so the next run starts there
            cache[rung_key] = {"t": min(rung, len(ladder) - 1), "fp": fp}
        _save_cache(cache)
        return best
    # all windows were contended: prefer the cached quiet-window number for
    # THIS code fingerprint (reported stale by _emit) over a garbage figure —
    # unless there is none, in which case report the best we saw, honestly
    if _cache_get(cache, key, fp) is not None:
        return None
    return best


def main():
    if len(sys.argv) > 2 and sys.argv[1] == "--phase":
        phase = sys.argv[2]
        fn = {"sampler": _bench_sampler, "sampler_pab": _bench_sampler_pab,
              "vae": _bench_vae, "train": _bench_train,
              "encode": _bench_encode}[phase]
        val = fn()
        print(val)
        # A/B queue runs (scripts/onchip_ab*.sh) measure the same phase
        # definitions — persist sane results under the current fingerprint
        # so they warm the cache the driver's full bench reads. A/B legs
        # with non-default knobs fingerprint differently and never stand
        # in for the headline.
        try:
            v = float(val)
        except (TypeError, ValueError):
            return
        if v <= SANE.get(phase, float("inf")):
            cache = _load_cache()
            key, fp = _PHASE_KEY[phase], _fingerprint(phase)
            cached = _cache_get(cache, key, fp)
            if cached is None or v < cached:
                cache[key] = {"t": round(v, 4), "fp": fp}
                _save_cache(cache)
        return

    cache = _load_cache()
    results: dict = {}
    incomplete = ["sampler", "vae", "train"]

    # hard backstop: even if a phase subprocess wedges past its own timeout
    # (tunnel pathology), the global budget still ends the run with a final
    # best-so-far emit instead of relying on the driver's outer kill.
    # Armed BEFORE the startup emit: nothing in this process may run
    # un-alarmed (the startup emit once hung in jax.devices() on a dead
    # tunnel and produced rc=124 with no output).
    import signal

    def _deadline(_sig, _frm):
        print("bench: global budget exhausted — emitting best-so-far",
              file=sys.stderr, flush=True)
        _emit(results, cache, incomplete)
        if _EMITTED == 0:  # _emit had nothing reportable: still leave a line
            print(json.dumps({
                "metric": "frames/sec/chip (49x320x480 occupancy-conditioned, 2B DiT, 50-step sampler)",
                "value": None, "unit": "frames/s", "vs_baseline": None,
                "baseline_is_estimate": True,
                "detail": {"error": "budget exhausted before sampler/vae measured",
                           "incomplete": incomplete,
                           "partial": {p: round(v, 4) for p, v in results.items()}},
            }), flush=True)
        sys.exit(0)

    signal.signal(signal.SIGALRM, _deadline)
    signal.alarm(int(GLOBAL_BUDGET_S + 30))

    # startup emit: if a previous quiet window populated the cache, a
    # parseable (all-stale) line exists within seconds of process start
    _emit(results, cache, incomplete)

    # Dead-tunnel early exit: when backend init hangs (observed 2026-08-17,
    # no exception — just a retry loop), every phase subprocess would burn
    # its full timeout. The startup emit's device probe already timed out
    # in that state (_PROBE_FAILED); confirm with one longer probe before
    # writing the chip off — a merely-contended window usually still
    # answers within 120 s.
    if _PROBE_FAILED and cache:
        try:
            alive = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                capture_output=True, timeout=120.0,
            ).returncode == 0
        except Exception:  # noqa: BLE001 — TimeoutExpired => still hung
            alive = False
        if not alive:
            print("bench: TPU backend init hung twice — tunnel is down; "
                  "reporting cached quiet-window timings", file=sys.stderr,
                  flush=True)
            _emit(results, cache, incomplete)
            if _EMITTED == 0:  # cache entries exist but fingerprints mismatch
                _emit_nothing(results, incomplete,
                              "tunnel down; cached numbers are for older code")
            return

    for phase, kwargs in [
        ("sampler", dict(max_attempts=3, first_timeout=900.0)),
        # decode chunk 6 is fastest but needs ~10GB HBM; under a co-tenant
        # memory hold descend to chunk 4 (~7GB) / 2 / 0 (spatially tiled,
        # ~2GB — the last-resort rung) in FRESH subprocesses
        ("vae", dict(ladder=[(6,), (4,), (2,), (0,)], max_attempts=4,
                     first_timeout=1500.0)),
        ("train", dict(max_attempts=2, first_timeout=600.0)),
    ] + ([("encode", dict(ladder=[(8,), (4,), (2,)], max_attempts=3,
                          first_timeout=900.0))]
         if os.environ.get("ORV_TPU_BENCH_ENCODE") == "1" else []) \
      + ([("sampler_pab", dict(max_attempts=2, first_timeout=900.0))]
         if os.environ.get("ORV_TPU_BENCH_PAB") == "1" else []):
        if _remaining() < 90.0:
            break
        val = _phase_with_retries(phase, cache, **kwargs)
        if val is not None or _cache_get(cache, _PHASE_KEY[phase],
                                         _fingerprint(phase)) is not None:
            # measured fresh, or a cached quiet-window number stands in
            # (stale-flagged by _emit); a phase that errored every attempt
            # with no cache STAYS in `incomplete` so the report shows it.
            # Optional detail phases (encode, sampler_pab) are never in the
            # list — discard, don't remove (remove raised ValueError and
            # killed the 2026-08-19 full bench after its last phase).
            if phase in incomplete:
                incomplete.remove(phase)
        if val is not None:
            results[phase] = val
        _emit(results, cache, incomplete)

    # guarantee at least one parseable line: _emit early-returns whenever
    # sampler or vae has neither a fresh result nor a cache entry, so a run
    # where e.g. only train/vae succeeded would otherwise print NOTHING
    if _EMITTED == 0:
        _emit_nothing(results, incomplete,
                      "sampler/vae never measured and not cached")


def _emit_nothing(results: dict, incomplete: list, error: str) -> None:
    print(json.dumps({
        "metric": "frames/sec/chip (49x320x480 occupancy-conditioned, 2B DiT, 50-step sampler)",
        "value": None, "unit": "frames/s", "vs_baseline": None,
        "baseline_is_estimate": True,
        "detail": {"error": error,
                   "incomplete": incomplete,
                   "partial": {p: round(v, 4) for p, v in results.items()}},
    }), flush=True)


if __name__ == "__main__":
    main()
