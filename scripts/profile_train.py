"""Profile ONE 1.4B train step (fwd+bwd+adamw, the bench train phase) on
the TPU and print the top device-time fusions — the VERDICT r4 #5 evidence
for where the non-MXU train time goes when MFU stays under 50%.

Same recipe as scripts/profile_step.py (wrap a single dispatch in
jax.profiler.trace, parse the vm.trace.json.gz traceEvents from the pid
whose process_name mentions TPU — works through the axon tunnel, proven
in round 2 on the Dv=128 PV padding bug).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/profile_train.py [B]
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
    sys.path.insert(0, "/root/repo")
    from bench_phases import (TRAIN_N_PARAMS, TRAIN_TOKENS_PER_SAMPLE,
                              V5E_BF16_PEAK, HEIGHT, WIDTH)
    from orv_tpu.models import ControlDiT, DiTConfig
    from orv_tpu.parallel import (TrainState, make_lr_schedule, make_optimizer,
                                  make_train_step)
    from orv_tpu.schedulers import make_schedule
    from orv_tpu.utils.embeddings import prepare_rotary_positional_embeddings

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    cfg = DiTConfig(
        num_attention_heads=28, attention_head_dim=64, num_layers=28,
        in_channels=32, out_channels=16, text_embed_dim=4096, time_embed_dim=512,
        sample_width=60, sample_height=40, sample_frames=17,
        use_rotary_positional_embeddings=True,
        modulate_encoder_hidden_states=False, recon_action=True,
    )
    model = ControlDiT(cfg, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
                       remat=True, remat_policy="dots")
    F, C, H, W = 5, 16, 40, 60
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
    print(f"init 1.4B train model (B={B})...", file=sys.stderr, flush=True)
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
    print("compile train step...", file=sys.stderr, flush=True)
    state, m = step(state, batch, key(42))
    float(m["loss"])
    times = []
    for i in range(3):
        b = dict(batch)
        b["latents"] = batch["latents"] * (1.0 + (i + 1) * 1e-6)
        t0 = time.time()
        state, m = step(state, b, key(43 + i))
        float(m["loss"])
        times.append(time.time() - t0)
    best = min(times)
    mfu = 100.0 * 6.0 * TRAIN_N_PARAMS * TRAIN_TOKENS_PER_SAMPLE * B / best / V5E_BF16_PEAK
    print(f"train step B={B}: min {best*1e3:.1f} ms over {len(times)} trials "
          f"-> {TRAIN_TOKENS_PER_SAMPLE*B/best:.0f} tok/s, MFU {mfu:.1f}%")

    d = tempfile.mkdtemp(prefix="orvtrainprof_")
    b = dict(batch)
    b["latents"] = batch["latents"] * 1.000123
    with jax.profiler.trace(d):
        state, m = step(state, b, key(99))
        float(m["loss"])
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
    for name, us in sorted(totals.items(), key=lambda kv: -kv[1])[:30]:
        print(f"  {us/1e3:9.3f} ms  {us/total_us*100:5.1f}%  {name[:110]}")


if __name__ == "__main__":
    main()
