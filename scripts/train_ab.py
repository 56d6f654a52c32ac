"""A/B ONE train-step variant (remat x policy x batch) on the TPU — the
MFU-push experiment for VERDICT r4 #5. The bench train phase (frozen in
bench_phases.py) uses remat=True policy="dots"; this script measures the
same 1.4B recipe under a different memory/recompute trade WITHOUT touching
any fingerprinted source, so the warm bench cache survives.

Variants are constructor knobs only (orv_tpu/models/dit.py:165,392):
  remat=on  policy=dots   — bench default: save dot outputs, recompute rest
  remat=on  policy=none   — full recompute (min memory)
  remat=off policy=-      — save everything (max memory, zero recompute)

One variant per process (freed HBM does not return mid-process — CLAUDE.md).

Usage: python scripts/train_ab.py <B> <remat:on|off> <policy:dots|none>
Prints: one line `AB B=.. remat=.. policy=..: <ms> ms -> <tok/s> tok/s, MFU <pct>%`
"""

import sys
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
    remat = (sys.argv[2] if len(sys.argv) > 2 else "on") == "on"
    policy = sys.argv[3] if len(sys.argv) > 3 else "dots"
    cfg = DiTConfig(
        num_attention_heads=28, attention_head_dim=64, num_layers=28,
        in_channels=32, out_channels=16, text_embed_dim=4096, time_embed_dim=512,
        sample_width=60, sample_height=40, sample_frames=17,
        use_rotary_positional_embeddings=True,
        modulate_encoder_hidden_states=False, recon_action=True,
    )
    model = ControlDiT(cfg, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
                       remat=remat,
                       remat_policy=policy if policy == "dots" else None)
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
    print(f"init (B={B} remat={remat} policy={policy})...",
          file=sys.stderr, flush=True)
    params = jax.jit(lambda: model.init(
        {"params": key(0), "action_mask": key(1)},
        batch["latents"][:, :C].transpose(0, 2, 1, 3, 4)
        .astype(jnp.bfloat16).repeat(2, 2),
        batch["prompt_embeds"], jnp.zeros((B,), jnp.int32),
        actions=batch["actions"], image_rotary_emb=rope, deterministic=False,
    ))()
    jax.block_until_ready(params)
    tx = make_optimizer(make_lr_schedule(warmup_steps=0, total_steps=1000))
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=tx.init(params))
    step = make_train_step(model.apply, tx, make_schedule(), recon_action=True,
                           image_rotary_emb=rope)
    print("compile...", file=sys.stderr, flush=True)
    state, m = step(state, batch, key(42))
    float(m["loss"])
    times = []
    for i in range(4):
        b = dict(batch)
        b["latents"] = batch["latents"] * (1.0 + (i + 1) * 1e-6)  # tunnel dedups
        t0 = time.time()
        state, m = step(state, b, key(43 + i))
        float(m["loss"])
        times.append(time.time() - t0)
    best = min(times)
    mfu = (100.0 * 6.0 * TRAIN_N_PARAMS * TRAIN_TOKENS_PER_SAMPLE * B
           / best / V5E_BF16_PEAK)
    print(f"AB B={B} remat={'on' if remat else 'off'} policy={policy}: "
          f"{best*1e3:.1f} ms -> {TRAIN_TOKENS_PER_SAMPLE*B/best:.0f} tok/s, "
          f"MFU {mfu:.1f}%")


if __name__ == "__main__":
    main()
