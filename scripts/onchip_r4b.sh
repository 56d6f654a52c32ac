#!/bin/bash
# Round-4 second on-chip queue: waits for the TPU tunnel to recover, then
# runs the measurements the morning queue could not land (VERDICT r3 items
# 1 and 8): VAE decode phase-upconv A/B, a decode device profile, and a
# full fresh bench (all phases, warming the fingerprinted cache).
# Logs to /tmp/onchip_r4b.log. Safe to re-run; each phase is its own
# process (freed HBM does not return mid-process).
cd /root/repo
LOG=/tmp/onchip_r4b.log
log() { echo "$(date +%H:%M:%S) $*" >> "$LOG"; }

probe() { # rc 0 iff a trivial matmul completes quickly
  timeout 90 python - <<'EOF' >/dev/null 2>&1
import jax, jax.numpy as jnp
x = jnp.ones((1024, 1024)); float((x @ x).sum())
EOF
}

: > "$LOG"
log "waiting for tunnel recovery (probe every 5 min)"
until probe; do sleep 300; done
log "tunnel answered — confirming with a second probe"
sleep 30
until probe; do log "second probe failed; continuing to wait"; sleep 300; done
log "tunnel UP — starting queue"

run() { # run <tag> <timeout> <env...> -- bench args
  local tag=$1 to=$2; shift 2
  local envs=()
  while [ "$1" != "--" ]; do envs+=("$1"); shift; done; shift
  local out
  out=$(env "${envs[@]}" ORV_TPU_BENCH_TRIAL_BUDGET_S=90 timeout "$to" \
        python bench.py --phase "$@" 2>>/tmp/onchip_r4b.err | tail -1)
  log "$tag -> ${out:-FAILED(rc=$?)}"
}

log "=== vae decode chunk 6: phase upconv ON vs OFF (OOM'd in the morning queue) ==="
run vae_phase1 1800 ORV_TPU_UPSAMPLE_PHASE=1 -- vae 6
run vae_phase0 1800 ORV_TPU_UPSAMPLE_PHASE=0 -- vae 6
log "=== decode device profile (where do the non-conv ms go) ==="
timeout 1800 python scripts/profile_decode.py > /tmp/profile_decode_r4.txt 2>&1 \
  && log "profile -> /tmp/profile_decode_r4.txt" || log "profile -> FAILED"
log "=== full fresh bench (all phases incl. encode+pab; warms the v2 cache) ==="
ORV_TPU_BENCH_ENCODE=1 ORV_TPU_BENCH_PAB=1 ORV_TPU_BENCH_BUDGET_S=3000 \
  timeout 3200 python bench.py > /tmp/bench_r4_full.out 2> /tmp/bench_r4_full.err
log "bench rc=$? last-line: $(tail -1 /tmp/bench_r4_full.out)"
log "=== done ==="
