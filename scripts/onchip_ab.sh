#!/bin/bash
# On-chip A/B sequence for round-3 changes. Each phase is its own process
# (HBM does not return mid-process). Logs to /tmp/onchip_ab.log.
cd /root/repo
log() { echo "$(date +%H:%M:%S) $*" >> /tmp/onchip_ab.log; }
run() { # run <tag> <timeout> <env...> -- bench phase args
  local tag=$1 to=$2; shift 2
  local envs=()
  while [ "$1" != "--" ]; do envs+=("$1"); shift; done; shift
  local out
  out=$(env "${envs[@]}" ORV_TPU_BENCH_TRIAL_BUDGET_S=90 timeout "$to" python bench.py --phase "$@" 2>>/tmp/onchip_ab.err | tail -1)
  log "$tag -> ${out:-FAILED(rc=$?)}"
}
: > /tmp/onchip_ab.log
log "=== sampler (control cache active) ==="
run sampler 1200 -- sampler
log "=== vae decode chunk 6: phase upconv ON vs OFF ==="
run vae_phase1 1800 ORV_TPU_UPSAMPLE_PHASE=1 -- vae 6
run vae_phase0 1800 ORV_TPU_UPSAMPLE_PHASE=0 -- vae 6
log "=== train 1.4B: fused adaLN ON vs OFF ==="
run train_fused 1200 ORV_TPU_FUSED_ADALN=force -- train  # =1 now means XLA under grad (measured default)
run train_xla   1200 ORV_TPU_FUSED_ADALN=0 -- train
log "=== encode chunk 8 ==="
run encode 1800 -- encode 8
log "=== pab sampler (approximate serving mode, detail-only) ==="
run sampler_pab 1800 -- sampler_pab
log "=== step profile: top device-time fusions (elementwise budget) ==="
timeout 1800 python scripts/profile_step.py > /tmp/profile_step.out 2>>/tmp/onchip_ab.err \
  && log "profile_step -> /tmp/profile_step.out" || log "profile_step FAILED"
log "=== full bench refresh (updates .bench_cache.json) ==="
timeout 2400 python bench.py > /tmp/bench_full.out 2>>/tmp/onchip_ab.err \
  && log "bench -> $(tail -1 /tmp/bench_full.out)" || log "bench FAILED"
log "=== done ==="
