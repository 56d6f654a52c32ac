#!/bin/bash
# Round-4 on-chip A/B queue (VERDICT r3 items 1,2,8). Each phase is its own
# process (HBM does not return mid-process). Logs to /tmp/onchip_ab_r4.log.
cd /root/repo
log() { echo "$(date +%H:%M:%S) $*" >> /tmp/onchip_ab_r4.log; }
run() { # run <tag> <timeout> <env...> -- bench phase args
  local tag=$1 to=$2; shift 2
  local envs=()
  while [ "$1" != "--" ]; do envs+=("$1"); shift; done; shift
  local out
  out=$(env "${envs[@]}" ORV_TPU_BENCH_TRIAL_BUDGET_S=90 timeout "$to" python bench.py --phase "$@" 2>>/tmp/onchip_ab_r4.err | tail -1)
  log "$tag -> ${out:-FAILED(rc=$?)}"
}
: > /tmp/onchip_ab_r4.log
log "=== sampler (control cache hoist active; r3 pre-hoist measured 11.01) ==="
run sampler 1500 -- sampler
log "=== pab sampler (approximate serving mode; expect ~7-8s) ==="
run sampler_pab 1800 -- sampler_pab
log "=== vae decode chunk 6: phase upconv ON vs OFF ==="
run vae_phase1 1800 ORV_TPU_UPSAMPLE_PHASE=1 -- vae 6
run vae_phase0 1800 ORV_TPU_UPSAMPLE_PHASE=0 -- vae 6
log "=== train 1.4B: fused adaLN ON vs OFF ==="
run train_fused 1500 ORV_TPU_FUSED_ADALN=force -- train  # =1 now means XLA under grad (measured default)
run train_xla   1500 ORV_TPU_FUSED_ADALN=0 -- train
log "=== encode chunk 8 ==="
run encode 1800 -- encode 8
log "=== done (bench refresh deferred to after cache fingerprinting) ==="
