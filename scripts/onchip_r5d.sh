#!/bin/bash
# Round-5 on-chip queue v4 (takes over after onchip_r5c.sh exits).
# Remaining on-chip agenda, in priority order:
#   1. vae — the headline decode has not been freshly measured on current
#      code since round 2 (VERDICT r4 #1). Same `--ladder vae` machinery
#      as r5c (persisted rung, fresh subprocess, args-provenance cache).
#   2. train_ab arms (VERDICT r4 #5 MFU push, reports/train_mfu_r5.md):
#      remat=off and policy=none at B=1, remat=off at B=2 — constructor
#      knobs only, cache fingerprints untouched.
#   3. train_b4 retries (co-tenant OOM'd it twice in r5b).
#   4. decode device profile (VERDICT r4 #6) — gate RELAXED vs r5c: runs
#      once vae lands OR after 4 more failed vae attempts (the profiler
#      descends its own chunk ladder on OOM; a contended profile with
#      real per-fusion proportions beats no profile).
# Logs to /tmp/onchip_r5d.log; pid in /tmp/onchip_r5d.pid. Safe to re-run.
cd /root/repo
LOG=/tmp/onchip_r5d.log
echo $$ > /tmp/onchip_r5d.pid
DEADLINE=$(( $(date +%s) + ${ORV_TPU_R5_DEADLINE_S:-10800} ))
log() { echo "$(date +%H:%M:%S) $*" >> "$LOG"; }

# wait for the previous queue (and any bench child it spawned) to exit;
# ORV_TPU_R5_WAIT_PID names an in-flight bench child to also wait on when
# the r5c main loop was stopped mid-attempt
PREV=$(cat /tmp/onchip_r5c.pid 2>/dev/null)
for w in "$PREV" "${ORV_TPU_R5_WAIT_PID:-}"; do
  [ -n "$w" ] || continue
  while kill -0 "$w" 2>/dev/null; do sleep 30; done
done

probe() {
  timeout 150 python - <<'EOF' >/dev/null 2>&1
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
x = jnp.ones((1024, 1024)); float((x @ x).sum())
EOF
}

missing() {
  python - "$1" <<'EOF'
import sys
sys.path.insert(0, "/root/repo")
import bench
phases = ("sampler", "vae", "train", "encode", "sampler_pab", "train_b2") \
    if (len(sys.argv) > 1 and sys.argv[1] == "core") \
    else ("sampler", "vae", "train", "encode", "sampler_pab", "train_b2",
          "train_b4")
cache = bench._load_cache()
print(" ".join(p for p in phases
               if bench._cache_get(cache, bench.PHASE_KEY[p],
                                   bench._fingerprint(p)) is None))
EOF
}

: > "$LOG"
log "r5d queue starting (deadline in $(( (DEADLINE - $(date +%s)) / 60 )) min)"

AB_ARMS=("1 off dots" "1 on none" "2 off dots")
AB_DONE=(0 0 0)
AB_OUT=/tmp/train_ab_r5.txt
VAE_FAILS=0
B4_FAILS=0
DEC_PROF=0

next_ab() { # index of first pending A/B arm, or -1
  for i in 0 1 2; do
    if [ "${AB_DONE[$i]}" = "0" ]; then echo "$i"; return; fi
  done
  echo -1
}

while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  m=$(missing all)
  ab=$(next_ab)
  log "missing: ${m:-none}; ab pending: $ab; vae_fails=$VAE_FAILS dec_prof=$DEC_PROF"
  if [ -z "$m" ] && [ "$ab" = "-1" ] && [ "$DEC_PROF" = "1" ]; then
    log "ALL DONE"
    exit 0
  fi
  if ! probe; then
    log "tunnel unresponsive — sleeping 5 min"
    sleep 300
    continue
  fi
  # 1. vae ladder (headline) — always first while missing
  if echo " $m " | grep -q " vae "; then
    log "ladder vae attempt $((VAE_FAILS+1))"
    ORV_TPU_BENCH_BUDGET_S=2400 timeout 3000 python bench.py --ladder vae \
      > /tmp/phase_vae_r5.out 2> /tmp/phase_vae_r5.err
    log "ladder vae rc=$? out: $(tail -1 /tmp/phase_vae_r5.out)"
    if echo " $(missing all) " | grep -q " vae "; then
      VAE_FAILS=$((VAE_FAILS + 1))
    fi
    # fall through: run one cheap item below before the next vae attempt
  fi
  # 2. one train_ab arm per cycle (quick, scan-dominated — contention-robust)
  if [ "$ab" != "-1" ]; then
    arm=${AB_ARMS[$ab]}
    log "train_ab arm: B/remat/policy = $arm"
    if timeout 1200 python scripts/train_ab.py $arm >> "$AB_OUT" 2>&1; then
      log "train_ab arm '$arm' done: $(tail -1 $AB_OUT)"
    else
      log "train_ab arm '$arm' rc=$? (OOM/contended — counts as done, see $AB_OUT)"
      echo "AB $arm: FAILED rc!=0" >> "$AB_OUT"
    fi
    AB_DONE[$ab]=1
    sleep 30
    continue
  fi
  # 3. train_b4 (best effort)
  if echo " $m " | grep -q " train_b4 " && [ "$B4_FAILS" -lt 3 ]; then
    log "direct --phase train_b4 attempt $((B4_FAILS+1))"
    timeout 1500 python bench.py --phase train_b4 \
      > /tmp/phase_b4_r5.out 2> /tmp/phase_b4_r5.err
    log "phase train_b4 rc=$? out: $(tail -1 /tmp/phase_b4_r5.out)"
    if echo " $(missing all) " | grep -q " train_b4 "; then
      B4_FAILS=$((B4_FAILS + 1))
      sleep 60
    fi
    continue
  fi
  # 4. decode profile — once vae landed or the well is clearly dry
  if [ "$DEC_PROF" = "0" ]; then
    if ! echo " $m " | grep -q " vae " || [ "$VAE_FAILS" -ge 4 ]; then
      log "running decode profile (vae_fails=$VAE_FAILS)"
      if timeout 2400 python scripts/profile_decode.py \
           > /tmp/profile_decode_r5.txt 2>&1; then
        log "decode profile -> /tmp/profile_decode_r5.txt"
        DEC_PROF=1
      else
        log "decode profile failed (rc=$?) — retry next cycle"
        sleep 240
      fi
      continue
    fi
  fi
  sleep 120
done
log "deadline hit; still missing: $(missing all); ab pending: $(next_ab); dec_prof=$DEC_PROF"
exit 1
