#!/bin/bash
# Round-5 on-chip queue v2 (replaces onchip_r5.sh once its in-flight bench
# run finishes): warm the fingerprinted cache for every phase, then land
# BOTH device profiles — decode (VERDICT r4 #6) and train (VERDICT r4 #5:
# MFU measured at 29.6% B=1 / 31.7% B=2, so the deliverable is the profile
# showing where the non-MXU time goes).
#
# v2 fixes over onchip_r5.sh: train_b4 OOMs against the co-tenant's HBM
# hold (observed 02:44) — after 2 failed attempts it is dropped from the
# required set so the loop cannot re-run the full bench until the
# deadline; profiles gate on the CORE phases only.
# Logs to /tmp/onchip_r5b.log; pid in /tmp/onchip_r5b.pid. Safe to re-run.
cd /root/repo
LOG=/tmp/onchip_r5b.log
echo $$ > /tmp/onchip_r5b.pid
DEADLINE=$(( $(date +%s) + ${ORV_TPU_R5_DEADLINE_S:-28800} ))  # 8h default
log() { echo "$(date +%H:%M:%S) $*" >> "$LOG"; }

probe() { # rc 0 iff a trivial matmul completes (tunnel alive); persistent
  # compile cache keeps the probe cheap (see onchip_r5.sh).
  timeout 150 python - <<'EOF' >/dev/null 2>&1
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
x = jnp.ones((1024, 1024)); float((x @ x).sum())
EOF
}

# $1 = "core" restricts to the phases that gate the profiles; $2 = extra
# phases to skip (comma-separated, e.g. dropped OOM phases)
missing() {
  python - "$1" "$2" <<'EOF'
import sys
sys.path.insert(0, "/root/repo")
import bench
core = ("sampler", "vae", "train", "encode", "sampler_pab")
phases = core if (len(sys.argv) > 1 and sys.argv[1] == "core") \
    else core + ("train_b4", "train_b2")
skip = set((sys.argv[2] or "").split(",")) if len(sys.argv) > 2 else set()
cache = bench._load_cache()
miss = [p for p in phases if p not in skip
        and bench._cache_get(cache, bench.PHASE_KEY[p],
                             bench._fingerprint(p)) is None]
print(" ".join(miss))
EOF
}

: > "$LOG"
log "r5b queue starting (deadline in $(( (DEADLINE - $(date +%s)) / 60 )) min)"

B4_FAILS=0
DROPPED=""
DEC_PROF=0
TR_PROF=0
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  m=$(missing all "$DROPPED")
  mc=$(missing core "")
  if [ -z "$m" ] && [ "$DEC_PROF" = "1" ] && [ "$TR_PROF" = "1" ]; then
    log "ALL DONE (cache warm + both profiles landed)"
    exit 0
  fi
  # train profile only needs the (already-warm) train phases — run it
  # FIRST so a permanently-contended vae cannot block the MFU evidence
  if [ "$TR_PROF" = "0" ]; then
    if ! echo " $(missing all 'train_b4') " | grep -qE " train(_b2)? "; then
      log "train phases warm — running train profile (B=1, then B=2)"
      ok=1
      timeout 2400 python scripts/profile_train.py 1 \
        > /tmp/profile_train_r5_b1.txt 2>&1 || ok=0
      timeout 2400 python scripts/profile_train.py 2 \
        > /tmp/profile_train_r5_b2.txt 2>&1 || ok=0
      if [ "$ok" = "1" ]; then
        log "train profiles -> /tmp/profile_train_r5_b{1,2}.txt"
        TR_PROF=1
        continue
      fi
      log "train profile failed — retry next cycle"
      sleep 600
      continue
    fi
  fi
  if [ -z "$mc" ]; then
    if [ "$DEC_PROF" = "0" ]; then
      log "core phases warm — running decode profile"
      if timeout 2400 python scripts/profile_decode.py \
           > /tmp/profile_decode_r5.txt 2>&1; then
        log "decode profile -> /tmp/profile_decode_r5.txt"
        DEC_PROF=1
        continue
      fi
      log "decode profile failed (rc=$?) — retry next cycle"
      sleep 600
      continue
    fi
  fi
  [ -z "$m" ] && { sleep 120; continue; }  # only profiles left, gated above
  log "missing phases: $m (dropped: ${DROPPED:-none})"
  if ! probe; then
    log "tunnel unresponsive — sleeping 5 min"
    sleep 300
    continue
  fi
  B4_ENV=""
  case " $m " in *" train_b4 "*) B4_ENV=1;; esac
  ORV_TPU_BENCH_ENCODE=1 ORV_TPU_BENCH_PAB=1 \
    ORV_TPU_BENCH_TRAIN_B4=${B4_ENV:+1} ORV_TPU_BENCH_TRAIN_B2=1 \
    ORV_TPU_BENCH_BUDGET_S=3000 \
    timeout 3600 python bench.py > /tmp/bench_r5.out 2> /tmp/bench_r5.err
  log "bench rc=$? last: $(tail -1 /tmp/bench_r5.out)"
  if [ -n "$B4_ENV" ] && [ -n "$(missing all "" | grep -o train_b4)" ]; then
    B4_FAILS=$((B4_FAILS + 1))
    if [ "$B4_FAILS" -ge 2 ] && [ -z "$DROPPED" ]; then
      DROPPED="train_b4"
      log "train_b4 failed $B4_FAILS full-bench attempts (OOM vs co-tenant"
      log "HBM) — dropped from the required set; b2 carries the MFU detail"
    fi
  fi
  sleep 60
done
log "deadline hit; still missing: $(missing all "$DROPPED")"
exit 1
