#!/bin/bash
# Round-5 on-chip queue v3 (replaces onchip_r5b.sh): the warm phases are
# all cached — ONLY vae (and optionally train_b4) are missing — so instead
# of re-running the full bench each cycle (~20 min re-measuring warm
# phases before the ladder even starts), hit the missing phases DIRECTLY
# with `bench.py --phase <p>` (default args auto-cache sane results under
# the current fingerprint, bench.py:460-486). Falls back to one full-bench
# ladder run if direct chunk-6 keeps OOMing against the co-tenant hold.
# Then lands the decode + train device profiles (VERDICT r4 #5/#6) with
# the new leaf/category rollup (scripts/_trace_report.py).
# Logs to /tmp/onchip_r5c.log; pid in /tmp/onchip_r5c.pid. Safe to re-run.
cd /root/repo
LOG=/tmp/onchip_r5c.log
echo $$ > /tmp/onchip_r5c.pid
DEADLINE=$(( $(date +%s) + ${ORV_TPU_R5_DEADLINE_S:-14400} ))  # 4h default
log() { echo "$(date +%H:%M:%S) $*" >> "$LOG"; }

# wait for a previous bench child to release the chip before dispatching
WAIT_PID=${ORV_TPU_R5_WAIT_PID:-}
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
fi

probe() {
  timeout 150 python - <<'EOF' >/dev/null 2>&1
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
x = jnp.ones((1024, 1024)); float((x @ x).sum())
EOF
}

missing() { # core + optional-detail phases still lacking a current-fp cache
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
log "r5c queue starting (deadline in $(( (DEADLINE - $(date +%s)) / 60 )) min)"

VAE_DIRECT_FAILS=0
B4_FAILS=0
DEC_PROF=0
TR_PROF=0
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  m=$(missing all)
  mc=$(missing core)
  log "missing: ${m:-none} (core: ${mc:-none})"
  if [ -z "$mc" ]; then
    # measurements done (b4 best-effort) — land the profiles, then b4
    if [ "$DEC_PROF" = "0" ]; then
      log "running decode profile"
      if timeout 2400 python scripts/profile_decode.py \
           > /tmp/profile_decode_r5.txt 2>&1; then
        log "decode profile -> /tmp/profile_decode_r5.txt"
        DEC_PROF=1
      else
        log "decode profile failed (rc=$?) — retry next cycle"
        sleep 300
      fi
      continue
    fi
    if [ "$TR_PROF" = "0" ]; then
      log "running train profiles (leaf rollup)"
      ok=1
      timeout 2400 python scripts/profile_train.py 1 \
        > /tmp/profile_train_r5_b1.txt 2>&1 || ok=0
      timeout 2400 python scripts/profile_train.py 2 \
        > /tmp/profile_train_r5_b2.txt 2>&1 || ok=0
      if [ "$ok" = "1" ]; then
        log "train profiles -> /tmp/profile_train_r5_b{1,2}.txt"
        TR_PROF=1
      else
        log "train profile failed — retry next cycle"
        sleep 300
      fi
      continue
    fi
    if [ -z "$m" ] || [ "$B4_FAILS" -ge 3 ]; then
      log "ALL DONE (cache warm + profiles landed; b4 fails=$B4_FAILS)"
      exit 0
    fi
  fi
  if ! probe; then
    log "tunnel unresponsive — sleeping 5 min"
    sleep 300
    continue
  fi
  case " $m " in
    *" vae "*)
      # `--ladder vae` = the full bench's retry/ladder machinery on ONE
      # phase: resumes at the persisted rung (currently 2 — chunk 6/4
      # OOM'd against the co-tenant hold 06:14-06:34), fresh subprocess
      # per rung, auto-cache with args provenance. rc=0 iff sane.
      log "ladder vae attempt $((VAE_DIRECT_FAILS+1)) (resumes persisted rung)"
      ORV_TPU_BENCH_BUDGET_S=2400 timeout 3000 python bench.py --ladder vae \
        > /tmp/phase_vae_r5.out 2> /tmp/phase_vae_r5.err
      log "ladder vae rc=$? out: $(tail -1 /tmp/phase_vae_r5.out)"
      if echo " $(missing all) " | grep -q " vae "; then
        VAE_DIRECT_FAILS=$((VAE_DIRECT_FAILS + 1))
        sleep 120
      fi
      continue;;
    *" train_b4 "*)
      log "direct --phase train_b4 attempt $((B4_FAILS+1))"
      timeout 1500 python bench.py --phase train_b4 \
        > /tmp/phase_b4_r5.out 2> /tmp/phase_b4_r5.err
      log "phase train_b4 rc=$? out: $(tail -1 /tmp/phase_b4_r5.out)"
      if echo " $(missing all) " | grep -q " train_b4 "; then
        B4_FAILS=$((B4_FAILS + 1))
        sleep 120
      fi
      continue;;
    *" "*)
      # some other core phase went missing (shouldn't happen — warm):
      # a full bench re-measures everything
      log "unexpected missing set '$m' — full bench"
      ORV_TPU_BENCH_ENCODE=1 ORV_TPU_BENCH_PAB=1 ORV_TPU_BENCH_TRAIN_B2=1 \
        ORV_TPU_BENCH_BUDGET_S=3000 timeout 3600 python bench.py \
        > /tmp/bench_r5.out 2> /tmp/bench_r5.err
      log "bench rc=$? last: $(tail -1 /tmp/bench_r5.out)"
      sleep 60
      continue;;
  esac
  sleep 120
done
log "deadline hit; still missing: $(missing all)"
exit 1
