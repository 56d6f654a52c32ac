#!/bin/bash
# Round-4 final on-chip queue: re-warm the fingerprinted bench cache (a
# bench.py fix on 2026-08-19 ~15:00 invalidated every cached phase — the
# phase fingerprints hash bench.py itself) and land the decode device
# profile (VERDICT r3 item 8). Retries through co-tenant contention: the
# cache only ever accepts sane (quiet-window) values, so re-running until
# all phases are warm is safe by construction.
# Logs to /tmp/onchip_r4d.log. Deadline-bounded; safe to re-run.
cd /root/repo
LOG=/tmp/onchip_r4d.log
DEADLINE=$(( $(date +%s) + ${ORV_TPU_R4D_DEADLINE_S:-32400} ))  # 9h default
log() { echo "$(date +%H:%M:%S) $*" >> "$LOG"; }

probe() { # rc 0 iff a trivial matmul completes quickly (tunnel alive)
  timeout 90 python - <<'EOF' >/dev/null 2>&1
import jax, jax.numpy as jnp
x = jnp.ones((1024, 1024)); float((x @ x).sum())
EOF
}

# phases still missing a fingerprint-valid cache entry (space-separated)
missing() {
  python - <<'EOF'
import json, sys
sys.path.insert(0, "/root/repo")
import bench
cache = bench._load_cache()
miss = [p for p in ("sampler", "vae", "train", "encode", "sampler_pab")
        if bench._cache_get(cache, bench._PHASE_KEY[p],
                            bench._fingerprint(p)) is None]
print(" ".join(miss))
EOF
}

: > "$LOG"
log "r4d queue starting (deadline in $(( (DEADLINE - $(date +%s)) / 60 )) min)"

while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  m=$(missing)
  if [ -z "$m" ]; then
    log "cache fully warm — running decode profile"
    if timeout 2400 python scripts/profile_decode.py \
         > /tmp/profile_decode_r4.txt 2>&1; then
      log "profile -> /tmp/profile_decode_r4.txt"
      log "ALL DONE"
      exit 0
    fi
    log "profile failed (rc=$?) — will retry next cycle"
    sleep 600
    continue
  fi
  log "missing phases: $m"
  if ! probe; then
    log "tunnel unresponsive — sleeping 5 min"
    sleep 300
    continue
  fi
  # full bench warms every phase it lands; contended values never cache.
  # encode/pab detail phases run too so the driver's final bench is all-warm.
  ORV_TPU_BENCH_ENCODE=1 ORV_TPU_BENCH_PAB=1 ORV_TPU_BENCH_BUDGET_S=2400 \
    timeout 2600 python bench.py > /tmp/bench_r4d.out 2> /tmp/bench_r4d.err
  log "bench rc=$? last: $(tail -1 /tmp/bench_r4d.out)"
  sleep 120
done
log "deadline hit; still missing: $(missing)"
exit 1
