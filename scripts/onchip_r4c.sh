#!/bin/bash
# Round-4 persistent on-chip queue (supersedes onchip_r4b.sh): loops until
# every pending measurement lands or the deadline passes. Handles the two
# failure modes seen today: the tunnel hanging (probe gate) and the
# co-tenant holding HBM (VAE A/B descends its own chunk ladder; the full
# bench has one built in). State in /tmp/onchip_r4c.state survives
# restarts; log /tmp/onchip_r4c.log.
cd /root/repo
LOG=/tmp/onchip_r4c.log
STATE=/tmp/onchip_r4c.state
DEADLINE=$(( $(date +%s) + 8*3600 ))
touch "$STATE"
log() { echo "$(date +%H:%M:%S) $*" >> "$LOG"; }
done_tag() { grep -qx "$1" "$STATE"; }
mark() { echo "$1" >> "$STATE"; }

probe() {
  timeout 90 python - <<'EOF' >/dev/null 2>&1
import jax, jax.numpy as jnp
x = jnp.ones((1024, 1024)); float((x @ x).sum())
EOF
}

phase() { # phase <timeout> <env...> -- <bench args...>; echoes seconds or ""
  local to=$1; shift
  local envs=()
  while [ "$1" != "--" ]; do envs+=("$1"); shift; done; shift
  env "${envs[@]}" ORV_TPU_BENCH_TRIAL_BUDGET_S=90 timeout "$to" \
    python bench.py --phase "$@" 2>>/tmp/onchip_r4c.err | tail -1
}

is_num() { [[ "$1" =~ ^[0-9.]+$ ]]; }

# wait for the r4b queue (if still alive) so two big programs never fight
# for HBM
if [ -f /tmp/onchip_r4b.pid ]; then
  while kill -0 "$(cat /tmp/onchip_r4b.pid)" 2>/dev/null; do sleep 60; done
fi
log "r4c queue starting (deadline in 8h)"

while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  # everything done?
  if done_tag vae_ab && done_tag profile && done_tag fullbench; then
    log "ALL DONE"; break
  fi
  if ! probe; then sleep 300; continue; fi

  if ! done_tag vae_ab; then
    # A/B the phase-decomposed upsample: both arms in the SAME window at
    # the largest chunk that fits (6 OOM'd under the co-tenant hold)
    for chunk in 6 4 2; do
      a=$(phase 1500 ORV_TPU_UPSAMPLE_PHASE=1 -- vae "$chunk")
      is_num "$a" || { log "vae_ab chunk$chunk arm phase1 failed"; continue; }
      b=$(phase 1500 ORV_TPU_UPSAMPLE_PHASE=0 -- vae "$chunk")
      is_num "$b" || { log "vae_ab chunk$chunk arm phase0 failed (p1=$a)"; continue; }
      log "vae_ab chunk$chunk: phase1=$a phase0=$b"
      mark vae_ab
      break
    done
    continue  # re-probe between items
  fi

  if ! done_tag profile; then
    if timeout 1800 python scripts/profile_decode.py \
        > /tmp/profile_decode_r4.txt 2>&1; then
      log "profile -> /tmp/profile_decode_r4.txt"; mark profile
    else
      log "profile failed (rc=$?)"
      # don't wedge the queue on the optional profile: two strikes and out
      if grep -qx profile_try1 "$STATE"; then mark profile; else mark profile_try1; fi
    fi
    continue
  fi

  if ! done_tag fullbench; then
    ORV_TPU_BENCH_ENCODE=1 ORV_TPU_BENCH_PAB=1 ORV_TPU_BENCH_BUDGET_S=3000 \
      timeout 3200 python bench.py > /tmp/bench_r4_full.out 2> /tmp/bench_r4_full.err
    last=$(tail -1 /tmp/bench_r4_full.out)
    log "fullbench last-line: $last"
    # success = a real value with nothing stale and nothing incomplete
    if python - <<EOF
import json, sys
try:
    d = json.loads('''$last''')
except Exception:
    sys.exit(1)
det = d.get("detail", {})
sys.exit(0 if d.get("value") and not det.get("stale") and not det.get("incomplete") else 1)
EOF
    then mark fullbench; log "fullbench CLEAN (no stale, no incomplete)"
    else log "fullbench not clean yet — will retry"
    fi
    continue
  fi
done
log "r4c queue exiting"
