#!/bin/bash
# Round-4 chip campaign queue — run with:
#   setsid nohup bash examples/chip_campaign_r4.sh < /dev/null > /root/r4/queue.out 2>&1 &
#   echo $! > /root/r4/queue.pid
#
# ONE gate process machine-wide (CLAUDE.md round-4 ops rule): every
# stage is gated on a relay canary (tiny matmul + scalar fetch,
# /tmp/canary.py pattern) with a 20-min cooldown between probes, and the
# stages themselves run strictly sequentially — the chip-campaign lock
# (mgr_tpu/core/campaign.py) rides along inside each stage process.
#
# Stages (VERDICT round-3 next-round items):
#   bench        — fresh perf artifact (#2)
#   fusion leg 1 — biased-head late-fusion campaign at production
#                  geometry (#1): annealed pretrains (skeletal with
#                  head_blank_bias=-3, the round-4 A/B unlock), fresh
#                  -3-biased fusion head, constant 3e-3, 3000 epochs
#   rgb          — production-path convergence row (#4)
#   early_fusion — production-path convergence row (#4)
#   fusion leg 2 — resume the fusion head to 6000 epochs (skipped when
#                  leg 1 already decodes >= 0.9)
#
# Each stage's corpus root is PRIVATE ($ART/root_<stage>): the synthetic
# generators write fixed filenames, so two geometries sharing a root
# would overwrite each other's bytes while both reuse sentinels stay
# "complete" (the fusion resume leg would then train on the wrong
# corpus).
set -u
ART=${MGR_TPU_R4_ART:-/root/r4}
mkdir -p "$ART"
cd "$(dirname "$0")/.."

note() { echo "$(date -u '+%m-%d %H:%M:%S') $*" >> "$ART/queue.log"; }

cat > "$ART/canary.py" <<'EOF'
import time, sys
t0 = time.time()
import jax, jax.numpy as jnp
x = jnp.ones((256, 256))
y = float((x @ x).sum())
print(f"canary ok {jax.devices()[0].platform} {time.time()-t0:.1f}s", flush=True)
EOF

canary_gate() {
  local tries=0
  while true; do
    tries=$((tries + 1))
    if timeout 240 python "$ART/canary.py" >> "$ART/canary.log" 2>&1; then
      note "canary pass (try $tries)"
      return 0
    fi
    note "canary fail (try $tries) — 20 min cooldown"
    sleep 1200
  done
}

stage() {
  local name=$1; shift
  if [ -e "$ART/$name.done" ]; then note "skip $name (done)"; return 0; fi
  canary_gate
  note "start $name"
  "$@" > "$ART/$name.log" 2>&1
  local rc=$?
  note "done $name rc=$rc"
  [ $rc -eq 0 ] && touch "$ART/$name.done"
  return $rc
}

# Stage 1: fresh bench artifact (bench.py has its own canary+retry; the
# outer gate just avoids burning its bounded retries on a dead relay).
stage bench python bench.py

# Shared fusion-campaign env (production geometry: 160 files x 1900
# frames, ChaLearn content density, bf16 + Pallas).
FUSION_ENV=(
  MGR_TPU_CONV_ONLY=late_fusion
  MGR_TPU_CONV_FILES=160
  MGR_TPU_CONV_BATCH=32
  MGR_TPU_CONV_LR=3e-3
  MGR_TPU_CONV_GUARD=1
  MGR_TPU_CONV_SYNC=10
  MGR_TPU_CONV_ROOT="$ART/root_fusion"
  MGR_TPU_CONV_WORKDIR="$ART/fusion_wd"
  MGR_TPU_CONV_PRETRAIN=2000
  MGR_TPU_CONV_PRETRAIN_LR2=3e-4
  MGR_TPU_CONV_PRETRAIN_EPOCHS2=1000
  MGR_TPU_CONV_PRETRAIN_BLANK_BIAS=skeletal:-3
  MGR_TPU_CONV_BLANK_BIAS=-3
)

# Stage 2: the headline — biased-head fusion to decode accuracy.
stage fusion_leg1 env "${FUSION_ENV[@]}" MGR_TPU_CONV_EPOCHS=3000 \
  python examples/tpu_convergence_check.py

# Stage 3+4: the two pipelines with no full-geometry learning row yet.
stage rgb env MGR_TPU_CONV_ONLY=rgb MGR_TPU_CONV_EPOCHS=1500 \
  MGR_TPU_CONV_GUARD=1 MGR_TPU_CONV_ROOT="$ART/root_rgb" \
  python examples/tpu_convergence_check.py

stage early_fusion env MGR_TPU_CONV_ONLY=early_fusion \
  MGR_TPU_CONV_FILES=160 MGR_TPU_CONV_EPOCHS=1500 MGR_TPU_CONV_GUARD=1 \
  MGR_TPU_CONV_SYNC=10 MGR_TPU_CONV_ROOT="$ART/root_ef" \
  python examples/tpu_convergence_check.py

# Stage 5: continue the fusion head to 24k steps unless leg 1 already
# decoded >= 0.9 (the VERDICT target).
LEG1_ACC=$(python - "$ART/fusion_leg1.log" <<'EOF'
import json, sys
acc = 0.0
try:
    for line in open(sys.argv[1]):
        line = line.strip()
        if line.startswith("{"):
            try:
                acc = max(acc, json.loads(line).get("late_fusion", {}).get("train_accuracy", 0.0))
            except Exception:
                pass
except OSError:
    pass
print(acc)
EOF
)
note "fusion leg1 accuracy: $LEG1_ACC"
if python -c "import sys; sys.exit(0 if float('$LEG1_ACC') < 0.9 else 1)"; then
  stage fusion_leg2 env "${FUSION_ENV[@]}" MGR_TPU_CONV_EPOCHS=6000 \
    MGR_TPU_CONV_RESUME=1 python examples/tpu_convergence_check.py
else
  note "fusion leg2 skipped (leg1 accuracy $LEG1_ACC >= 0.9)"
fi

note "queue complete"

# Phase 2 (appended while the queue ran; bash reads the script
# incrementally so append-only edits are picked up): the measured
# wall-clock-to-ACCURACY curriculum at reference geometry (VERDICT
# round-3 item 5). Guarded by a start-time cutoff so it cannot overrun
# the round: skipped when started after MGR_TPU_R4_CUTOFF (epoch secs).
CUTOFF=${MGR_TPU_R4_CUTOFF:-0}
if [ "$CUTOFF" != "0" ] && [ "$(date +%s)" -gt "$CUTOFF" ]; then
  note "curriculum_acc skipped (past cutoff)"
else
  stage curriculum_acc env MGR_TPU_CB_MEASURED=1 MGR_TPU_CB_EPOCHS=3000 \
    MGR_TPU_CB_ACC_TARGET="speech:0.95,skeletal:0.95,late_fusion:0.9" \
    MGR_TPU_CB_ACC_EVERY=250 \
    MGR_TPU_CB_BLANK_BIAS="skeletal:-3,late_fusion:-3" \
    MGR_TPU_CB_SYNC_EVERY=10 \
    python examples/curriculum_bench.py
fi
note "queue fully complete"
