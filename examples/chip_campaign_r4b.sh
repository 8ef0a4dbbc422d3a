#!/bin/bash
# Round-4 follow-on chip queue (leg 3) — launched AFTER the r4 queue:
#   setsid nohup bash examples/chip_campaign_r4b.sh < /dev/null > /root/r4/queue_b.out 2>&1 &
#   echo $! > /root/r4/queue_b.pid
#
# Why a separate script: the r4 queue (examples/chip_campaign_r4.sh) is
# a RUNNING bash reading its file incrementally — editing bytes before
# its read offset corrupts the stream, so mid-script stages can only be
# skipped via their .done sentinels and new work must ship as a new
# file. This queue waits for the old one's pid to exit, keeping the
# ONE-gate-process-machine-wide rule (CLAUDE.md round-4 ops).
#
# fusion_leg3 rationale (from /root/r4/fusion_leg1.log): leg1's skeletal
# pretrain ground at train loss 9.15 for its entire 1000-epoch 3e-4
# anneal leg (improvements ~2e-4/10ep), leaving encoder accuracy 0.1386
# — so the fusion head trained on frozen garbage and decoded 0.0. The
# round-3 calibration says this plateau family breaks under low-LR
# PERSISTENCE (~2000 epochs at 1e-4 broke 7.7 -> 3.6), so leg3 extends
# the skeletal pretrain with a ladder (3e-4 to 5000 total, then 1e-4 to
# 8000 total; all resume-idempotent), gates on measured encoder quality
# (REQUIRE_ENC), and only then trains a FRESH head_blank_bias=-3 fusion
# head (3000 @ 3e-3 + 1500 @ 3e-4 anneal).
set -u
ART=${MGR_TPU_R4_ART:-/root/r4}
cd "$(dirname "$0")/.."

note() { echo "$(date -u '+%m-%d %H:%M:%S') $*" >> "$ART/queue_b.log"; }

# Hand-off: wait for the r4 queue to drain (it skips its leg2/curriculum
# via sentinels and exits after the early_fusion stage).
OLD_PID=$(cat "$ART/queue.pid" 2>/dev/null || echo 0)
if [ "$OLD_PID" != "0" ]; then
  note "waiting for r4 queue pid $OLD_PID"
  while kill -0 "$OLD_PID" 2>/dev/null; do sleep 30; done
fi
note "r4 queue drained"

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

acc_of() {  # max late_fusion train_accuracy in a log's JSON lines
  python - "$1" <<'EOF'
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
}

# Same corpus/workdir as leg1 — pretrains resume, head restarts fresh.
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
  MGR_TPU_CONV_PRETRAIN_LADDER="speech:3e-4x3000;skeletal:3e-4x5000+1e-4x8000"
  MGR_TPU_CONV_PRETRAIN_BLANK_BIAS=skeletal:-3
  MGR_TPU_CONV_REQUIRE_ENC=0.5
  MGR_TPU_CONV_BLANK_BIAS=-3
  MGR_TPU_CONV_LR2=3e-4
  MGR_TPU_CONV_EPOCHS2=1500
)

stage fusion_leg3 env "${FUSION_ENV[@]}" MGR_TPU_CONV_EPOCHS=3000 \
  python examples/tpu_convergence_check.py

LEG3_ACC=$(acc_of "$ART/fusion_leg3.log")
note "fusion leg3 accuracy: $LEG3_ACC"

# Leg 4: continue the head's anneal (same LR ladder shape the tiny-R3
# evidence used: the biased head at 6000 epochs was still descending)
# unless leg3 already hit the VERDICT 0.9 target or the round is out of
# runway (driver needs the chip for the end-of-round bench).
CUTOFF=${MGR_TPU_R4B_CUTOFF:-0}
past_cutoff() { [ "$CUTOFF" != "0" ] && [ "$(date +%s)" -gt "$CUTOFF" ]; }
if python -c "import sys; sys.exit(0 if float('$LEG3_ACC') < 0.9 else 1)" \
   && ! past_cutoff; then
  stage fusion_leg4 env "${FUSION_ENV[@]}" MGR_TPU_CONV_EPOCHS=4500 \
    MGR_TPU_CONV_EPOCHS2=4500 MGR_TPU_CONV_RESUME=1 \
    python examples/tpu_convergence_check.py
  note "fusion leg4 accuracy: $(acc_of "$ART/fusion_leg4.log")"
else
  note "fusion leg4 skipped (acc $LEG3_ACC or cutoff)"
fi

note "queue_b complete"
