#!/bin/bash
# Round-4d chip queue — launched after queue_c drained (all prior
# queues verified dead by exact pid; ONE gate process machine-wide,
# CLAUDE.md round-4 ops rule):
#   setsid nohup bash examples/chip_campaign_r4d.sh < /dev/null > /root/r4/queue_d.out 2>&1 &
#   echo $! > /root/r4/queue_d.pid
#
# Stage rationale (from the legs-3/4 harvest, BASELINE.md round-4):
#   1. fusion_ft     — the frozen big-batch head stalled at the blank
#                      floor (acc 0.1085, loss flat 9.50 after 36k
#                      steps) while every TRAINABLE stack at this
#                      geometry converges; continue the SAME head with
#                      encoders unfrozen (finetune_encoders, PARITY.md)
#                      at 3e-4 in a COPY of the workdir so the frozen
#                      state stays available for parity legs.
#   2. skel_ladder16k— skeletal pretrain 1e-4 persistence leg doubled
#                      (8000 -> 16000 total): 0.1386 -> 0.839 measured
#                      for the first 8000; VERDICT item 3 wants >=0.99.
#                      REQUIRE_ENC=1.01 makes the invocation abort
#                      after the pretrain+measurement (exit 3 expected
#                      = success for this stage).
#   3. curriculum_acc— wall-clock-to-accuracy 3-stage curriculum at
#                      reference geometry (VERDICT item 5), with the
#                      finetune continuation for the fusion stage.
#   4. fusion_b8     — reference-parity dynamics for the FROZEN head:
#                      fresh biased head grafted on the (by then
#                      improved) pretrains, batch 8 + lr 1e-4 constant
#                      (the reference trains this stage at batch 2 /
#                      1e-4 for 15-80k steps; big-batch 3e-3 was never
#                      its recipe). 6000 epochs x 16 steps = 96k steps.
set -u
ART=${MGR_TPU_R4_ART:-/root/r4}
cd "$(dirname "$0")/.."

note() { echo "$(date -u '+%m-%d %H:%M:%S') $*" >> "$ART/queue_d.log"; }

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

stage() {  # stage <name> [ok_rc...] -- cmd...
  local name=$1; shift
  local ok_rcs=""
  while [ "$1" != "--" ]; do ok_rcs="$ok_rcs $1"; shift; done
  shift
  if [ -e "$ART/$name.done" ]; then note "skip $name (done)"; return 0; fi
  canary_gate
  note "start $name"
  "$@" > "$ART/$name.log" 2>&1
  local rc=$?
  note "done $name rc=$rc"
  case " 0$ok_rcs " in *" $rc "*) touch "$ART/$name.done";; esac
  return 0
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

# Shared env of the legs-1/3/4 campaign (same corpus root + ladder so
# the pretrain fits resume as no-ops).
COMMON_ENV=(
  MGR_TPU_CONV_ONLY=late_fusion
  MGR_TPU_CONV_FILES=160
  MGR_TPU_CONV_BATCH=32
  MGR_TPU_CONV_GUARD=1
  MGR_TPU_CONV_SYNC=10
  MGR_TPU_CONV_ROOT="$ART/root_fusion"
  MGR_TPU_CONV_PRETRAIN=2000
  MGR_TPU_CONV_PRETRAIN_BLANK_BIAS=skeletal:-3
)

# --- 1. finetune continuation of the stalled frozen head -------------
if [ ! -e "$ART/fusion_wd_ft/late_fusion_latest.msgpack" ]; then
  note "copying fusion_wd -> fusion_wd_ft"
  rm -rf "$ART/fusion_wd_ft"
  cp -a "$ART/fusion_wd" "$ART/fusion_wd_ft"
fi
stage fusion_ft -- env "${COMMON_ENV[@]}" \
  MGR_TPU_CONV_WORKDIR="$ART/fusion_wd_ft" \
  MGR_TPU_CONV_PRETRAIN_LADDER="speech:3e-4x3000;skeletal:3e-4x5000+1e-4x8000" \
  MGR_TPU_CONV_REQUIRE_ENC=0.5 \
  MGR_TPU_CONV_RESUME=1 MGR_TPU_CONV_LR=3e-3 MGR_TPU_CONV_EPOCHS=9000 \
  MGR_TPU_CONV_BLANK_BIAS=-3 \
  MGR_TPU_CONV_LR2=3e-4 MGR_TPU_CONV_EPOCHS2=3000 MGR_TPU_CONV_FINETUNE=1 \
  python examples/tpu_convergence_check.py
note "fusion_ft accuracy: $(acc_of "$ART/fusion_ft.log")"

# --- 2. skeletal pretrain persistence doubled (VERDICT item 3) -------
# exit 3 (abort: encoder below the impossible 1.01 floor) is the
# EXPECTED success path — the stage exists for the pretrain extension
# and the printed encoder_train_accuracy measurement.
stage skel_ladder16k 3 -- env "${COMMON_ENV[@]}" \
  MGR_TPU_CONV_WORKDIR="$ART/fusion_wd" \
  MGR_TPU_CONV_PRETRAIN_LADDER="speech:3e-4x3000;skeletal:3e-4x5000+1e-4x16000" \
  MGR_TPU_CONV_REQUIRE_ENC=1.01 \
  MGR_TPU_CONV_LR=3e-3 MGR_TPU_CONV_EPOCHS=9000 \
  python examples/tpu_convergence_check.py

# --- 3. wall-clock-to-accuracy curriculum (VERDICT item 5) -----------
stage curriculum_acc_r4d -- env MGR_TPU_CB_MEASURED=1 MGR_TPU_CB_EPOCHS=3000 \
  MGR_TPU_CB_ACC_TARGET="speech:0.95,skeletal:0.95,late_fusion:0.9" \
  MGR_TPU_CB_ACC_EVERY=250 \
  MGR_TPU_CB_BLANK_BIAS="skeletal:-3,late_fusion:-3" \
  MGR_TPU_CB_SYNC_EVERY=10 \
  MGR_TPU_CB_FINETUNE_EPOCHS=2000 MGR_TPU_CB_FINETUNE_LR=3e-4 \
  python examples/curriculum_bench.py

# --- 4. reference-parity small-batch frozen head ---------------------
# Fresh graft (late_fusion checkpoints removed from the copy) picks up
# the skel_ladder16k-improved skeletal encoder; batch 8 / lr 1e-4
# constant approximates the reference's batch-2 1e-4 recipe.
# Guard on the DIRECTORY, not the .done sentinel: a queue restart
# mid-stage must not wipe fusion progress (the copy happens once).
if [ ! -d "$ART/fusion_wd_b8" ]; then
  cp -a "$ART/fusion_wd" "$ART/fusion_wd_b8"
  rm -f "$ART/fusion_wd_b8"/late_fusion_*
fi
stage fusion_b8 -- env "${COMMON_ENV[@]}" \
  MGR_TPU_CONV_WORKDIR="$ART/fusion_wd_b8" \
  MGR_TPU_CONV_PRETRAIN_LADDER="speech:3e-4x3000;skeletal:3e-4x5000+1e-4x16000" \
  MGR_TPU_CONV_REQUIRE_ENC=0.5 \
  MGR_TPU_CONV_LR=1e-4 MGR_TPU_CONV_EPOCHS=6000 \
  MGR_TPU_CONV_FUSION_BATCH=8 MGR_TPU_CONV_BLANK_BIAS=-3 \
  python examples/tpu_convergence_check.py
note "fusion_b8 accuracy: $(acc_of "$ART/fusion_b8.log")"

note "queue_d complete"
