#!/bin/bash
# Round-5 chip queue — the host was reset between rounds 4 and 5, so
# every /root/r4 checkpoint (incl. the 1.0 speech / 0.9986 skeletal
# pretrain donors) is gone. This queue rebuilds them and runs the
# reference-parity FROZEN fusion arm that round 4 never reached
# (VERDICT r4 item 1). Launch (ONE gate process machine-wide):
#   setsid nohup bash examples/chip_campaign_r5.sh < /dev/null > /root/r5/queue.out 2>&1 &
#   echo $! > /root/r5/queue.pid
#
# Stages:
#   1. pretrains      — rebuild both encoder donors with the measured
#                       round-4 recipe (speech 3e-4x3000 anneal leg;
#                       skeletal ladder 3e-4x5000 + 1e-4x16000 — the
#                       recipe that reached 0.9986). REQUIRE_ENC=1.01
#                       aborts after the pretrain + measurement
#                       (exit 3 = success for this stage).
#   2. fusion_b8      — reference-parity dynamics for the FROZEN head:
#                       fresh biased head (blank_bias -3) on the stage-1
#                       donors, batch 8 / constant lr 1e-4, 6000 epochs
#                       x 20 steps = 120k steps (the reference trains
#                       this stage at batch 2 / 1e-4 for 15-80k steps,
#                       multimodal.py:206-213). RESUME=1 is crash-safe:
#                       no late_fusion ckpt = fresh head; a relay death
#                       mid-stage continues from `latest`.
#   3. generalization — held-out accuracy rows (VERDICT r4 item 4):
#                       monitor="val" + EarlyStopping decoding UNSEEN
#                       files at production geometry.
#   4. curriculum_acc — wall-clock-to-accuracy 3-stage curriculum
#                       (VERDICT r4 item 6), requeued from round 4d
#                       (died rc=1 on a relay FAILED_PRECONDITION)
#                       now with the source_configs finetune fix.
#   5. fusion_b2      — exact reference batch (data_generator.py:30):
#                       B=2, constant 1e-4, 1200 epochs x 80 steps =
#                       96k steps. Optional tail; safe to kill.
set -u
ART=${MGR_TPU_R5_ART:-/root/r5}
cd "$(dirname "$0")/.."

note() { echo "$(date -u '+%m-%d %H:%M:%S') $*" >> "$ART/queue.log"; }

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

stage() {  # stage <name> <max_tries> [ok_rc...] -- cmd...
  local name=$1 max_tries=$2; shift 2
  local ok_rcs=""
  while [ "$1" != "--" ]; do ok_rcs="$ok_rcs $1"; shift; done
  shift
  local try=0
  while [ $try -lt "$max_tries" ]; do
    try=$((try + 1))
    if [ -e "$ART/$name.done" ]; then note "skip $name (done)"; return 0; fi
    canary_gate
    note "start $name (try $try/$max_tries)"
    "$@" >> "$ART/$name.log" 2>&1
    local rc=$?
    note "done $name rc=$rc (try $try)"
    case " 0$ok_rcs " in
      *" $rc "*) touch "$ART/$name.done"; return 0;;
    esac
  done
  note "GAVE UP on $name after $max_tries tries"
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

# Same corpus/ladder env as round 4d so resume geometry is stable
# across stages and relaunches.
COMMON_ENV=(
  MGR_TPU_CONV_ONLY=late_fusion
  MGR_TPU_CONV_FILES=160
  MGR_TPU_CONV_BATCH=32
  MGR_TPU_CONV_GUARD=1
  MGR_TPU_CONV_SYNC=10
  MGR_TPU_CONV_ROOT="$ART/root_fusion"
  MGR_TPU_CONV_PRETRAIN=2000
  MGR_TPU_CONV_PRETRAIN_BLANK_BIAS=skeletal:-3
  MGR_TPU_CONV_PRETRAIN_LADDER="speech:3e-4x3000;skeletal:3e-4x5000+1e-4x16000"
)

# --- 1. rebuild the pretrain donors (host reset wiped /root/r4) ------
# exit 3 (abort: encoder below the impossible 1.01 floor) is the
# EXPECTED success path; retries make relay deaths resume mid-ladder.
# (A chip-lock collision exits 75 — EX_TEMPFAIL, distinct by design —
# so rc=3 here always means the REQUIRE_ENC measurement ran.)
stage pretrains 6 3 -- env "${COMMON_ENV[@]}" \
  MGR_TPU_CONV_WORKDIR="$ART/fusion_wd" \
  MGR_TPU_CONV_REQUIRE_ENC=1.01 \
  MGR_TPU_CONV_LR=3e-3 MGR_TPU_CONV_EPOCHS=9000 \
  python examples/tpu_convergence_check.py
note "pretrains: $(grep -o '"encoder_train_accuracy": {[^}]*}' "$ART/pretrains.log" | tail -1)"

# --- 2. reference-parity small-batch frozen head (VERDICT r4 #1) -----
# Guard on the DIRECTORY: a queue restart mid-stage must not wipe
# fusion progress (the copy happens once; late_fusion_* removed so the
# FIRST attempt grafts a fresh biased head; RESUME=1 continues after).
if [ ! -d "$ART/fusion_wd_b8" ]; then
  cp -a "$ART/fusion_wd" "$ART/fusion_wd_b8"
  rm -f "$ART/fusion_wd_b8"/late_fusion_*
fi
stage fusion_b8 6 -- env "${COMMON_ENV[@]}" \
  MGR_TPU_CONV_WORKDIR="$ART/fusion_wd_b8" \
  MGR_TPU_CONV_REQUIRE_ENC=0.5 \
  MGR_TPU_CONV_RESUME=1 \
  MGR_TPU_CONV_LR=1e-4 MGR_TPU_CONV_EPOCHS=6000 \
  MGR_TPU_CONV_FUSION_BATCH=8 MGR_TPU_CONV_BLANK_BIAS=-3 \
  python examples/tpu_convergence_check.py
note "fusion_b8 accuracy: $(acc_of "$ART/fusion_b8.log")"

# --- 3. held-out generalization rows (VERDICT r4 #4) -----------------
# fit(monitor="val") + EarlyStopping selecting a best-val state that
# decodes UNSEEN files at production geometry — the reference's
# quality-control loop (speech_lstm_ctc_words.py:167-178). PATIENCE=50
# val windows (x SYNC 10 = 500 epochs) rides out the CTC blank-basin
# plateau before the escape.
stage generalization 3 -- env \
  MGR_TPU_GEN_ROOT="$ART/root_gen" \
  MGR_TPU_GEN_FILES=200 MGR_TPU_GEN_EPOCHS=3000 \
  MGR_TPU_GEN_BATCH=32 MGR_TPU_GEN_SYNC=10 \
  MGR_TPU_GEN_PATIENCE=50 MGR_TPU_GEN_GUARD=1 \
  python examples/generalization_check.py

# --- 4. wall-clock-to-accuracy curriculum (VERDICT r4 #6, requeue) ---
# MGR_TPU_CB_WORKDIR: a relay crash mid-run resumes instead of
# restarting (the round-4d failure mode). NOTE: the 19:10Z queue
# instance buffered this script before this line was added and runs
# the stage in tempdir mode; the knob serves relaunches.
stage curriculum_acc_r5 2 -- env MGR_TPU_CB_MEASURED=1 MGR_TPU_CB_EPOCHS=3000 \
  MGR_TPU_CB_WORKDIR="$ART/curriculum_wd" \
  MGR_TPU_CB_ACC_TARGET="speech:0.95,skeletal:0.95,late_fusion:0.9" \
  MGR_TPU_CB_ACC_EVERY=250 \
  MGR_TPU_CB_BLANK_BIAS="skeletal:-3,late_fusion:-3" \
  MGR_TPU_CB_SYNC_EVERY=10 \
  MGR_TPU_CB_FINETUNE_EPOCHS=2000 MGR_TPU_CB_FINETUNE_LR=3e-4 \
  python examples/curriculum_bench.py

# --- 5. exact reference batch (optional tail; safe to kill) ----------
if [ ! -d "$ART/fusion_wd_b2" ]; then
  cp -a "$ART/fusion_wd" "$ART/fusion_wd_b2"
  rm -f "$ART/fusion_wd_b2"/late_fusion_*
fi
stage fusion_b2 3 -- env "${COMMON_ENV[@]}" \
  MGR_TPU_CONV_WORKDIR="$ART/fusion_wd_b2" \
  MGR_TPU_CONV_REQUIRE_ENC=0.5 \
  MGR_TPU_CONV_RESUME=1 \
  MGR_TPU_CONV_LR=1e-4 MGR_TPU_CONV_EPOCHS=1200 \
  MGR_TPU_CONV_FUSION_BATCH=2 MGR_TPU_CONV_BLANK_BIAS=-3 \
  python examples/tpu_convergence_check.py
note "fusion_b2 accuracy: $(acc_of "$ART/fusion_b2.log")"

note "queue_r5 complete"
