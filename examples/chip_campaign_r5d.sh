#!/bin/bash
# Round-5d chip queue — HELD-OUT generalization for the FLAGSHIP
# capability: the full frozen-encoder curriculum under the reference's
# quality-control loop, decoded on files no stage ever trained on.
#
# generalization_check's late_fusion stage: shared-label two-stream
# corpus (audio at 5x the skeletal frame rate), encoder pretrains with
# fit(monitor='val') + EarlyStopping, best-VAL encoders grafted and
# FROZEN, fusion head under reference dynamics (B=8, constant 1e-4,
# blank-biased fresh head — the fusion_b8/1cmd measured recipe).
#
# Regularization per stage: speech keeps the committed row's 0.1s;
# skeletal runs at the 1cmd-curriculum strength (dropout/noise 0.05,
# no per-gate) — r5c measured that 0.1+per-gate pins the skeletal
# blank-floor plateau and the anneal freezes it there.
#
# Launch (ONE gate process machine-wide; kill older queues by exact
# pid first; verify the pid via ps, not $!):
#   setsid nohup bash examples/chip_campaign_r5d.sh < /dev/null > /root/r5/queue_d.out 2>&1 &
set -u
ART=${MGR_TPU_R5_ART:-/root/r5}
mkdir -p "$ART"
cd "$(dirname "$0")/.."

note() { echo "$(date -u '+%m-%d %H:%M:%S') $*" >> "$ART/queue_d.log"; }

canary_gate() {
  local tries=0
  while true; do
    tries=$((tries + 1))
    if timeout 300 python examples/canary.py >> "$ART/canary_d.log" 2>&1; then
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

# --- held-out fusion curriculum --------------------------------------
# ROOT persists corpus + checkpoints + pretrain sentinels, so relay
# deaths resume mid-curriculum (plateau state survives restarts too).
# Attempt 1 (gen_fusion, k=1..20 sparse corpus) measured: speech val
# 0.9246 but the skeletal stage froze flat at 8.97 — low-density files
# (~50% padding on average) pin the skeletal stack in the blank basin.
# Attempt 2 runs at ChaLearn density (k=8..20, MIN_LABELS) with a
# REQUIRE_ENC gate so a bad pretrain aborts (rc=3) instead of wasting
# the 40-min fusion leg on garbage features.
stage gen_fusion2 8 3 -- env \
  MGR_TPU_GEN_ONLY=late_fusion \
  MGR_TPU_GEN_EPOCHS=4000 \
  MGR_TPU_GEN_PATIENCE=60 \
  MGR_TPU_GEN_GUARD=1 \
  MGR_TPU_GEN_MIN_LABELS=8 \
  MGR_TPU_GEN_REQUIRE_ENC=0.85 \
  MGR_TPU_GEN_DROPOUT="speech:0.1,skeletal:0.05" \
  MGR_TPU_GEN_NOISE="speech:0.1,skeletal:0.05" \
  MGR_TPU_GEN_PERGATE="speech:1,skeletal:0" \
  MGR_TPU_GEN_RLR="skeletal:0.5/15/1e-4" \
  MGR_TPU_GEN_FUSION_BATCH=8 \
  MGR_TPU_GEN_FUSION_LR=1e-4 \
  MGR_TPU_GEN_FUSION_EPOCHS=6000 \
  MGR_TPU_GEN_ROOT="$ART/gen_fusion2" \
  python examples/generalization_check.py

note "queue_r5d complete"
