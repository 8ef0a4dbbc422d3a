#!/bin/bash
# Round-5e chip queue — frozen fusion head at the reference's EXACT
# dynamics (batch 2, constant 1e-4: multimodal.py:206-213 +
# data_generator.py:30), held-out decode.
#
# Reuses the r5d gen_fusion pretrains: copies the ROOT (corpus +
# best-VAL encoder checkpoints + pretrain sentinels), deletes the
# B=8 fusion head's checkpoints so generalization_check regrafts a
# FRESH biased head and trains it at B=2 — the exact-parity arm the
# r4 verdict asked for, now with held-out accuracy as the endpoint.
#
# Launch AFTER queue_d drains (ONE gate process machine-wide):
#   setsid nohup bash examples/chip_campaign_r5e.sh < /dev/null > /root/r5/queue_e.out 2>&1 &
set -u
ART=${MGR_TPU_R5_ART:-/root/r5}
mkdir -p "$ART"
cd "$(dirname "$0")/.."

note() { echo "$(date -u '+%m-%d %H:%M:%S') $*" >> "$ART/queue_e.log"; }

canary_gate() {
  local tries=0
  while true; do
    tries=$((tries + 1))
    if timeout 300 python examples/canary.py >> "$ART/canary_e.log" 2>&1; then
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

# Seed the B=2 root from the drained r5d run (idempotent: skipped when
# the copy already exists, e.g. a relaunch mid-fusion-stage).
if [ ! -d "$ART/gen_fusion_b2" ]; then
  if [ ! -e "$ART/gen_fusion2.done" ]; then
    note "ABORT: r5d gen_fusion2 has not drained — run queue_d first"
    exit 1
  fi
  cp -r "$ART/gen_fusion2" "$ART/gen_fusion_b2"
  rm -f "$ART/gen_fusion_b2"/workdir/late_fusion_*
  note "seeded gen_fusion_b2 from gen_fusion2 (fresh fusion head)"
fi

stage gen_fusion_b2 8 -- env \
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
  MGR_TPU_GEN_FUSION_BATCH=2 \
  MGR_TPU_GEN_FUSION_LR=1e-4 \
  MGR_TPU_GEN_FUSION_EPOCHS=2000 \
  MGR_TPU_GEN_ROOT="$ART/gen_fusion_b2" \
  python examples/generalization_check.py

note "queue_r5e complete"
