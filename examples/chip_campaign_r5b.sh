#!/bin/bash
# Round-5b chip queue — the ONE-COMMAND measured curriculum.
#
# Round 5's headline rows (BASELINE.md) were COMPOSED from separate
# queue stages sharing a workdir. This queue runs the same measured
# recipe as a SINGLE curriculum_bench invocation, now expressible via
# the per-stage batch/LR tables: trainable encoder pretrains at
# big-batch 3e-3 (ReduceLROnPlateau annealing toward the measured
# 1e-4-persistence ladder), then the FROZEN fusion head under
# reference dynamics (B=8, constant 1e-4, blank-biased fresh head) —
# the recipe that measured 0.9027 at production geometry.
#
# Geometry is the calibrated 160-file corpus (the recipes above were
# measured at 160x1900); targets are decode accuracy per stage, the
# unit the reference's 94% headline is stated in.
#
# Launch (ONE gate process machine-wide; kill older queues by exact
# pid first — canary-storm rule):
#   setsid nohup bash examples/chip_campaign_r5b.sh < /dev/null > /root/r5/queue_b.out 2>&1 &
#   echo $! > /root/r5/queue_b.pid
set -u
ART=${MGR_TPU_R5_ART:-/root/r5}
mkdir -p "$ART"
cd "$(dirname "$0")/.."

note() { echo "$(date -u '+%m-%d %H:%M:%S') $*" >> "$ART/queue_b.log"; }

canary_gate() {
  local tries=0
  while true; do
    tries=$((tries + 1))
    # Steady-latency discriminator (examples/canary.py): a recovering
    # relay answers the first op in 100-240 s (remote compile) while
    # steady fetches are ~0 s — gate on the SECOND, cache-hit op only.
    if timeout 300 python examples/canary.py >> "$ART/canary_b.log" 2>&1; then
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

# --- one-command wall-clock-to-accuracy curriculum -------------------
# MGR_TPU_CB_WORKDIR makes relay deaths resumable: completed stages
# return immediately, the in-flight stage continues from `latest`.
# EPOCHS=16000 is the per-stage CEILING (the skeletal 1e-4-persistence
# ladder needed 16k total epochs to reach 0.9986); accuracy targets
# stop each stage early via ACC_EVERY-epoch decode probes.
stage curriculum_1cmd 8 -- env \
  MGR_TPU_CB_MEASURED=1 \
  MGR_TPU_CB_NTRAIN=160 MGR_TPU_CB_NVAL=40 \
  MGR_TPU_CB_EPOCHS=16000 \
  MGR_TPU_CB_WORKDIR="$ART/curriculum_1cmd_wd" \
  MGR_TPU_CB_ACC_TARGET="speech:0.95,skeletal:0.9,late_fusion:0.85" \
  MGR_TPU_CB_ACC_EVERY=400 \
  MGR_TPU_CB_STAGE_BATCH="speech:32,skeletal:32,late_fusion:8" \
  MGR_TPU_CB_STAGE_LR="speech:3e-3,skeletal:3e-3,late_fusion:1e-4" \
  MGR_TPU_CB_BLANK_BIAS="speech:-3,skeletal:-3,late_fusion:-3" \
  MGR_TPU_CB_SYNC_EVERY=10 \
  MGR_TPU_CB_FINETUNE_EPOCHS=3000 MGR_TPU_CB_FINETUNE_LR=3e-4 \
  python examples/curriculum_bench.py

note "queue_r5b complete"
