#!/bin/bash
# Round-4 tail queue: early_fusion production row, run AFTER queue_b
# (fusion leg 3/4) drains. Same hand-off pattern as chip_campaign_r4b.sh
# — the running queues read their scripts incrementally, so late work
# ships as a new file that waits on the previous queue's pid.
#
#   setsid nohup bash examples/chip_campaign_r4c.sh < /dev/null > /root/r4/queue_c.out 2>&1 &
#   echo $! > /root/r4/queue_c.pid
#
# Guarded by MGR_TPU_R4C_CUTOFF (epoch secs): the stage is skipped when
# the clock is past it, keeping the chip free for the driver's
# end-of-round bench. The early_fusion corpus is PRE-GENERATED into
# $ART/root_ef on CPU while the fusion legs hold the chip, so this
# stage spends its window on training, not corpus IO.
set -u
ART=${MGR_TPU_R4_ART:-/root/r4}
cd "$(dirname "$0")/.."

note() { echo "$(date -u '+%m-%d %H:%M:%S') $*" >> "$ART/queue_c.log"; }

OLD_PID=$(cat "$ART/queue_b.pid" 2>/dev/null || echo 0)
if [ "$OLD_PID" != "0" ]; then
  note "waiting for queue_b pid $OLD_PID"
  while kill -0 "$OLD_PID" 2>/dev/null; do sleep 30; done
fi
note "queue_b drained"

CUTOFF=${MGR_TPU_R4C_CUTOFF:-0}
if [ "$CUTOFF" != "0" ] && [ "$(date +%s)" -gt "$CUTOFF" ]; then
  note "early_fusion skipped (past cutoff)"
  exit 0
fi

canary_gate() {
  local tries=0
  while true; do
    tries=$((tries + 1))
    # Bounded: past the cutoff the chip belongs to the driver's bench.
    if [ "$CUTOFF" != "0" ] && [ "$(date +%s)" -gt "$CUTOFF" ]; then
      note "canary window closed (past cutoff)"
      exit 0
    fi
    if timeout 240 python "$ART/canary.py" >> "$ART/canary.log" 2>&1; then
      note "canary pass (try $tries)"
      return 0
    fi
    note "canary fail (try $tries) — 10 min cooldown"
    sleep 600
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

# 1000 epochs: the sparse-corpus uni-modal stages memorize by ~1000
# (speech 1.000 / skeletal 0.997 rows); rgb hit loss 0.03 by epoch 1100
# of 1500. Keeps the stage inside the remaining round window.
stage early_fusion_r4c env MGR_TPU_CONV_ONLY=early_fusion \
  MGR_TPU_CONV_FILES=160 MGR_TPU_CONV_EPOCHS=1000 MGR_TPU_CONV_GUARD=1 \
  MGR_TPU_CONV_SYNC=10 MGR_TPU_CONV_ROOT="$ART/root_ef" \
  python examples/tpu_convergence_check.py

note "queue_c complete"
