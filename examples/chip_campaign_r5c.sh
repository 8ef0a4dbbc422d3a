#!/bin/bash
# Round-5c chip queue — skeletal HELD-OUT generalization with the
# measured anneal recipe.
#
# The round-5 generalization row (BASELINE.md) is split: speech clears
# the >0.8 val bar (0.8642) but skeletal early-stopped at val 0.119
# inside its known constant-3e-3 oscillation floor. The one-command
# curriculum then measured the remedy on the SAME family of corpora:
# blank-biased head + ReduceLROnPlateau(0.5/15/1e-4) on the train loss
# reaches 0.9962 train in 400 epochs. This queue reruns the skeletal
# generalization with that anneal (MGR_TPU_GEN_RLR) and a patience
# ceiling that outlasts the pre-anneal plateau.
#
# Launch (ONE gate process machine-wide; kill older queues by exact
# pid first — canary-storm rule; verify the pid via ps, not $!):
#   setsid nohup bash examples/chip_campaign_r5c.sh < /dev/null > /root/r5/queue_c.out 2>&1 &
set -u
ART=${MGR_TPU_R5_ART:-/root/r5}
mkdir -p "$ART"
cd "$(dirname "$0")/.."

note() { echo "$(date -u '+%m-%d %H:%M:%S') $*" >> "$ART/queue_c.log"; }

canary_gate() {
  local tries=0
  while true; do
    tries=$((tries + 1))
    if timeout 300 python examples/canary.py >> "$ART/canary_c.log" 2>&1; then
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

# --- skeletal held-out generalization, annealed recipe ---------------
# ROOT persists the corpus + checkpoints so relay deaths resume (the
# plateau controller state now survives restarts too — fitmeta).
stage gen_skel_rlr 8 -- env \
  MGR_TPU_GEN_ONLY=skeletal \
  MGR_TPU_GEN_RLR="skeletal:0.5/15/1e-4" \
  MGR_TPU_GEN_EPOCHS=4000 \
  MGR_TPU_GEN_PATIENCE=40 \
  MGR_TPU_GEN_GUARD=1 \
  MGR_TPU_GEN_ROOT="$ART/gen_skel_rlr" \
  python examples/generalization_check.py

note "queue_r5c complete"
