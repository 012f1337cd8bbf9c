#!/usr/bin/env bash
# Relaunch supervisor for long TPU trainings.
#
# The axon tunnel leaks every host->device transfer buffer (~15 MB/step at batch 64,
# CLAUDE.md), so multi-hour runs grow host RSS until the kernel OOM-kills the python
# process. Training checkpoints at every val and auto-resumes (training/state.py::
# maybe_restore continues the step counter), so the fix is simply to relaunch:
#
#   scripts/supervise_train.sh /tmp/run.pid /tmp/run.log env1=v1 ... -- python script.py
#
# Writes the CURRENT child pid to $1 after each relaunch (kill "$(cat $1)" + rm the pid
# file to stop the loop; never pkill -f, which matches your own shell). Appends child
# stdout/stderr to $2. Stops when the child exits 0 (run complete) or the pid file is
# removed.
set -u
PIDFILE=$1; shift
LOG=$1; shift
ENVS=()
while [[ $# -gt 0 && "$1" != "--" ]]; do ENVS+=("$1"); shift; done
[[ "${1:-}" == "--" ]] && shift
echo "supervisor $$: ${ENVS[*]} $*" >> "$LOG"
# Crash-loop breaker (round-4 incident: 20 identical fast failures, ~4.5 h of tunnel
# warmups burned). MAX_FAST consecutive exits faster than FAST_S seconds => stop and
# leave a loud marker with the last log tail instead of hammering the tunnel forever.
FAST_S=${SUPERVISE_FAST_S:-600}
MAX_FAST=${SUPERVISE_MAX_FAST:-4}
FASTCOUNT=0
while true; do
  T0=$(date +%s)
  env "${ENVS[@]}" "$@" >> "$LOG" 2>&1 &
  CHILD=$!
  echo "$CHILD" > "$PIDFILE"
  wait "$CHILD"
  RC=$?
  ELAPSED=$(( $(date +%s) - T0 ))
  echo "supervisor: child $CHILD exited rc=$RC after ${ELAPSED}s $(date -u +%H:%M:%S)" >> "$LOG"
  if [[ $RC -eq 0 ]]; then rm -f "$PIDFILE"; echo "supervisor: run complete" >> "$LOG"; break; fi
  if [[ ! -f "$PIDFILE" ]]; then echo "supervisor: pid file removed, stopping" >> "$LOG"; break; fi
  if [[ $ELAPSED -lt $FAST_S ]]; then FASTCOUNT=$((FASTCOUNT + 1)); else FASTCOUNT=0; fi
  if [[ $FASTCOUNT -ge $MAX_FAST ]]; then
    MARKER="${PIDFILE%.pid}.crashloop"
    { echo "supervisor: CRASH LOOP — $FASTCOUNT consecutive exits under ${FAST_S}s; stopping $(date -u +%H:%M:%S)"
      echo "--- last 60 log lines ---"
      tail -n 60 "$LOG"
    } > "$MARKER"
    echo "supervisor: crash loop detected, stopping (marker: $MARKER)" >> "$LOG"
    rm -f "$PIDFILE"
    break
  fi
  sleep 5
done
