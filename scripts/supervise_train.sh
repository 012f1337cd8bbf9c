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
while true; do
  env "${ENVS[@]}" "$@" >> "$LOG" 2>&1 &
  CHILD=$!
  echo "$CHILD" > "$PIDFILE"
  wait "$CHILD"
  RC=$?
  echo "supervisor: child $CHILD exited rc=$RC $(date -u +%H:%M:%S)" >> "$LOG"
  if [[ $RC -eq 0 ]]; then rm -f "$PIDFILE"; echo "supervisor: run complete" >> "$LOG"; break; fi
  if [[ ! -f "$PIDFILE" ]]; then echo "supervisor: pid file removed, stopping" >> "$LOG"; break; fi
  sleep 5
done
