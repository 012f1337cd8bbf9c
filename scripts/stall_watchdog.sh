#!/usr/bin/env bash
# Tunnel-wedge watchdog for the TPU evidence queue.
#
# Twice in round 5 the queue's python froze mid-run with CPU time pinned (futex wait on a
# dead axon tunnel RPC: 15s CPU over 21 min, then 5:25 over 58 min) — a state neither the
# supervisor (watches exits) nor the crash-loop breaker (watches FAST exits) can see.
# This loop watches the newest python descendant of the queue pidfile's process: if its
# cumulative CPU time advances less than MIN_TICKS jiffies over WINDOW seconds, the child
# is killed (exact pid, never a pattern) so the supervisor relaunches and training
# auto-resumes from its checkpoint. False-positive cost: one relaunch (~2-5 min).
set -u
PIDFILE=${1:-/tmp/queue.pid}
WINDOW=${STALL_WINDOW:-900}
MIN_TICKS=${STALL_MIN_TICKS:-200}   # 2s of CPU per 15 min — a live TPU loop burns far more
LOG=${STALL_LOG:-/tmp/stall_watchdog.log}

cpu_ticks() {  # utime+stime of pid $1, in jiffies
  local s
  s=$(sed 's/.*) //' /proc/$1/stat 2>/dev/null) || return 1
  set -- $s
  echo $(( ${12} + ${13} ))
}

newest_py() {  # newest python descendant of the queue root
  local root=$1 pids="" p
  root=$(cat "$PIDFILE" 2>/dev/null) || return 1
  pids=$root
  local all="" next=""
  while [ -n "$pids" ]; do
    next=""
    for p in $pids; do
      all="$all $p"
      next="$next $(ps -o pid= --ppid "$p" 2>/dev/null | tr '\n' ' ')"
    done
    pids=$(echo $next | xargs 2>/dev/null || true)
  done
  for p in $all; do
    case "$(ps -o comm= -p "$p" 2>/dev/null)" in python*) echo "$p";; esac
  done | tail -1
}

# Second wedge signature (13:05 incident): the hang keeps a CPU heartbeat (~3s/min of
# keepalive ticks) that clears any safe MIN_TICKS threshold, but the queue log goes
# silent — every live stage echoes to it well within QUIET_S (training logs every ~30s,
# evals per batch, generation per chunk). Kill when the log is stale AND the python
# predates the staleness window (so short-lived fresh stages are never hit).
QUEUE_LOG=${STALL_QUEUE_LOG:-/tmp/queue.log}
QUIET_S=${STALL_QUIET_S:-1800}

py_age_s() {
  local e
  e=$(ps -o etimes= -p "$1" 2>/dev/null) || return 1
  echo "${e:-0}"
}

echo "stall_watchdog $$ watching $PIDFILE (window=${WINDOW}s min_ticks=$MIN_TICKS quiet=${QUIET_S}s)" >> "$LOG"
LAST_PID=""; LAST_TICKS=0
while true; do
  sleep "$WINDOW"
  [ -f "$PIDFILE" ] || { echo "pidfile gone; watchdog exiting $(date -u +%H:%M:%S)" >> "$LOG"; exit 0; }
  PY=$(newest_py "$PIDFILE") || continue
  [ -n "${PY:-}" ] || continue
  T=$(cpu_ticks "$PY") || continue
  AGE=$(py_age_s "$PY") || continue
  LOG_AGE=$(( $(date +%s) - $(stat -c %Y "$QUEUE_LOG" 2>/dev/null || date +%s) ))
  if [ "$PY" = "$LAST_PID" ] && [ $(( T - LAST_TICKS )) -lt "$MIN_TICKS" ]; then
    echo "WEDGE(cpu): pid $PY ticks $LAST_TICKS->$T over ${WINDOW}s; killing $(date -u +%H:%M:%S)" >> "$LOG"
    kill "$PY" 2>/dev/null
    LAST_PID=""
  elif [ "$LOG_AGE" -gt "$QUIET_S" ] && [ "$AGE" -gt "$QUIET_S" ]; then
    echo "WEDGE(quiet): $QUEUE_LOG silent ${LOG_AGE}s, pid $PY age ${AGE}s; killing $(date -u +%H:%M:%S)" >> "$LOG"
    kill "$PY" 2>/dev/null
    LAST_PID=""
  else
    LAST_PID=$PY; LAST_TICKS=$T
  fi
done
