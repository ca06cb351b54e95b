#!/usr/bin/env bash
# Stall-tolerant supervisor for long TPU runs through the axon tunnel.
#
# The tunnel occasionally drops an RPC and the client blocks forever on a
# socket read (observed: training runs freezing mid-compile with the main
# thread in tcp_recvmsg). Long runs therefore checkpoint every few hundred
# steps and auto-resume; this wrapper provides the kill-and-relaunch half:
# if none of the watched progress files change for STALL_S seconds, the
# run is killed (by specific PID) and restarted, resuming from its newest
# checkpoint via the run script's own resume logic.
#
#   tools/watchdog_run.sh <stall_seconds> <max_restarts> <logfile> \
#       <progress_glob> -- <command...>
set -u
STALL_S=$1; MAX_RESTARTS=$2; LOG=$3; GLOB=$4; shift 4
[ "$1" = "--" ] && shift

newest_mtime() {
  local t=0 f
  for f in $GLOB "$LOG"; do
    [ -e "$f" ] || continue
    local m
    m=$(stat -c %Y "$f" 2>/dev/null || echo 0)
    [ "$m" -gt "$t" ] && t=$m
  done
  echo "$t"
}

attempt=0
while [ "$attempt" -le "$MAX_RESTARTS" ]; do
  attempt=$((attempt + 1))
  echo "[watchdog] attempt $attempt: $*" >> "$LOG.watchdog"
  PYTHONUNBUFFERED=1 "$@" >> "$LOG" 2>&1 &
  pid=$!
  while kill -0 "$pid" 2>/dev/null; do
    sleep 30
    now=$(date +%s)
    last=$(newest_mtime)
    if [ "$last" -gt 0 ] && [ $((now - last)) -gt "$STALL_S" ]; then
      echo "[watchdog] stall: no progress for $((now - last))s, killing $pid" \
        >> "$LOG.watchdog"
      kill "$pid" 2>/dev/null
      sleep 5
      kill -9 "$pid" 2>/dev/null
      break
    fi
  done
  wait "$pid" 2>/dev/null
  rc=$?
  if [ "$rc" -eq 0 ]; then
    echo "[watchdog] completed ok after $attempt attempt(s)" >> "$LOG.watchdog"
    exit 0
  fi
  echo "[watchdog] exit code $rc; restarting" >> "$LOG.watchdog"
  sleep 10
done
echo "[watchdog] giving up after $MAX_RESTARTS restarts" >> "$LOG.watchdog"
exit 1
