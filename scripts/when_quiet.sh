#!/bin/bash
# Wait until the host is quiet (steal <= 2% and busy <= 15% for 3 straight
# 5 s samples from steal_monitor.log), then exec the given command.
# Usage: scripts/when_quiet.sh [--max-wait SECS] cmd args...
LOG=/tmp/steal_monitor.log
MAXW=900
if [ "$1" = "--max-wait" ]; then MAXW="$2"; shift 2; fi
t0=$(date +%s)
while true; do
  ok=1
  while read -r line; do
    s=$(echo "$line" | grep -oE 'steal_pct=[0-9]+' | cut -d= -f2)
    b=$(echo "$line" | grep -oE 'busy_pct=[0-9]+' | cut -d= -f2)
    if [ "${s:-99}" -gt 2 ] || [ "${b:-99}" -gt 15 ]; then ok=0; fi
  done < <(tail -3 "$LOG")
  now=$(date +%s)
  if [ "$ok" = 1 ]; then break; fi
  if [ $((now - t0)) -gt "$MAXW" ]; then
    echo "# when_quiet: gave up after ${MAXW}s (running anyway)" >&2
    break
  fi
  sleep 5
done
exec "$@"
