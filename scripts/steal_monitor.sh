#!/bin/bash
# Log host steal%/idle% every 5 s so measurements can be correlated with
# co-tenant load (round-17: calib probes oscillated 1.0-6.2 on byte-identical
# code). Usage: scripts/steal_monitor.sh [logfile]
LOG="${1:-/tmp/steal_monitor.log}"
prev=($(grep '^cpu ' /proc/stat))
while true; do
  sleep 5
  cur=($(grep '^cpu ' /proc/stat))
  # fields: cpu user nice system idle iowait irq softirq steal
  du=$(( (cur[1]-prev[1]) + (cur[2]-prev[2]) + (cur[3]-prev[3]) ))
  didle=$(( cur[4]-prev[4] ))
  dsteal=$(( cur[8]-prev[8] ))
  tot=$(( du + didle + (cur[5]-prev[5]) + (cur[6]-prev[6]) + (cur[7]-prev[7]) + dsteal ))
  if [ "$tot" -gt 0 ]; then
    echo "$(date +%s) steal_pct=$(( 100*dsteal/tot )) busy_pct=$(( 100*du/tot )) idle_pct=$(( 100*didle/tot ))" >> "$LOG"
  fi
  prev=("${cur[@]}")
done
