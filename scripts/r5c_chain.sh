#!/bin/bash
# Round-5 post-reset orchestrator. The host reset wiped the untracked
# logs/mp40_geo2 run and every round-5 generation cache; this chain replays
# the whole measurement queue unattended:
#
#   chip lane (strictly serial, one TPU client at a time):
#     wait -> geo2train (3000 ep) -> memogen -> evalgen -> protogen ->
#     priorgen -> metagen -> dualtrain -> dualeval
#   CPU lane (one worker, consumes a queue; safe beside chip phases):
#     memoscore -> evalscore -> protoheld -> protoscore -> priorscore ->
#     metascore
#
# Launch detached:  setsid nohup bash scripts/r5c_chain.sh > /tmp/r5c.log 2>&1 &
# Stop:             kill $(cat /tmp/r5c.pid /tmp/r5c_cpu.pid)  (children are
#                   their own processes — kill the per-phase pids in /tmp/*.log)
set -u
cd "$(dirname "$0")/.."
echo $$ > /tmp/r5c.pid
log() { echo "[r5c $(date +%H:%M:%S)] $*"; }

CPU_Q=/tmp/r5c_cpu_queue
: > "$CPU_Q"

# Serialized CPU worker: pops phase names appended to $CPU_Q, runs them one
# at a time (1-core host — two FIRE-relax scoring passes would thrash).
(
  n=0
  while :; do
    total=$(wc -l < "$CPU_Q" 2>/dev/null || echo 0)
    if [ "$n" -lt "$total" ]; then
      n=$((n + 1))
      ph=$(sed -n "${n}p" "$CPU_Q")
      [ "$ph" = "DONE" ] && break
      echo "[r5c-cpu $(date +%H:%M:%S)] start $ph"
      bash scripts/r5b_measure.sh "$ph"
      echo "[r5c-cpu $(date +%H:%M:%S)] done $ph"
    else
      sleep 60
    fi
  done
  echo "[r5c-cpu $(date +%H:%M:%S)] queue drained"
) > /tmp/r5c_cpu.log 2>&1 &
echo $! > /tmp/r5c_cpu.pid

bash scripts/r5_measure.sh wait geo2train
bash scripts/r5b_measure.sh geo2wait memogen
echo memoscore >> "$CPU_Q"
bash scripts/r5b_measure.sh evalgen
echo evalscore >> "$CPU_Q"
bash scripts/r5b_measure.sh protogen
echo protoheld >> "$CPU_Q"
echo protoscore >> "$CPU_Q"
bash scripts/r5b_measure.sh priorgen
echo priorscore >> "$CPU_Q"
bash scripts/r5b_measure.sh metagen
echo metascore >> "$CPU_Q"
bash scripts/r5b_measure.sh dualtrain dualeval
echo dualscore >> "$CPU_Q"
echo DONE >> "$CPU_Q"
log "chip lane done (CPU worker may still be draining; see /tmp/r5c_cpu.log)"
