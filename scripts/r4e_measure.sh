#!/bin/bash
# Round-4 closing queue (adaptive follower to r4d): waits for the live
# geo_memo_cell eval, then spends the remaining chip window by value:
#   1. geoscale  - held-out protocol on mp40_geo at cond_scale 4.0: does
#                  the 80x-stronger learned conditioning convert into
#                  held-out composition_matching >= 0.05 at higher CFG?
#   2. augmem    - aug_memo_cell at 40 rows (geo-vs-aug comparison on the
#                  596-row memorization rung) if the deadline allows
#   3. memgap    - CPU rms diagnostics on whatever memo caches exist
#   4. bench     - sanity bench if the chip is free early
# No TPU job is launched after its per-phase cutoff so the driver's
# end-of-round bench.py never contends with a live TPU client.
set -u
cd "$(dirname "$0")/.."
log() { echo "[r4e $(date +%H:%M:%S)] $*"; }
now() { date +%H%M | sed 's/^0//'; }

WAIT_PID="${1:-0}"
if [ "$WAIT_PID" != 0 ]; then
  log "waiting for pid $WAIT_PID (geo_memo_cell eval)"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
  log "pid $WAIT_PID exited"
  grep -A10 '^{' /tmp/geo_memo_cell.log | tail -11 || true
fi

if [ "$(now)" -lt 1440 ]; then
  log "geoscale: held-out eval, cond_scale 4.0"
  timeout 2400 python -m chemeleon_tpu.cli evaluate \
    -m logs/mp40_geo/checkpoints/best \
    --test-data .data_cache/mp40-smoke/test.csv --n-samples 8 \
    --cond-scale 4.0 --cache-generation \
    --save-path results/mp40_geo_eval_cs4 > /tmp/geoscale.log 2>&1
  log "geoscale exit=$?"; grep -A10 '^{' /tmp/geoscale.log | tail -11 || true
else
  log "skip geoscale (past 14:40)"
fi

if [ "$(now)" -lt 1440 ]; then
  log "aug_memo_cell: train-row memorization, mp40_comp_aug, 40 rows"
  timeout 3000 python -m chemeleon_tpu.cli evaluate \
    -m logs/mp40_comp_aug/checkpoints/best \
    --test-data .data_cache/mp40-smoke/train.csv \
    --n-samples 20 --max-rows 40 --csp --fixed-cell --cache-generation \
    --save-path results/aug_memo_cell > /tmp/aug_memo_cell.log 2>&1
  log "aug_memo_cell exit=$?"; grep -A10 '^{' /tmp/aug_memo_cell.log | tail -11 || true
else
  log "skip aug_memo_cell (past 14:40)"
fi

for spec in "geo|cell|_csp_cell" "aug|cell|_csp_cell"; do
  IFS='|' read -r tagname name tag <<< "$spec"
  [ -d "results/${tagname}_memo_${name}/gen_cache" ] || continue
  timeout 1800 python -m chemeleon_tpu.scripts.diag_structure_gap \
    --cache "results/${tagname}_memo_${name}/gen_cache" --tag "$tag" \
    --n-rows 80 --out "results/${tagname}_memo_gap_${name}.json" \
    --test-data .data_cache/mp40-smoke/train.csv \
    > "/tmp/${tagname}_memo_gap_${name}.log" 2>&1
  log "memgap ${tagname} ${name} exit=$?"
done

if [ "$(now)" -lt 1500 ]; then
  log "bench sanity"
  timeout 1500 python bench.py > /tmp/bench_r4.json 2>/tmp/bench_r4.log
  log "bench exit=$?"; cat /tmp/bench_r4.json 2>/dev/null
fi
log "all done"
