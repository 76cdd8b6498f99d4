#!/bin/bash
# Round-4 follow-on queue: full-scale memorization rung.
#
# memo64 (56 rows, 3000 ep) reaches structure_matching 0.21-0.29 on its
# training rows; the 596-row flagships have only ever been evaluated on
# held-out rows (plus the test-split protocol). This measures the missing
# rung: does a 596-row flagship reproduce rows it TRAINED on, under the
# same CSP / CSP+fixed-cell clamps? Compares the 900-epoch triple-aug
# mp40_geo vs the 600-epoch mp40_comp_aug.
#
# Usage: bash scripts/r4b_measure.sh <pid-to-wait-for> [phases...]
set -u
cd "$(dirname "$0")/.."

log() { echo "[r4b_measure $(date +%H:%M:%S)] $*"; }

WAIT_PID="${1:-0}"; shift || true

phase_waitpid() {
  [ "$WAIT_PID" = 0 ] && return 0
  log "waiting for pid $WAIT_PID (current TPU chain)"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 120; done
  log "pid $WAIT_PID exited"
}

phase_geomem() {
  for spec in "mp40_geo|geo" "mp40_comp_aug|aug"; do
    model="${spec%|*}"; tagname="${spec#*|}"
    for mode in "--csp --fixed-cell|cell" "--csp|csp"; do
      flags="${mode%|*}"; name="${mode#*|}"
      log "train-row memorization eval ${model} ${name}"
      timeout 7200 python -m chemeleon_tpu.cli evaluate \
        -m "logs/${model}/checkpoints/best" \
        --test-data .data_cache/mp40-smoke/train.csv \
        --n-samples 20 --max-rows 80 $flags --cache-generation \
        --save-path "results/${tagname}_memo_${name}" \
        > "/tmp/${tagname}_memo_${name}.log" 2>&1
      log "${tagname} ${name} exit=$?"
      tail -12 "/tmp/${tagname}_memo_${name}.log" | grep -A10 '^{' || true
    done
  done
}

phase_memgap() {
  for spec in "geo|cell|_csp_cell" "geo|csp|_csp" "aug|cell|_csp_cell" \
              "aug|csp|_csp"; do
    IFS='|' read -r tagname name tag <<< "$spec"
    [ -d "results/${tagname}_memo_${name}/gen_cache" ] || continue
    timeout 1800 python -m chemeleon_tpu.scripts.diag_structure_gap \
      --cache "results/${tagname}_memo_${name}/gen_cache" --tag "$tag" \
      --n-rows 80 --out "results/${tagname}_memo_gap_${name}.json" \
      --test-data .data_cache/mp40-smoke/train.csv \
      > "/tmp/${tagname}_memo_gap_${name}.log" 2>&1
    log "memgap ${tagname} ${name} exit=$?"
  done
}

for phase in "$@"; do
  "phase_${phase}" || log "phase ${phase} FAILED (continuing)"
done
log "all phases done"
