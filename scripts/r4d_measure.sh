#!/bin/bash
# Round-4 final chip queue (relaunched after the 12:29 session restart
# killed the r4/r4b orchestrators mid-chain). Runs the train-row
# memorization evals (the missing rung of the structure_matching ladder:
# do the 596-row flagships reproduce rows they TRAINED on, under CSP /
# CSP+fixed-cell clamps?), then the CPU rms diagnostics, then bench.
#
# Deadline-guarded: no new TPU eval is launched after DEADLINE so the
# driver's end-of-round bench.py never contends with a live TPU client.
set -u
cd "$(dirname "$0")/.."

log() { echo "[r4d $(date +%H:%M:%S)] $*"; }

DEADLINE=${DEADLINE:-"14:55"}
past_deadline() { [ "$(date +%H%M)" -ge "$(echo "$DEADLINE" | tr -d :)" ]; }

phase_geomem() {
  for spec in "mp40_geo|geo" "mp40_comp_aug|aug"; do
    model="${spec%|*}"; tagname="${spec#*|}"
    for mode in "--csp --fixed-cell|cell" "--csp|csp"; do
      flags="${mode%|*}"; name="${mode#*|}"
      if past_deadline; then log "DEADLINE hit, skipping ${tagname} ${name}"; continue; fi
      log "train-row memorization eval ${model} ${name}"
      timeout 4500 python -m chemeleon_tpu.cli evaluate \
        -m "logs/${model}/checkpoints/best" \
        --test-data .data_cache/mp40-smoke/train.csv \
        --n-samples 20 --max-rows 80 $flags --cache-generation \
        --save-path "results/${tagname}_memo_${name}" \
        > "/tmp/${tagname}_memo_${name}.log" 2>&1
      log "${tagname} ${name} exit=$?"
      grep -A10 '^{' "/tmp/${tagname}_memo_${name}.log" | tail -11 || true
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

phase_bench() {
  if past_deadline; then log "DEADLINE hit, skipping bench (driver runs it)"; return 0; fi
  log "bench.py"
  timeout 1800 python bench.py > /tmp/bench_r4.json 2>/tmp/bench_r4.log
  log "bench exit=$?"; cat /tmp/bench_r4.json
}

for phase in "$@"; do
  "phase_${phase}" || log "phase ${phase} FAILED (continuing)"
done
log "all phases done"
