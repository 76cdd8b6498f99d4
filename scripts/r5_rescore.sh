#!/bin/bash
# Round-5 CPU re-scoring: the matcher's fit() acceptance moved from
# normalized-RMS to MAX per-site displacement (pymatgen use_rms=False
# semantics — ADVICE r4 medium). Every cached memorization/protocol eval
# must be re-scored under the strict rule; the old numbers are preserved
# as means_rmsrule.json next to each refreshed means.json.
#
# Pure CPU (recompute_protocol pins jax to CPU) — safe to run while a TPU
# training job owns the chip. Caches are keyed by row and complete, so no
# generation happens; only metric recomputation.
set -u
cd "$(dirname "$0")/.."

log() { echo "[r5_rescore $(date +%H:%M:%S)] $*"; }

rescore() { # dir model testdata nsamples maxrows extra_flags...
  dir="$1"; model="$2"; td="$3"; ns="$4"; mr="$5"; shift 5
  [ -d "results/${dir}/gen_cache" ] || { log "skip ${dir} (no cache)"; return 0; }
  [ -f "results/${dir}/means_rmsrule.json" ] || \
    cp "results/${dir}/means.json" "results/${dir}/means_rmsrule.json" 2>/dev/null
  mrflag=""; [ "$mr" != "all" ] && mrflag="--max-rows ${mr}"
  log "rescore ${dir}"
  timeout 5400 python -m chemeleon_tpu.scripts.recompute_protocol \
    --model "$model" --test-data "$td" --n-samples "$ns" $mrflag "$@" \
    --save-path "results/${dir}" > "/tmp/rescore_${dir}.log" 2>&1
  log "${dir} exit=$?"
  python - "results/${dir}" <<'EOF'
import json, sys
d = sys.argv[1]
new = json.load(open(f"{d}/means.json"))
old = json.load(open(f"{d}/means_rmsrule.json"))
k = "mean_structure_matching"
print(f"  structure_matching: rms-rule {old.get(k)} -> strict {new.get(k)}")
EOF
}

rescore geo_memo_cell logs/mp40_geo/checkpoints/best \
  .data_cache/mp40-smoke/train.csv 20 80 --csp --fixed-cell
rescore memo64_cell logs/memo64/checkpoints/best \
  .data_cache/memo64/test.csv 20 all --csp --fixed-cell
rescore memo64_csp logs/memo64/checkpoints/best \
  .data_cache/memo64/test.csv 20 all --csp
rescore aug_memo_cell logs/mp40_comp_aug/checkpoints/best \
  .data_cache/mp40-smoke/train.csv 20 80 --csp --fixed-cell
rescore memo8_cell logs/memo8/checkpoints/best \
  .data_cache/memo8/test.csv 20 all --csp --fixed-cell
rescore memo8_csp logs/memo8/checkpoints/best \
  .data_cache/memo8/test.csv 20 all --csp
log "done"
