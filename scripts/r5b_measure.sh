#!/bin/bash
# Round-5 measurement queue, v2: every chip phase is GEN-ONLY and exits as
# soon as the device work is done; the CPU-bound scoring phases pin jax to
# CPU and run from the generation caches in parallel with the next chip
# job. On a 1-core host the scoring half is the long pole — this split
# keeps the chip saturated instead of idling behind FIRE relaxations.
#
# Chip phases (run strictly one at a time):
#   geo2wait   - block until the mp40_geo2 3000-epoch run finishes
#   memogen    - train-row memorization generation (80 x 20, CSP+fixed-cell)
#   evalgen    - held-out test split generation (56 x 8, free guided)
#   priorgen   - comp-prior 1.0 held-out generation (test+val, 112 x 20)
#   protogen   - full 706 x 20 reference-protocol generation
#   metagen    - pinned meta_stable generation (3 seeds x 32 rows x 16 CSP)
#   dualtrain  - prompt-featurizer x geo-aug training run
#   bench      - python bench.py (run LAST, alone)
#
# CPU phases (safe beside any chip phase; run one at a time — 1 core):
#   memoscore  - score memogen cache + rms-gap diagnostic
#   evalscore  - score evalgen cache
#   priorscore - score priorgen cache
#   protoheld  - score ONLY the 112 held-out rows of the protogen cache
#   protoscore - score the remaining protocol rows (resumes scores.jsonl)
#   metascore  - FIRE/energy pass over the metagen cache
#   dualeval   - (chip) held-out eval of the dual model
set -u
cd "$(dirname "$0")/.."

log() { echo "[r5b $(date +%H:%M:%S)] $*"; }

FLAGSHIP="${FLAGSHIP:-logs/mp40_geo2/checkpoints/best}"
TESTCSV=.data_cache/mp40-smoke/test.csv
VALCSV=.data_cache/mp40-smoke/val.csv
TRAINCSV=.data_cache/mp40-smoke/train.csv

# EMA_FLAG: --use-ema when the flagship's final EMA val/loss beats raw
# (same autoselect as r5_measure.sh). EMA_FLAG="" forces raw.
ema_autoselect() {
  if [ "${EMA_FLAG+x}" = "x" ]; then return 0; fi
  EMA_FLAG=$(python - <<'EOF'
import json
best_raw = best_ema = float("inf")
try:
    with open("logs/mp40_geo2/metrics.jsonl") as f:
        for line in f:
            try:
                d = json.loads(line)
            except Exception:
                continue
            if "val/loss" in d:
                best_raw = min(best_raw, d["val/loss"])
            if "val/loss_ema" in d:
                best_ema = min(best_ema, d["val/loss_ema"])
except FileNotFoundError:
    pass
print("--use-ema" if best_ema < best_raw else "")
EOF
)
  log "ema_autoselect: EMA_FLAG='${EMA_FLAG}'"
}

phase_geo2wait() {
  local mfile=logs/mp40_geo2/metrics.jsonl
  for i in $(seq 1 200); do
    local last_epoch age
    last_epoch=$(python - <<'EOF'
import json
last = 0
try:
    with open("logs/mp40_geo2/metrics.jsonl") as f:
        for line in f:
            try:
                d = json.loads(line)
            except Exception:
                continue
            if "epoch" in d:
                last = max(last, int(d["epoch"]))
except FileNotFoundError:
    pass
print(last)
EOF
)
    age=$(( $(date +%s) - $(stat -c %Y "$mfile" 2>/dev/null || echo 0) ))
    if [ "$last_epoch" -ge 2999 ]; then
      log "geo2 reached epoch $last_epoch; grace 180s for the final save"
      sleep 180; return 0
    fi
    if [ "$age" -gt 900 ]; then
      log "geo2 log silent ${age}s at epoch $last_epoch — assuming exited"
      return 0
    fi
    log "geo2 at epoch $last_epoch (log age ${age}s), sleeping 120s"
    sleep 120
  done
  log "geo2 never finished"; return 1
}

# ---------- chip: generation only ----------

phase_memogen() {
  ema_autoselect
  log "memogen: 80 x 20 CSP+fixed-cell on $FLAGSHIP (${EMA_FLAG:-raw})"
  timeout 7200 python -m chemeleon_tpu.cli evaluate \
    -m "$FLAGSHIP" $EMA_FLAG \
    --test-data "$TRAINCSV" --n-samples 20 --max-rows 80 --csp --fixed-cell \
    --cache-generation --gen-only --save-path results/geo2_memo_cell \
    > /tmp/memogen.log 2>&1
  log "memogen exit=$?"; tail -3 /tmp/memogen.log
}

phase_evalgen() {
  ema_autoselect
  log "evalgen: 56 x 8 free guided on $FLAGSHIP (${EMA_FLAG:-raw})"
  timeout 7200 python -m chemeleon_tpu.cli evaluate \
    -m "$FLAGSHIP" $EMA_FLAG \
    --test-data "$TESTCSV" --n-samples 8 \
    --cache-generation --gen-only --save-path results/mp40_geo2_eval \
    > /tmp/evalgen.log 2>&1
  log "evalgen exit=$?"; tail -3 /tmp/evalgen.log
}

phase_priorgen() {
  ema_autoselect
  log "priorgen: comp-prior 1.0, test+val x 20 on $FLAGSHIP (${EMA_FLAG:-raw})"
  timeout 7200 python -m chemeleon_tpu.cli evaluate \
    -m "$FLAGSHIP" $EMA_FLAG \
    --test-data "$TESTCSV" --n-samples 20 --comp-prior-scale 1.0 \
    --cache-generation --gen-only --save-path results/geo2_prior_test \
    > /tmp/priorgen.log 2>&1
  log "priorgen test exit=$?"
  timeout 7200 python -m chemeleon_tpu.cli evaluate \
    -m "$FLAGSHIP" $EMA_FLAG \
    --test-data "$VALCSV" --n-samples 20 --comp-prior-scale 1.0 \
    --cache-generation --gen-only --save-path results/geo2_prior_val \
    >> /tmp/priorgen.log 2>&1
  log "priorgen val exit=$?"; tail -3 /tmp/priorgen.log
}

phase_protogen() {
  ema_autoselect
  log "protogen: full 706 x 20 protocol generation on $FLAGSHIP (${EMA_FLAG:-raw})"
  timeout 21600 python -m chemeleon_tpu.cli evaluate \
    -m "$FLAGSHIP" $EMA_FLAG \
    --n-samples 20 --cache-generation --gen-only \
    --save-path results/full_protocol_geo2 \
    > /tmp/protogen.log 2>&1
  log "protogen exit=$?"; tail -3 /tmp/protogen.log
}

phase_metagen() {
  log "metagen: pinned meta_stable generation on $FLAGSHIP"
  timeout 7200 python -m chemeleon_tpu.scripts.probe_meta_stable \
    --model "$FLAGSHIP" --stage gen --out results/meta_stable_pinned.json \
    > /tmp/metagen.log 2>&1
  log "metagen exit=$?"; tail -3 /tmp/metagen.log
}

phase_dualtrain() {
  log "dualtrain: mp40_geo_prompt (prompt featurizer x geo aug)"
  timeout 14400 python -m chemeleon_tpu.scripts.train_resilient --retries 5 \
    --ckpt "logs/mp40_geo_prompt/checkpoints/last" \
    "--resume-flag=--resume-from=" -- \
    python -m chemeleon_tpu.scripts.smoke_train \
      --exp-name mp40_geo_prompt --preset chemeleon_prompt_featurized \
      --hidden 512 --layers 6 --batch 64 --lr 5e-4 --scheduler cosine \
      --epochs "${DUAL_EPOCHS:-1500}" --ckpt-every 50 --ema-decay 0.999 \
      --watchdog 1200 \
      --aug-sub 0.5 --aug-supercell --aug-supercell-z 3 --aug-lat 0.03 \
      --eval-rows 0 --eval-samples 0 \
    > /tmp/dualtrain.log 2>&1
  log "dualtrain exit=$?"; tail -3 /tmp/dualtrain.log
}

phase_dualeval() {
  log "dualeval: mp40_geo_prompt held-out gen (56 x 20)"
  timeout 10800 python -m chemeleon_tpu.cli evaluate \
    -m logs/mp40_geo_prompt/checkpoints/best \
    --test-data "$TESTCSV" --n-samples 20 \
    --cache-generation --gen-only --save-path results/mp40_geo_prompt_eval \
    > /tmp/dualeval.log 2>&1
  log "dualeval gen exit=$?"; tail -3 /tmp/dualeval.log
}

phase_bench() {
  log "bench start (run alone; silent ~45 min)"
  timeout 3600 python bench.py > /tmp/bench_r5.json 2>/tmp/bench_r5.err
  log "bench exit=$?"; tail -c 600 /tmp/bench_r5.json
}

# ---------- CPU: scoring from caches (jax pinned to CPU) ----------

phase_memoscore() {
  ema_autoselect
  log "memoscore: scoring geo2_memo_cell (${EMA_FLAG:-raw})"
  timeout 14400 python -m chemeleon_tpu.scripts.recompute_protocol \
    --model "$FLAGSHIP" $EMA_FLAG \
    --test-data "$TRAINCSV" --n-samples 20 --max-rows 80 --csp --fixed-cell \
    --save-path results/geo2_memo_cell \
    > /tmp/memoscore.log 2>&1
  log "memoscore exit=$?"; tail -4 /tmp/memoscore.log
  timeout 7200 python -m chemeleon_tpu.scripts.diag_structure_gap \
    --cache results/geo2_memo_cell/gen_cache --tag _csp_cell \
    --n-rows 80 --test-data "$TRAINCSV" \
    --out results/geo2_memo_gap_cell.json >> /tmp/memoscore.log 2>&1
  log "gap exit=$?"; tail -3 /tmp/memoscore.log
}

phase_evalscore() {
  ema_autoselect
  log "evalscore: scoring mp40_geo2_eval (${EMA_FLAG:-raw})"
  timeout 14400 python -m chemeleon_tpu.scripts.recompute_protocol \
    --model "$FLAGSHIP" $EMA_FLAG \
    --test-data "$TESTCSV" --n-samples 8 \
    --save-path results/mp40_geo2_eval \
    > /tmp/evalscore.log 2>&1
  log "evalscore exit=$?"; tail -4 /tmp/evalscore.log
}

phase_priorscore() {
  ema_autoselect
  log "priorscore: scoring geo2_prior_{test,val} (${EMA_FLAG:-raw})"
  timeout 14400 python -m chemeleon_tpu.scripts.recompute_protocol \
    --model "$FLAGSHIP" $EMA_FLAG \
    --test-data "$TESTCSV" --n-samples 20 --comp-prior-scale 1.0 \
    --save-path results/geo2_prior_test \
    > /tmp/priorscore.log 2>&1
  log "priorscore test exit=$?"
  timeout 14400 python -m chemeleon_tpu.scripts.recompute_protocol \
    --model "$FLAGSHIP" $EMA_FLAG \
    --test-data "$VALCSV" --n-samples 20 --comp-prior-scale 1.0 \
    --save-path results/geo2_prior_val \
    >> /tmp/priorscore.log 2>&1
  log "priorscore val exit=$?"; tail -4 /tmp/priorscore.log
}

phase_protoheld() {
  ema_autoselect
  log "protoheld: scoring the 112 held-out rows of full_protocol_geo2"
  timeout 21600 python -m chemeleon_tpu.scripts.recompute_protocol \
    --model "$FLAGSHIP" $EMA_FLAG \
    --n-samples 20 --save-path results/full_protocol_geo2 \
    --only-split "$TESTCSV" "$VALCSV" \
    > /tmp/protoheld.log 2>&1
  log "protoheld exit=$?"; tail -4 /tmp/protoheld.log
  python -m chemeleon_tpu.scripts.subset_means \
    --results results/full_protocol_geo2/results.csv \
    --splits "$TESTCSV" "$VALCSV" \
    --out results/full_protocol_geo2/means_heldout.json \
    >> /tmp/protoheld.log 2>&1 || true
}

phase_protoscore() {
  ema_autoselect
  log "protoscore: scoring the remaining protocol rows (resumes)"
  timeout 43200 python -m chemeleon_tpu.scripts.recompute_protocol \
    --model "$FLAGSHIP" $EMA_FLAG \
    --n-samples 20 --save-path results/full_protocol_geo2 \
    > /tmp/protoscore.log 2>&1
  log "protoscore exit=$?"; tail -4 /tmp/protoscore.log
  python -m chemeleon_tpu.scripts.subset_means \
    --results results/full_protocol_geo2/results.csv \
    --splits "$TESTCSV" "$VALCSV" \
    --out results/full_protocol_geo2/means_heldout.json \
    >> /tmp/protoscore.log 2>&1 || true
  python -m chemeleon_tpu.scripts.subset_means \
    --results results/full_protocol_geo2/results.csv \
    --splits "$TESTCSV" "$VALCSV" --invert \
    --out results/full_protocol_geo2/means_train.json \
    >> /tmp/protoscore.log 2>&1 || true
}

phase_metascore() {
  log "metascore: FIRE/energy pass from the metagen cache"
  timeout 14400 python -m chemeleon_tpu.scripts.probe_meta_stable \
    --model "$FLAGSHIP" --stage score \
    --out results/meta_stable_pinned.json \
    > /tmp/metascore.log 2>&1
  log "metascore exit=$?"; tail -6 /tmp/metascore.log
}

phase_dualscore() {
  log "dualscore: scoring mp40_geo_prompt_eval"
  timeout 14400 python -m chemeleon_tpu.scripts.recompute_protocol \
    --model logs/mp40_geo_prompt/checkpoints/best \
    --test-data "$TESTCSV" --n-samples 20 \
    --save-path results/mp40_geo_prompt_eval \
    > /tmp/dualscore.log 2>&1
  log "dualscore exit=$?"; tail -4 /tmp/dualscore.log
}

for phase in "$@"; do
  "phase_${phase}" || log "phase ${phase} FAILED"
done
log "all requested phases done"
