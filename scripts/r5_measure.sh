#!/bin/bash
# Round-5 on-chip measurement queue. One TPU process at a time (two
# concurrent TPU clients contend and wedge — CLAUDE.md). Phases are run
# serially: bash scripts/r5_measure.sh <phase> [phase ...]
#
#   wait        - block until the TPU tunnel answers (up to ~2 h)
#   geo2train   - launch the 3000-epoch mp40_geo2 run (resilient, resumable)
#   geo2wait    - block until the mp40_geo2 3000-epoch run reaches its
#                 final epoch (polls metrics.jsonl; +grace for the last save)
#   geo2memo    - train-row memorization eval for geo2 (CSP + fixed-cell,
#                 80 rows x 20) + rms-gap diagnostic -> results/geo2_memo_*
#   geo2eval    - held-out protocol eval (56 test rows x 8, same shape as
#                 mp40_geo_eval for comparability) -> results/mp40_geo2_eval
#   dualtrain   - train logs/mp40_geo_prompt: prompt featurizer (composition
#                 + crystal-system words from free text) x full geometric
#                 augmentation — VERDICT r5 item 2's dual-conditioning run
#   dualeval    - held-out eval for the dual model (test 56 x 20) +
#                 comp-prior-on-held-out sweep
#   heldout20   - held-out rows x 20 samples for the round-5 flagship:
#                 test.csv AND val.csv (112 held-out rows total — the
#                 derived split's full held-out budget)
#   fullproto   - full 706 x 20 reference protocol on the round-5 flagship
#                 (free generation, guided) -> results/full_protocol_geo2
#   metastable  - pinned meta_stable protocol (3 seeds x 32 rows x 16 CSP
#                 samples + surrogate depth calibration) on the flagship
#   bench       - python bench.py -> /tmp/bench_r5.json (run LAST, alone)
set -u
cd "$(dirname "$0")/.."

log() { echo "[r5_measure $(date +%H:%M:%S)] $*"; }

FLAGSHIP="${FLAGSHIP:-logs/mp40_geo2/checkpoints/best}"

# EMA_FLAG: pass --use-ema to every evaluate call when the run's final EMA
# val/loss beats the raw one (long cosine schedules). Auto-detected from the
# flagship's metrics.jsonl unless set explicitly (EMA_FLAG="" forces raw).
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

phase_wait() {
  for i in $(seq 1 60); do
    if timeout 110 python -c "import jax; print(jax.devices())" 2>/dev/null; then
      log "TPU is back (attempt $i)"; return 0
    fi
    log "TPU unavailable (attempt $i), sleeping 120s"; sleep 120
  done
  log "TPU never came back"; return 1
}

phase_geo2wait() {
  # poll the training log: done when the final epoch lands or the log goes
  # silent for 15 min (trainer exited early / crashed — either way the chip
  # is free). 3000-epoch run at ~3.5 s/epoch.
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

phase_geo2train() {
  # VERDICT-r4 item 1: continue the mp40_geo recipe to 3000 epochs with the
  # widened Z=3 supercell augmentation. Recorded here so a host reset can
  # replay the exact run (round 5 lost the first attempt to one).
  log "mp40_geo2 train start (3000 ep, sub 0.5 x supercell z3 x lat 0.03)"
  timeout 17000 python -m chemeleon_tpu.scripts.train_resilient --retries 5 \
    --ckpt "logs/mp40_geo2/checkpoints/last" \
    "--resume-flag=--resume-from=" -- \
    python -m chemeleon_tpu.scripts.smoke_train \
      --exp-name mp40_geo2 --preset chemeleon_composition \
      --hidden 512 --layers 6 --batch 64 --lr 5e-4 --scheduler cosine \
      --epochs 3000 --ckpt-every 50 --ema-decay 0.999 --watchdog 1200 \
      --aug-sub 0.5 --aug-supercell --aug-supercell-z 3 --aug-lat 0.03 \
      --eval-rows 0 --eval-samples 0 \
    > /tmp/geo2train.log 2>&1
  log "geo2train exit=$?"; tail -3 /tmp/geo2train.log
}

phase_geo2memo() {
  ema_autoselect
  log "geo2 train-row memorization (CSP + fixed-cell, 80 x 20, ${EMA_FLAG:-raw})"
  timeout 7200 python -m chemeleon_tpu.cli evaluate \
    -m logs/mp40_geo2/checkpoints/best $EMA_FLAG \
    --test-data .data_cache/mp40-smoke/train.csv --n-samples 20 \
    --max-rows 80 --csp --fixed-cell \
    --cache-generation --save-path results/geo2_memo_cell \
    > /tmp/geo2memo.log 2>&1
  log "geo2memo exit=$?"; tail -4 /tmp/geo2memo.log
  timeout 3600 python -m chemeleon_tpu.scripts.diag_structure_gap \
    --cache results/geo2_memo_cell/gen_cache --tag _csp_cell \
    --n-rows 80 --test-data .data_cache/mp40-smoke/train.csv \
    --out results/geo2_memo_gap_cell.json >> /tmp/geo2memo.log 2>&1
  log "gap exit=$?"; tail -3 /tmp/geo2memo.log
}

phase_geo2eval() {
  ema_autoselect
  log "geo2 held-out eval (56 x 8, mp40_geo_eval-comparable, ${EMA_FLAG:-raw})"
  timeout 7200 python -m chemeleon_tpu.cli evaluate \
    -m logs/mp40_geo2/checkpoints/best $EMA_FLAG \
    --test-data .data_cache/mp40-smoke/test.csv --n-samples 8 \
    --cache-generation --save-path results/mp40_geo2_eval \
    > /tmp/geo2eval.log 2>&1
  log "geo2eval exit=$?"; tail -4 /tmp/geo2eval.log
}

phase_dualtrain() {
  log "mp40_geo_prompt train start (prompt featurizer x geo aug, 1500 ep)"
  timeout 14400 python -m chemeleon_tpu.scripts.train_resilient --retries 5 \
    --ckpt "logs/mp40_geo_prompt/checkpoints/last" \
    "--resume-flag=--resume-from=" -- \
    python -m chemeleon_tpu.scripts.smoke_train \
      --exp-name mp40_geo_prompt --preset chemeleon_prompt_featurized \
      --hidden 512 --layers 6 --batch 64 --lr 5e-4 --scheduler cosine \
      --epochs 1500 --ckpt-every 50 --ema-decay 0.999 --watchdog 1200 \
      --aug-sub 0.5 --aug-supercell --aug-supercell-z 3 --aug-lat 0.03 \
      --eval-rows 0 --eval-samples 0 \
    > /tmp/dualtrain.log 2>&1
  log "dualtrain exit=$?"; tail -3 /tmp/dualtrain.log
}

phase_dualeval() {
  log "mp40_geo_prompt held-out eval (56 x 20)"
  timeout 10800 python -m chemeleon_tpu.cli evaluate \
    -m logs/mp40_geo_prompt/checkpoints/best \
    --test-data .data_cache/mp40-smoke/test.csv --n-samples 20 \
    --cache-generation --save-path results/mp40_geo_prompt_eval \
    > /tmp/dualeval.log 2>&1
  log "dualeval exit=$?"; tail -4 /tmp/dualeval.log
  log "comp-prior on held-out rows (guidance-free comp matching lever)"
  timeout 10800 python -m chemeleon_tpu.cli evaluate \
    -m logs/mp40_geo_prompt/checkpoints/best \
    --test-data .data_cache/mp40-smoke/test.csv --n-samples 20 \
    --comp-prior-scale 1.0 \
    --cache-generation --save-path results/mp40_geo_prompt_eval_prior \
    >> /tmp/dualeval.log 2>&1
  log "prior exit=$?"; tail -4 /tmp/dualeval.log
}

phase_heldout20() {
  ema_autoselect
  log "flagship held-out x 20: test split (${EMA_FLAG:-raw})"
  timeout 10800 python -m chemeleon_tpu.cli evaluate \
    -m "$FLAGSHIP" $EMA_FLAG \
    --test-data .data_cache/mp40-smoke/test.csv --n-samples 20 \
    --cache-generation --save-path results/heldout_test20 \
    > /tmp/heldout20.log 2>&1
  log "test exit=$?"; tail -4 /tmp/heldout20.log
  log "flagship held-out x 20: val split"
  timeout 10800 python -m chemeleon_tpu.cli evaluate \
    -m "$FLAGSHIP" $EMA_FLAG \
    --test-data .data_cache/mp40-smoke/val.csv --n-samples 20 \
    --cache-generation --save-path results/heldout_val20 \
    >> /tmp/heldout20.log 2>&1
  log "val exit=$?"; tail -4 /tmp/heldout20.log
}

phase_fullproto() {
  # chip-bound half only: generate + cache, then release the device; the
  # CPU metric pass runs from the cache (phase fullscore / recompute)
  ema_autoselect
  log "full 706 x 20 protocol GENERATION on $FLAGSHIP (${EMA_FLAG:-raw})"
  timeout 21600 python -m chemeleon_tpu.cli evaluate \
    -m "$FLAGSHIP" $EMA_FLAG \
    --n-samples 20 --cache-generation --gen-only \
    --save-path results/full_protocol_geo2 \
    > /tmp/fullproto_r5.log 2>&1
  log "fullproto gen exit=$?"; tail -4 /tmp/fullproto_r5.log
}

phase_fullscore() {
  # CPU-pinned: safe to run while a TPU job owns the chip
  ema_autoselect
  log "full protocol CPU scoring from cache (${EMA_FLAG:-raw})"
  timeout 43200 python -m chemeleon_tpu.scripts.recompute_protocol \
    --model "$FLAGSHIP" --n-samples 20 $EMA_FLAG \
    --save-path results/full_protocol_geo2 \
    > /tmp/fullscore_r5.log 2>&1
  log "fullscore exit=$?"; tail -4 /tmp/fullscore_r5.log
}

phase_metastable() {
  log "pinned meta_stable (3 seeds x 32 rows x 16 CSP samples)"
  timeout 10800 python -m chemeleon_tpu.scripts.probe_meta_stable \
    --model "$FLAGSHIP" --out results/meta_stable_pinned.json \
    > /tmp/metastable.log 2>&1
  log "metastable exit=$?"; tail -6 /tmp/metastable.log
  timeout 10800 python -m chemeleon_tpu.scripts.probe_meta_stable \
    --model logs/mp40_geo/checkpoints/best \
    --out results/meta_stable_pinned_geo.json >> /tmp/metastable.log 2>&1
  log "metastable(geo) exit=$?"; tail -6 /tmp/metastable.log
}

phase_bench() {
  log "bench start (run alone; silent ~45 min)"
  timeout 3600 python bench.py > /tmp/bench_r5.json 2>/tmp/bench_r5.err
  log "bench exit=$?"; tail -c 600 /tmp/bench_r5.json
}

for phase in "$@"; do
  "phase_${phase}" || log "phase ${phase} FAILED"
done
log "all requested phases done"
