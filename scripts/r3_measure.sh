#!/bin/bash
# Round-3 on-chip measurement queue. Each phase is one TPU process, run
# serially (two concurrent TPU clients contend and wedge — CLAUDE.md).
# Usage: bash scripts/r3_measure.sh <phase> [phase ...]
#   wait      - block until the TPU tunnel answers (up to ~2 h)
#   bench     - python bench.py -> /tmp/bench_r3.json
#   probe     - comp-prior scale sweep -> results/comp_prior_rate.json
#   ema       - retrain mp40_comp with EMA (600 epochs) under the supervisor
#   unroll    - N=40 bucket with sampler_scan_unroll=2 vs 1
#   clip      - retrain logs/clip_comp (Crystal-CLIP, composition tower)
#   retrieval - text->graph retrieval on all 3 splits -> results/
#   csp       - CSP-mode validity probe -> results/csp_probe.json
#   prioreval - held-out 20-sample eval at the probe's best prior scale
set -u
cd "$(dirname "$0")/.."

log() { echo "[r3_measure $(date +%H:%M:%S)] $*"; }

phase_wait() {
  for i in $(seq 1 60); do
    if timeout 110 python -c "import jax; print(jax.devices())" 2>/dev/null; then
      log "TPU is back (attempt $i)"; return 0
    fi
    log "TPU unavailable (attempt $i), sleeping 120s"; sleep 120
  done
  log "TPU never came back"; return 1
}

phase_bench() {
  log "bench start"
  timeout 3600 python bench.py > /tmp/bench_r3.json 2> /tmp/bench_r3.log
  log "bench exit=$? json:"; cat /tmp/bench_r3.json
}

phase_probe() {
  log "comp-prior probe start"
  timeout 3600 python -m chemeleon_tpu.scripts.probe_comp_prior \
    --model logs/mp40_comp/checkpoints/best \
    --out results/comp_prior_rate.json > /tmp/probe_r3.log 2>&1
  log "probe exit=$?"; tail -3 /tmp/probe_r3.log
}

phase_ema() {
  log "EMA retrain start (mp40_comp recipe + ema_decay=0.999, 600 epochs)"
  timeout 5400 python -m chemeleon_tpu.scripts.train_resilient --retries 3 \
    --ckpt "logs/mp40_comp_ema/checkpoints/last" \
    "--resume-flag=--resume-from=" -- \
    python -m chemeleon_tpu.scripts.smoke_train \
      --exp-name mp40_comp_ema --preset chemeleon_composition \
      --hidden 512 --layers 6 --batch 64 --lr 5e-4 --scheduler cosine \
      --epochs 600 --ckpt-every 25 --ema-decay 0.999 --watchdog 900 \
      --eval-rows 0 --eval-samples 0 > /tmp/ema_train.log 2>&1
  log "ema train exit=$?"; tail -3 /tmp/ema_train.log
}

phase_aug() {
  # flagship recipe + isovalent substitution augmentation (data/augment.py):
  # the 596-row composition-generalization attack
  log "mp40_comp_aug train start"
  timeout 7200 python -m chemeleon_tpu.scripts.train_resilient --retries 4 \
    --ckpt "logs/mp40_comp_aug/checkpoints/last" \
    "--resume-flag=--resume-from=" -- \
    python -m chemeleon_tpu.scripts.smoke_train \
      --exp-name mp40_comp_aug --preset chemeleon_composition \
      --hidden 512 --layers 6 --batch 64 --lr 5e-4 --scheduler cosine \
      --epochs 600 --ckpt-every 25 --ema-decay 0.999 --watchdog 900 \
      --aug-sub 0.5 --eval-rows 0 --eval-samples 0 > /tmp/aug_train.log 2>&1
  log "aug train exit=$?"; tail -3 /tmp/aug_train.log
}

phase_augeval() {
  # held-out 8-sample eval + comp-prior probe on the augmented checkpoint:
  # did substitution augmentation move composition_matching off 0.0?
  log "aug held-out eval"
  timeout 5400 python -m chemeleon_tpu.cli evaluate \
    -m logs/mp40_comp_aug/checkpoints/best \
    --test-data .data_cache/mp40-smoke/test.csv --n-samples 8 \
    --cache-generation --save-path results/mp40_comp_aug_eval \
    > /tmp/augeval.log 2>&1
  log "augeval exit=$?"; tail -3 /tmp/augeval.log
  log "aug comp-prior probe"
  timeout 3600 python -m chemeleon_tpu.scripts.probe_comp_prior \
    --model logs/mp40_comp_aug/checkpoints/best \
    --out results/comp_prior_rate_aug.json > /tmp/probe_aug.log 2>&1
  log "aug probe exit=$?"; tail -3 /tmp/probe_aug.log
}

phase_clip() {
  # the BENCH.md round-3 recipe: 256/4L graph tower, composition text
  # tower, clip_dim 128, 300 epochs on the 596-row split
  log "clip_comp retrain start"
  timeout 3600 python run_crystal_clip.py clip_composition_featurized \
    exp_name=clip_comp data_dir=.data_cache/mp40-smoke \
    hidden_dim=256 num_layers=4 clip_dim=128 batch_size=64 \
    max_epochs=300 watchdog_timeout_s=900 > /tmp/clip_train.log 2>&1
  log "clip train exit=$?"; tail -3 /tmp/clip_train.log
}

phase_clipaug() {
  # CLIP recipe + substitution augmentation: every epoch sees fresh
  # composition/structure pairs -> does held-out retrieval improve further?
  log "clip_comp_aug retrain start"
  timeout 3600 python run_crystal_clip.py clip_composition_featurized \
    exp_name=clip_comp_aug data_dir=.data_cache/mp40-smoke \
    hidden_dim=256 num_layers=4 clip_dim=128 batch_size=64 \
    max_epochs=300 watchdog_timeout_s=900 aug_substitution_prob=0.5 \
    > /tmp/clipaug_train.log 2>&1
  log "clipaug train exit=$?"; tail -3 /tmp/clipaug_train.log
  log "clipaug retrieval (held-out)"
  mkdir -p results
  timeout 1800 python -m chemeleon_tpu.eval.retrieval \
    logs/clip_comp_aug/config.json logs/clip_comp_aug/clip_checkpoints/best \
    test > /tmp/retrieval_aug.json 2>>/tmp/retrieval.log \
    && tail -1 /tmp/retrieval_aug.json | tee results/clip_comp_aug_retrieval.json
}

phase_retrieval() {
  mkdir -p results
  for split in test val train; do
    log "retrieval on $split"
    timeout 1800 python -m chemeleon_tpu.eval.retrieval \
      logs/clip_comp/config.json logs/clip_comp/clip_checkpoints/best \
      "$split" > "/tmp/retrieval_$split.json" 2>/tmp/retrieval.log \
      && tail -1 "/tmp/retrieval_$split.json" | tee \
        "results/clip_comp_retrieval_$split.json"
  done
  cp results/clip_comp_retrieval_test.json results/clip_comp_retrieval.json
}

phase_csp() {
  log "CSP-mode probe start"
  timeout 3600 python -m chemeleon_tpu.scripts.probe_csp \
    --model logs/mp40_comp/checkpoints/best \
    --out results/csp_probe.json > /tmp/csp_probe.log 2>&1
  log "csp exit=$?"; tail -2 /tmp/csp_probe.log
}

phase_prioreval() {
  # full reference protocol (20 samples/row) on the 56 HELD-OUT rows with
  # composition-prior guidance at the probe's best scale, using the
  # strongest composition-follower (the augmented flagship when present)
  local model=logs/mp40_comp/checkpoints/best
  local rates=results/comp_prior_rate.json
  local out=results/mp40_comp_prior_eval
  if [ -d logs/mp40_comp_aug/checkpoints/best ]; then
    model=logs/mp40_comp_aug/checkpoints/best
    rates=results/comp_prior_rate_aug.json
    out=results/mp40_comp_aug_prior_eval
  fi
  local scale
  scale=$(RATES="$rates" python - <<'PY'
import json, os
d = json.load(open(os.environ["RATES"]))["by_scale"]
print(max(d, key=lambda k: d[k]["exact_mean"]))
PY
)
  log "prior-guided held-out eval: model=$model scale=$scale"
  timeout 5400 python -m chemeleon_tpu.cli evaluate \
    -m "$model" \
    --test-data .data_cache/mp40-smoke/test.csv --n-samples 20 \
    --comp-prior-scale "$scale" --cache-generation \
    --save-path "$out" > /tmp/prioreval.log 2>&1
  log "prioreval exit=$?"; tail -5 /tmp/prioreval.log
}

phase_emavalid() {
  # EMA vs raw weights on the 256-sample guided validity probe (the round-3
  # EMA feature has never been measured on-chip)
  log "validity probe: raw weights"
  BENCH_MODE=valid timeout 2400 python bench.py \
    > /tmp/valid_raw.json 2>>/tmp/valid_probe.log
  log "raw:"; cat /tmp/valid_raw.json
  log "validity probe: EMA weights"
  BENCH_MODE=valid BENCH_VALID_EMA=1 timeout 2400 python bench.py \
    > /tmp/valid_ema.json 2>>/tmp/valid_probe.log
  log "ema:"; cat /tmp/valid_ema.json
}

phase_fullprotocol() {
  # the reference evaluation protocol at full scale: 706 rows x 20 samples
  # (evaluate.py:26-28), resumable generation cache; prefers the augmented
  # flagship (the composition-following model) when present
  local model=logs/mp40_comp/checkpoints/best
  [ -d logs/mp40_comp_aug/checkpoints/best ] && \
    model=logs/mp40_comp_aug/checkpoints/best
  log "full protocol start: model=$model (expect ~2 h)"
  timeout 10000 python -m chemeleon_tpu.cli evaluate \
    -m "$model" \
    --n-samples 20 --cache-generation \
    --save-path results/full_protocol > /tmp/fullproto.log 2>&1
  log "full protocol exit=$?"; tail -5 /tmp/fullproto.log
}

phase_fewstep() {
  # validity/throughput frontier of the strided sampler (K < 1000 reverse
  # steps) on the composition flagship — the round-3 few-step feature has
  # never been measured on-chip
  local model=logs/mp40_comp/checkpoints/best
  [ -d logs/mp40_comp_aug/checkpoints/best ] && \
    model=logs/mp40_comp_aug/checkpoints/best
  log "few-step probe start: model=$model"
  timeout 7200 python -m chemeleon_tpu.scripts.probe_fewstep \
    --model "$model" --out results/fewstep.json > /tmp/fewstep.log 2>&1
  log "fewstep exit=$?"; tail -4 /tmp/fewstep.log
}

phase_systrain() {
  # crystal-system conditioning flagship: the composition+crystal_system
  # preset (both text targets featurized offline) with the mp40_comp_aug
  # recipe — the second conditioning axis, never yet trained
  log "mp40_sys train start"
  timeout 7200 python -m chemeleon_tpu.scripts.train_resilient --retries 4 \
    --ckpt "logs/mp40_sys/checkpoints/last" \
    "--resume-flag=--resume-from=" -- \
    python -m chemeleon_tpu.scripts.smoke_train \
      --exp-name mp40_sys --preset chemeleon_composition_crystal_system \
      --hidden 512 --layers 6 --batch 64 --lr 5e-4 --scheduler cosine \
      --epochs 600 --ckpt-every 25 --ema-decay 0.999 --watchdog 900 \
      --aug-sub 0.5 --eval-rows 0 --eval-samples 0 > /tmp/sys_train.log 2>&1
  log "sys train exit=$?"; tail -3 /tmp/sys_train.log
}

phase_syseval() {
  # (a) held-out 20-sample eval with system-bearing prompts -> does
  # crystal_system_matching move off the 0.13 unconditioned floor?
  # (b) controlled steering probe: same composition x 7 system words
  log "sys held-out eval"
  timeout 5400 python -m chemeleon_tpu.cli evaluate \
    -m logs/mp40_sys/checkpoints/best \
    --test-data .data_cache/mp40-smoke/test.csv --n-samples 20 \
    --cache-generation --save-path results/mp40_sys_eval \
    > /tmp/syseval.log 2>&1
  log "syseval exit=$?"; tail -3 /tmp/syseval.log
  log "system steering probe"
  timeout 5400 python -m chemeleon_tpu.scripts.probe_system \
    --model logs/mp40_sys/checkpoints/best \
    --out results/system_steering.json > /tmp/sysprobe.log 2>&1
  log "sysprobe exit=$?"; tail -3 /tmp/sysprobe.log
}

phase_cspfewstep() {
  # exact composition AT deployment speed: CSP clamp + K=50 strided steps
  local model=logs/mp40_comp/checkpoints/best
  [ -d logs/mp40_comp_aug/checkpoints/best ] && \
    model=logs/mp40_comp_aug/checkpoints/best
  log "CSP few-step probe (K=50): model=$model"
  timeout 3600 python -m chemeleon_tpu.scripts.probe_csp \
    --model "$model" --sample-steps 50 \
    --out results/csp_fewstep.json > /tmp/csp_fewstep.log 2>&1
  log "cspfewstep exit=$?"; tail -3 /tmp/csp_fewstep.log
}

phase_unroll() {
  log "scan-unroll experiment at N=40/B=32"
  for u in 1 2; do
    BENCH_MODE=single BENCH_NATOMS=40 BENCH_BATCH=32 BENCH_SCAN_UNROLL=$u \
      timeout 2400 python bench.py > /tmp/unroll_$u.json 2>> /tmp/unroll.log
    log "unroll=$u:"; cat /tmp/unroll_$u.json
  done
}

for phase in "$@"; do
  "phase_$phase" || log "phase $phase FAILED"
done
log "queue done"
