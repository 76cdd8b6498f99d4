#!/bin/bash
# Round-4 on-chip measurement queue. One TPU process at a time (two
# concurrent TPU clients contend and wedge — CLAUDE.md). Phases are run
# serially: bash scripts/r4_measure.sh <phase> [phase ...]
#
#   wait        - block until the TPU tunnel answers (up to ~2 h)
#   fixedlat    - CSP + fixed-cell positive control (known lattice, known
#                 types, coords-only diffusion) -> results/full_protocol_cell
#   gapcell     - rms-distance diagnostic on the fixed-cell cache (CPU)
#   prompttrain - train the prompt-mode flagship logs/mp40_prompt
#                 (chemeleon_prompt_featurized + substitution aug, 600 ep)
#   clipprompt  - train the prompt Crystal-CLIP logs/clip_prompt
#   promptretr  - prompt->graph retrieval on all 3 splits
#   prompteval  - held-out reference protocol, prompt conditioning
#   geotrain    - train logs/mp40_geo: all three augmentations
#                 (substitution + supercell Z-expansion + lattice jitter),
#                 900 epochs — the geometry/data-wall attack
#   geoeval     - held-out eval + comp-prior probe on mp40_geo
#   geogap      - CSP protocol subset + rms diagnostic with mp40_geo
#   bench       - python bench.py -> /tmp/bench_r4.json
set -u
cd "$(dirname "$0")/.."

log() { echo "[r4_measure $(date +%H:%M:%S)] $*"; }

phase_wait() {
  for i in $(seq 1 60); do
    if timeout 110 python -c "import jax; print(jax.devices())" 2>/dev/null; then
      log "TPU is back (attempt $i)"; return 0
    fi
    log "TPU unavailable (attempt $i), sleeping 120s"; sleep 120
  done
  log "TPU never came back"; return 1
}

phase_fixedlat() {
  # The structure_matching ladder's strongest positive control: clamp the
  # cell to the row's own (canonicalized) lattice AND the types to its
  # composition; only fractional coordinates diffuse. Round-4 diagnostic
  # (results/structure_gap.json) showed lattice geometry is the first
  # blocker (16/80 rows with any lattice mapping); this removes it.
  log "fixed-cell CSP control start"
  timeout 7200 python -m chemeleon_tpu.cli evaluate \
    -m logs/mp40_comp_aug/checkpoints/best \
    --n-samples 20 --max-rows 160 --csp --fixed-cell \
    --cache-generation --save-path results/full_protocol_cell \
    > /tmp/fixedlat.log 2>&1
  log "fixedlat exit=$?"; tail -4 /tmp/fixedlat.log
}

phase_gapcell() {
  log "fixed-cell rms diagnostic (CPU)"
  timeout 3600 python -m chemeleon_tpu.scripts.diag_structure_gap \
    --cache results/full_protocol_cell/gen_cache --tag _csp_cell \
    --n-rows 120 --out results/structure_gap_cell.json \
    > /tmp/gapcell.log 2>&1
  log "gapcell exit=$?"; tail -3 /tmp/gapcell.log
}

phase_prompttrain() {
  log "mp40_prompt train start (prompt featurizer + substitution aug)"
  timeout 10800 python -m chemeleon_tpu.scripts.train_resilient --retries 4 \
    --ckpt "logs/mp40_prompt/checkpoints/last" \
    "--resume-flag=--resume-from=" -- \
    python -m chemeleon_tpu.scripts.smoke_train \
      --exp-name mp40_prompt --preset chemeleon_prompt_featurized \
      --hidden 512 --layers 6 --batch 64 --lr 5e-4 --scheduler cosine \
      --epochs 600 --ckpt-every 25 --ema-decay 0.999 --watchdog 900 \
      --aug-sub 0.5 --eval-rows 0 --eval-samples 0 > /tmp/prompt_train.log 2>&1
  log "prompt train exit=$?"; tail -3 /tmp/prompt_train.log
}

phase_clipprompt() {
  log "clip_prompt train start"
  timeout 3600 python run_crystal_clip.py clip_prompt_featurized \
    exp_name=clip_prompt data_dir=.data_cache/mp40-smoke \
    hidden_dim=256 num_layers=4 clip_dim=128 batch_size=64 \
    max_epochs=300 watchdog_timeout_s=900 aug_substitution_prob=0.5 \
    > /tmp/clip_prompt.log 2>&1
  log "clip_prompt exit=$?"; tail -3 /tmp/clip_prompt.log
}

phase_promptretr() {
  log "prompt retrieval (3 splits)"
  mkdir -p results
  for split in test val train; do
    timeout 1800 python -m chemeleon_tpu.eval.retrieval \
      logs/clip_prompt/config.json logs/clip_prompt/clip_checkpoints/best \
      "$split" > "/tmp/prompt_retr_$split.json" 2>>/tmp/prompt_retr.log \
      && tail -1 "/tmp/prompt_retr_$split.json" | tee \
        "results/clip_prompt_retrieval_$split.json"
    log "retrieval ${split} exit=$?"
  done
}

phase_prompteval() {
  log "prompt held-out protocol eval"
  timeout 7200 python -m chemeleon_tpu.cli evaluate \
    -m logs/mp40_prompt/checkpoints/best \
    --test-data .data_cache/mp40-smoke/test.csv --n-samples 8 \
    --cache-generation --save-path results/mp40_prompt_eval \
    > /tmp/prompteval.log 2>&1
  log "prompteval exit=$?"; tail -4 /tmp/prompteval.log
}

phase_geotrain() {
  log "mp40_geo train start (sub + supercell + lattice-jitter aug, 900 ep)"
  timeout 14400 python -m chemeleon_tpu.scripts.train_resilient --retries 5 \
    --ckpt "logs/mp40_geo/checkpoints/last" \
    "--resume-flag=--resume-from=" -- \
    python -m chemeleon_tpu.scripts.smoke_train \
      --exp-name mp40_geo --preset chemeleon_composition \
      --hidden 512 --layers 6 --batch 64 --lr 5e-4 --scheduler cosine \
      --epochs 900 --ckpt-every 25 --ema-decay 0.999 --watchdog 900 \
      --aug-sub 0.5 --aug-supercell --aug-lat 0.03 \
      --eval-rows 0 --eval-samples 0 > /tmp/geo_train.log 2>&1
  log "geo train exit=$?"; tail -3 /tmp/geo_train.log
}

phase_geoeval() {
  log "mp40_geo held-out eval"
  timeout 7200 python -m chemeleon_tpu.cli evaluate \
    -m logs/mp40_geo/checkpoints/best \
    --test-data .data_cache/mp40-smoke/test.csv --n-samples 8 \
    --cache-generation --save-path results/mp40_geo_eval \
    > /tmp/geoeval.log 2>&1
  log "geoeval exit=$?"; tail -4 /tmp/geoeval.log
  log "mp40_geo comp-prior probe"
  timeout 3600 python -m chemeleon_tpu.scripts.probe_comp_prior \
    --model logs/mp40_geo/checkpoints/best \
    --out results/comp_prior_rate_geo.json >> /tmp/geoeval.log 2>&1
  log "probe exit=$?"; tail -3 /tmp/geoeval.log
}

phase_geogap() {
  log "mp40_geo CSP subset + fixed-cell control"
  timeout 7200 python -m chemeleon_tpu.cli evaluate \
    -m logs/mp40_geo/checkpoints/best \
    --n-samples 20 --max-rows 160 --csp \
    --cache-generation --save-path results/geo_protocol_csp \
    > /tmp/geogap.log 2>&1
  log "geo csp exit=$?"
  timeout 7200 python -m chemeleon_tpu.cli evaluate \
    -m logs/mp40_geo/checkpoints/best \
    --n-samples 20 --max-rows 160 --csp --fixed-cell \
    --cache-generation --save-path results/geo_protocol_cell \
    >> /tmp/geogap.log 2>&1
  log "geo cell exit=$?"
  timeout 3600 python -m chemeleon_tpu.scripts.diag_structure_gap \
    --cache results/geo_protocol_csp/gen_cache --tag _csp \
    --n-rows 120 --out results/structure_gap_geo.json >> /tmp/geogap.log 2>&1
  timeout 3600 python -m chemeleon_tpu.scripts.diag_structure_gap \
    --cache results/geo_protocol_cell/gen_cache --tag _csp_cell \
    --n-rows 120 --out results/structure_gap_geo_cell.json \
    >> /tmp/geogap.log 2>&1
  log "geogap done"; tail -4 /tmp/geogap.log
}

phase_knnprobe() {
  log "fc-vs-knn timing probe (post scatter-free selection)"
  timeout 3600 python -m chemeleon_tpu.scripts.probe_knn \
    --out results/knn_probe.json > /tmp/knn_probe.log 2>&1
  log "knnprobe exit=$?"; tail -3 /tmp/knn_probe.log
}

phase_memo64() {
  # middle point of the memorization curve (8 -> 64 -> 596 rows): same
  # capacity as memo8 (256/4L), bucket-aligned 64-row training set,
  # fixed-cell CSP eval on the training rows
  log "memo64 dataset + train"
  python -m chemeleon_tpu.scripts.make_memo_dataset \
    --n 64 --batch 8 --out .data_cache/memo64 || return 1
  timeout 7200 python -m chemeleon_tpu.scripts.smoke_train \
    --source data/mp-40/test.csv --data-dir .data_cache/memo64 \
    --exp-name memo64 --preset chemeleon_composition \
    --hidden 256 --layers 4 --batch 8 --lr 3e-4 --scheduler cosine \
    --epochs 3000 --ckpt-every 250 --eval-rows 0 --eval-samples 0 \
    > /tmp/memo64_train.log 2>&1
  log "memo64 train exit=$?"; tail -2 /tmp/memo64_train.log
  for mode in "--csp --fixed-cell|cell" "--csp|csp"; do
    flags="${mode%|*}"; name="${mode#*|}"
    timeout 5400 python -m chemeleon_tpu.cli evaluate \
      -m logs/memo64/checkpoints/best \
      --test-data .data_cache/memo64/test.csv --n-samples 20 \
      $flags --cache-generation \
      --save-path "results/memo64_${name}" > "/tmp/memo64_${name}.log" 2>&1
    log "memo64 eval ${name} exit=$?"
  done
}

phase_memogap() {
  # rms diagnostic on the memorization-probe caches (CPU)
  for probe in memo8 memo64; do
    for tag in cell csp; do
      [ -d "results/${probe}_${tag}/gen_cache" ] || continue
      timeout 1800 python -m chemeleon_tpu.scripts.diag_structure_gap \
        --cache "results/${probe}_${tag}/gen_cache" \
        --tag "$([ "$tag" = cell ] && echo _csp_cell || echo _csp)" \
        --n-rows 64 --out "results/${probe}_gap_${tag}.json" \
        > "/tmp/${probe}_gap_${tag}.log" 2>&1
      log "memogap ${probe} ${tag} exit=$?"
    done
  done
}

phase_bench() {
  log "bench start"
  timeout 3600 python bench.py > /tmp/bench_r4.json 2> /tmp/bench_r4.log
  log "bench exit=$? json:"; cat /tmp/bench_r4.json
}

for phase in "$@"; do
  "phase_${phase}" || log "phase ${phase} FAILED (continuing)"
done
log "all phases done"
