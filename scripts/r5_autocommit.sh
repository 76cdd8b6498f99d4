#!/bin/bash
# Checkpoint autosaver: the round-5 host reset wiped an entire untracked
# 3000-epoch training run (logs/ is gitignored). While the r5c chain runs,
# snapshot the in-flight runs' best/last checkpoints + metrics into git
# every 30 min so the next reset resumes from 'last' instead of epoch 0
# (train_resilient --ckpt logs/.../checkpoints/last picks it up directly).
#
# Commits use pathspec form (`git commit -- <paths>`) so a concurrently
# staged interactive change is never swept into an autosave commit.
set -u
cd "$(dirname "$0")/.."
log() { echo "[autocommit $(date +%H:%M:%S)] $*"; }

PATHS_GLOB=(
  logs/mp40_geo2/checkpoints/best
  logs/mp40_geo2/checkpoints/last
  logs/mp40_geo2/metrics.jsonl
  logs/mp40_geo_prompt/checkpoints/best
  logs/mp40_geo_prompt/checkpoints/last
  logs/mp40_geo_prompt/metrics.jsonl
  # judge-read measurement artifacts (gitignore already whitelists these) —
  # committed as the unattended chain produces them
  results/geo2_memo_cell/means.json
  results/geo2_memo_cell/results.csv
  results/geo2_memo_gap_cell.json
  results/mp40_geo2_eval/means.json
  results/mp40_geo2_eval/results.csv
  results/full_protocol_geo2/means.json
  results/full_protocol_geo2/results.csv
  results/full_protocol_geo2/means_heldout.json
  results/full_protocol_geo2/means_train.json
  results/geo2_prior_test/means.json
  results/geo2_prior_test/results.csv
  results/geo2_prior_val/means.json
  results/geo2_prior_val/results.csv
  results/meta_stable_pinned.json
  results/meta_stable_pinned_geo.json
  results/mp40_geo_prompt_eval/means.json
  results/mp40_geo_prompt_eval/results.csv
  results/mp40_geo_prompt_eval_prior/means.json
  results/mp40_geo_prompt_eval_prior/results.csv
  results/R5_SUMMARY.md
)

while :; do
  # refresh the auto-generated measurement summary (cheap json reads)
  timeout 120 python scripts/r5_report.py >/dev/null 2>&1 || true
  existing=()
  for p in "${PATHS_GLOB[@]}"; do
    [ -e "$p" ] && existing+=("$p")
  done
  if [ "${#existing[@]}" -gt 0 ]; then
    for try in 1 2 3; do
      git add -f "${existing[@]}" 2>/dev/null && break
      sleep 20
    done
    if ! git diff --cached --quiet -- "${existing[@]}"; then
      ep=$(python - <<'EOF'
import json
last = 0
for f in ("logs/mp40_geo2/metrics.jsonl", "logs/mp40_geo_prompt/metrics.jsonl"):
    try:
        with open(f) as fh:
            for line in fh:
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
      for try in 1 2 3; do
        if git commit -q -m "Autosave in-flight round-5 checkpoints (epoch ${ep})" \
            -- "${existing[@]}" 2>/dev/null; then
          log "committed at epoch ${ep}"
          break
        fi
        sleep 20
      done
    else
      log "no checkpoint changes"
    fi
  else
    log "no checkpoints yet"
  fi
  sleep 1800
done
