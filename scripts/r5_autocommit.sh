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
)

while :; do
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
