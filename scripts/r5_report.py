"""Round-5 unattended progress report.

Assembles every round-5 measurement artifact that exists so far into
results/R5_SUMMARY.md — one regenerable page the judge (and the next
builder session) can read without chasing a dozen means.json files. The
autocommit watchdog (scripts/r5_autocommit.sh) re-runs this each cycle and
commits the output, so the summary stays current even if no interactive
session is alive when a measurement lands.

Pure stdlib + local json reads; safe to run beside any chip job.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

# (section title, path, note) — order is the narrative order for the judge.
ARTIFACTS = [
    ("mp40_geo2 train-row memorization (80x20, CSP+fixed-cell)",
     "results/geo2_memo_cell/means.json",
     "VERDICT r4 #1 headline: target strict structure_matching >= 0.15 "
     "(round-4 mp40_geo: 0.014 strict / 0.056 rms-rule)"),
    ("mp40_geo2 memorization rms-gap diagnostic",
     "results/geo2_memo_gap_cell.json", "summary block only"),
    ("mp40_geo2 held-out eval (56x8, free guided)",
     "results/mp40_geo2_eval/means.json",
     "comparable to results/mp40_geo_eval (comp_match 0.021)"),
    ("Full 706x20 protocol — held-out subset",
     "results/full_protocol_geo2/means_heldout.json",
     "VERDICT r4 #1 'first nonzero held-out under the full protocol'"),
    ("Full 706x20 protocol — train-row subset",
     "results/full_protocol_geo2/means_train.json", ""),
    ("Full 706x20 protocol — all rows",
     "results/full_protocol_geo2/means.json", "VERDICT r4 #3"),
    ("Comp-prior 1.0 held-out (test x20)",
     "results/geo2_prior_test/means.json",
     "VERDICT r4 #2: composition_matching >= 0.05 target"),
    ("Comp-prior 1.0 held-out (val x20)",
     "results/geo2_prior_val/means.json", ""),
    ("Pinned meta_stable (flagship)",
     "results/meta_stable_pinned.json", "VERDICT r4 #4"),
    ("Pinned meta_stable (mp40_geo control)",
     "results/meta_stable_pinned_geo.json", ""),
    ("Dual prompt+geo model held-out (56x20)",
     "results/mp40_geo_prompt_eval/means.json", "VERDICT r4 #2 lever"),
]

TRAIN_LOGS = [
    ("mp40_geo2 (3000 ep, sub 0.5 x supercell Z<=3 x lat 0.03)",
     "logs/mp40_geo2/metrics.jsonl"),
    ("mp40_geo_prompt (dual conditioning x geo aug)",
     "logs/mp40_geo_prompt/metrics.jsonl"),
]


def train_status(path: Path) -> str:
    if not path.exists():
        return "not started"
    last_epoch, best_raw, best_ema = -1, float("inf"), float("inf")
    try:
        with open(path) as f:
            for line in f:
                try:
                    d = json.loads(line)
                except Exception:
                    continue
                if "epoch" in d:
                    last_epoch = max(last_epoch, int(d["epoch"]))
                if "val/loss" in d:
                    best_raw = min(best_raw, float(d["val/loss"]))
                if "val/loss_ema" in d:
                    best_ema = min(best_ema, float(d["val/loss_ema"]))
    except OSError as e:
        return f"unreadable ({e})"
    age = time.time() - path.stat().st_mtime
    live = "live" if age < 900 else f"log idle {age/60:.0f} min"
    return (f"epoch {last_epoch}, best val/loss {best_raw:.4g} "
            f"(ema {best_ema:.4g}), {live}")


def fmt_value(v) -> str:
    if isinstance(v, float):
        return f"{v:.4g}"
    return str(v)


def render_json(path: Path) -> list[str]:
    try:
        data = json.loads(path.read_text())
    except Exception as e:
        return [f"(unreadable: {e})"]
    if "summary" in data and isinstance(data["summary"], dict):
        data = data["summary"]
    lines = ["| metric | value |", "|---|---|"]
    for k, v in data.items():
        if isinstance(v, (dict, list)):
            v = json.dumps(v)
            if len(v) > 120:
                v = v[:117] + "..."
        lines.append(f"| {k} | {fmt_value(v)} |")
    return lines


def main() -> None:
    out = [
        "# Round-5 measurement summary (auto-generated)",
        "",
        f"Generated {time.strftime('%Y-%m-%d %H:%M:%S')} by "
        "scripts/r5_report.py; regenerated every autocommit cycle while the "
        "r5c chain (scripts/r5c_chain.sh) runs. A missing section means "
        "that phase has not completed yet.",
        "",
        "## Training runs",
        "",
    ]
    for title, p in TRAIN_LOGS:
        out.append(f"- **{title}**: {train_status(ROOT / p)}")
    out.append("")
    for title, rel, note in ARTIFACTS:
        p = ROOT / rel
        if not p.exists():
            continue
        out.append(f"## {title}")
        out.append("")
        if note:
            out.append(f"_{note}_")
            out.append("")
        out.append(f"`{rel}`:")
        out.append("")
        out.extend(render_json(p))
        out.append("")
    dest = ROOT / "results" / "R5_SUMMARY.md"
    dest.parent.mkdir(exist_ok=True)
    dest.write_text("\n".join(out) + "\n")
    print(f"wrote {dest}")


if __name__ == "__main__":
    main()
