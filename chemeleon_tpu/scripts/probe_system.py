"""Measure crystal-system steering: does a system word in the prompt move
the symmetry of what gets generated?

The reference ships crystal_system-conditioned presets (config.py:194-228)
and its evaluation reports crystal_system_matching (evaluate.py:231-249),
but never isolates whether the conditioning *causes* the match. This probe
does the controlled experiment on a composition+crystal_system model
(preset ``chemeleon_composition_crystal_system``): for each canonical
composition it samples with every one of the 7 crystal-system words (plus a
no-system baseline prompt) and detects the generated system with the real
symmetry-operation detector (chem/symmetry.py, symprec=0.1 semantics).

Steering shows up two ways, both reported per prompted system:
  follow      P(detected == prompted) on raw samples
  follow_rel  same after FIRE relaxation (raw diffusion output is noisy at
              symprec 0.1; relaxation snaps near-symmetric cells, so this
              is the deployment-path number)
against the baseline column = the no-system prompt's detected-system
marginal (what you'd score by chance without steering).

Usage (on-chip, one TPU process at a time):
    python -m chemeleon_tpu.scripts.probe_system \
        --model logs/mp40_sys/checkpoints/best \
        --out results/system_steering.json
"""

from __future__ import annotations

import argparse
import json
from collections import Counter
from pathlib import Path

import jax

from chemeleon_tpu.chem.composition import (
    composition_natoms,
    parse_composition,
    reduced_composition,
    reduced_formula_alphabetical,
)

# (target, Z factor) — the probe_comp_prior.py canon, cells of 6-12 atoms
TARGETS = [("TiO2", 2), ("NaCl", 3), ("Fe2O3", 2), ("LiMnO4", 1),
           ("SrTiO3", 2)]

SYSTEMS = ("triclinic", "monoclinic", "orthorhombic", "tetragonal",
           "trigonal", "hexagonal", "cubic")


def _detect(crystal, relax_calc) -> tuple:
    """(raw system, relaxed system) for one generated crystal.

    Uses the evaluator's fault-tolerant classifier (eval/metrics.py
    ``_crystal_system``: symmetry-operation detection with a cell-parameter
    fallback for degenerate generated cells)."""
    from chemeleon_tpu.eval.metrics import _crystal_system
    from chemeleon_tpu.eval.optimize import fire_relax

    raw = _crystal_system(crystal)
    try:
        relaxed, _ = fire_relax(crystal, relax_calc, steps=60)
        rel = _crystal_system(relaxed)
    except Exception:
        rel = raw
    return raw, rel


def probe(model, n_samples: int, seed: int = 0):
    from chemeleon_tpu.eval.optimize import SoftSphereCalculator

    calc = SoftSphereCalculator(radius_scale=0.6)
    prompts = [None] + list(SYSTEMS)  # None = no-system baseline
    per_system = {s: {"n": 0, "raw": Counter(), "rel": Counter()}
                  for s in SYSTEMS}
    baseline = {"n": 0, "raw": Counter(), "rel": Counter()}

    for ti, (target, z) in enumerate(TARGETS):
        red = reduced_composition(parse_composition(target))
        comp = reduced_formula_alphabetical(red)
        n_atoms = composition_natoms(red) * z
        for si, sys_word in enumerate(prompts):
            text = (f"composition: {comp}" if sys_word is None else
                    f"composition: {comp}, crystal_system: {sys_word}")
            key = jax.random.fold_in(
                jax.random.PRNGKey(seed), 101 * ti + si)
            crystals = model.sample_batch(
                [n_atoms] * n_samples, [text] * n_samples, key=key)
            agg = baseline if sys_word is None else per_system[sys_word]
            for c in crystals:
                raw, rel = _detect(c, calc)
                agg["n"] += 1
                agg["raw"][raw] += 1
                agg["rel"][rel] += 1
            if sys_word is not None:
                f = per_system[sys_word]["raw"][sys_word] / per_system[
                    sys_word]["n"]
                print(f"{comp} sys={sys_word}: follow so far {f:.3f}",
                      flush=True)

    def _pack(agg):
        n = agg["n"]
        return {"n": n,
                "raw_dist": {s: agg["raw"][s] / n for s in SYSTEMS},
                "rel_dist": {s: agg["rel"][s] / n for s in SYSTEMS}}

    out = {"baseline": _pack(baseline), "by_system": {}}
    for s in SYSTEMS:
        packed = _pack(per_system[s])
        packed["follow"] = packed["raw_dist"][s]
        packed["follow_rel"] = packed["rel_dist"][s]
        packed["baseline_raw"] = out["baseline"]["raw_dist"][s]
        packed["baseline_rel"] = out["baseline"]["rel_dist"][s]
        out["by_system"][s] = packed
    out["follow_mean"] = sum(
        out["by_system"][s]["follow"] for s in SYSTEMS) / len(SYSTEMS)
    out["follow_rel_mean"] = sum(
        out["by_system"][s]["follow_rel"] for s in SYSTEMS) / len(SYSTEMS)
    out["baseline_match_mean"] = sum(
        out["baseline"]["raw_dist"][s] for s in SYSTEMS) / len(SYSTEMS)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--out", default="results/system_steering.json")
    ap.add_argument("--n-samples", type=int, default=32)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from chemeleon_tpu.models.chemeleon import Chemeleon
    model = Chemeleon.load_from_checkpoint(args.model)
    results = {"model": args.model, "n_samples": args.n_samples,
               "cond_scale": 2.0,
               **probe(model, args.n_samples, args.seed)}
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(json.dumps(results, indent=1))
    print(f"wrote {args.out}")
    print(json.dumps({k: results[k] for k in
                      ("follow_mean", "follow_rel_mean",
                       "baseline_match_mean")}))


if __name__ == "__main__":
    main()
