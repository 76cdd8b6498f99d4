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

Because raw diffusion output almost never passes exact symmetry detection
(the first run classified 98.75% of ALL samples triclinic regardless of
prompt), the probe also records per-sample lattice parameters and reports
CONTINUOUS steering statistics per prompted system — far more sensitive
than the hard classifier:
  angle_dev90   mean |angle - 90deg| over the 3 cell angles (cubic/
                tetragonal/orthorhombic prompts should push this DOWN)
  angle_dev120  min over angles of |angle - 120deg| (hexagonal/trigonal
                prompts should push this down)
  len_cv        std/mean of (a, b, c) (cubic prompts should push this down)
Each comes with a standard error so a flat negative is distinguishable
from an underpowered probe.

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
    if relax_calc is None:
        return raw, raw
    try:
        relaxed, _ = fire_relax(crystal, relax_calc, steps=60)
        rel = _crystal_system(relaxed)
    except Exception:
        rel = raw
    return raw, rel


def _lattice_stats(lps) -> dict:
    """Continuous symmetry statistics over per-sample lattice params.

    lps: list of (a, b, c, alpha, beta, gamma). Returns means + standard
    errors for the three steering-sensitive statistics documented in the
    module docstring."""
    import numpy as np

    lps = np.asarray(lps, dtype=np.float64)  # [n, 6]
    n = len(lps)
    abc, ang = lps[:, :3], lps[:, 3:]
    dev90 = np.abs(ang - 90.0).mean(axis=1)           # [n]
    dev120 = np.abs(ang - 120.0).min(axis=1)          # [n]
    cv = abc.std(axis=1) / abc.mean(axis=1)           # [n]

    def _ms(x):
        se = float(x.std(ddof=1) / np.sqrt(n)) if n > 1 else 0.0
        return {"mean": float(x.mean()), "se": se}

    return {"n": n, "angle_dev90": _ms(dev90), "angle_dev120": _ms(dev120),
            "len_cv": _ms(cv)}


def probe_clamp(model, n_samples: int, seed: int = 0):
    """Measure the lattice-system clamp (``lattice_system=`` sampling arg,
    ops/lattice_proj): per prompted system, the LATTICE-system follow rate
    (1.0 expected by construction — a live end-to-end check of the clamp)
    and geometric validity raw/relaxed vs the unclamped baseline (the
    deployment cost question)."""
    from chemeleon_tpu.chem.lattice import crystal_system_from_lattice
    from chemeleon_tpu.chem.validity import structure_validity
    from chemeleon_tpu.eval.optimize import SoftSphereCalculator, fire_relax

    calc = SoftSphereCalculator(radius_scale=0.6)
    out = {}
    for si, sys_word in enumerate([None] + list(SYSTEMS)):
        n_follow = n_valid = n_rel = n_tot = 0
        for ti, (target, z) in enumerate(TARGETS):
            red = reduced_composition(parse_composition(target))
            comp = reduced_formula_alphabetical(red)
            n_atoms = composition_natoms(red) * z
            text = (f"composition: {comp}" if sys_word is None else
                    f"composition: {comp}, crystal_system: {sys_word}")
            key = jax.random.fold_in(
                jax.random.PRNGKey(seed), 919 * ti + si)
            crystals = model.sample_batch(
                [n_atoms] * n_samples, [text] * n_samples, key=key,
                lattice_system=sys_word)
            for c in crystals:
                n_tot += 1
                if sys_word is not None and \
                        crystal_system_from_lattice(c.lattice) == sys_word:
                    n_follow += 1
                v = structure_validity(c)
                n_valid += v
                try:
                    relaxed, _ = fire_relax(c, calc, steps=60)
                    n_rel += structure_validity(relaxed)
                except Exception:
                    n_rel += v
        out[sys_word or "unclamped"] = {
            "n": n_tot, "valid_raw": n_valid / n_tot,
            "valid_relaxed": n_rel / n_tot,
            **({} if sys_word is None
               else {"lattice_follow": n_follow / n_tot})}
        print(f"clamp={sys_word or '(none)'}: "
              f"{json.dumps(out[sys_word or 'unclamped'])}", flush=True)
    return out


def probe(model, n_samples: int, seed: int = 0, relax: bool = True):
    from chemeleon_tpu.eval.optimize import SoftSphereCalculator

    calc = SoftSphereCalculator(radius_scale=0.6) if relax else None
    prompts = [None] + list(SYSTEMS)  # None = no-system baseline
    per_system = {s: {"n": 0, "raw": Counter(), "rel": Counter(), "lp": []}
                  for s in SYSTEMS}
    baseline = {"n": 0, "raw": Counter(), "rel": Counter(), "lp": []}

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
                agg["lp"].append([float(x) for x in c.lattice_params])
            if sys_word is not None:
                f = per_system[sys_word]["raw"][sys_word] / per_system[
                    sys_word]["n"]
                print(f"{comp} sys={sys_word}: follow so far {f:.3f}",
                      flush=True)

    def _pack(agg):
        n = agg["n"]
        return {"n": n,
                "raw_dist": {s: agg["raw"][s] / n for s in SYSTEMS},
                "rel_dist": {s: agg["rel"][s] / n for s in SYSTEMS},
                "lattice_stats": _lattice_stats(agg["lp"]),
                "lattice_params": agg["lp"]}

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
    ap.add_argument("--no-relax", action="store_true",
                    help="skip the FIRE relax pass (fast lattice-stats run;"
                         " rel_dist then duplicates raw_dist)")
    ap.add_argument("--clamp", action="store_true",
                    help="probe the lattice-system CLAMP instead of prompt "
                         "steering: follow rate (1.0 by construction) + "
                         "validity cost vs unclamped (probe_clamp)")
    args = ap.parse_args()

    from chemeleon_tpu.models.chemeleon import Chemeleon
    model = Chemeleon.load_from_checkpoint(args.model)
    if args.clamp:
        results = {"model": args.model, "n_samples": args.n_samples,
                   "cond_scale": 2.0,
                   "clamp": probe_clamp(model, args.n_samples, args.seed)}
        Path(args.out).parent.mkdir(parents=True, exist_ok=True)
        Path(args.out).write_text(json.dumps(results, indent=1))
        print(f"wrote {args.out}")
        return
    results = {"model": args.model, "n_samples": args.n_samples,
               "cond_scale": 2.0,
               **probe(model, args.n_samples, args.seed,
                       relax=not args.no_relax)}
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(json.dumps(results, indent=1))
    print(f"wrote {args.out}")
    print(json.dumps({k: results[k] for k in
                      ("follow_mean", "follow_rel_mean",
                       "baseline_match_mean")}))
    bs = results["baseline"]["lattice_stats"]
    print(f"{'prompt':>13}  angle_dev90        angle_dev120       len_cv")
    print(f"{'(baseline)':>13}  {bs['angle_dev90']['mean']:6.3f}±"
          f"{bs['angle_dev90']['se']:5.3f}      "
          f"{bs['angle_dev120']['mean']:6.3f}±{bs['angle_dev120']['se']:5.3f}"
          f"      {bs['len_cv']['mean']:6.4f}±{bs['len_cv']['se']:6.4f}")
    for s in SYSTEMS:
        ls = results["by_system"][s]["lattice_stats"]
        print(f"{s:>13}  {ls['angle_dev90']['mean']:6.3f}±"
              f"{ls['angle_dev90']['se']:5.3f}      "
              f"{ls['angle_dev120']['mean']:6.3f}±"
              f"{ls['angle_dev120']['se']:5.3f}      "
              f"{ls['len_cv']['mean']:6.4f}±{ls['len_cv']['se']:6.4f}")


if __name__ == "__main__":
    main()
