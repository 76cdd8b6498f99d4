"""Measure CSP-mode (fixed-composition) sampling quality on canonical targets.

CSP mode (``Chemeleon.sample_csp``) clamps atom types to the target
composition and diffuses only geometry — composition is exact by
construction, so the quality question is purely geometric: what fraction of
samples is a valid structure, raw and after the soft-sphere FIRE relax the
reference pipeline applies before use (optimize.py post-step)?

This was measured ad hoc in round 3 (BENCH.md "CSP mode is the working
answer"); this script makes the probe a reproducible artifact:

    python -m chemeleon_tpu.scripts.probe_csp \
        --model logs/mp40_comp/checkpoints/best \
        --out results/csp_probe.json
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import jax

# same targets/Z-factors as probe_comp_prior — 6-10-atom cells
TARGETS = [("TiO2", 2), ("NaCl", 3), ("Fe2O3", 2), ("LiMnO4", 1),
           ("SrTiO3", 2)]


def probe(model, n_samples: int, seed: int = 0, sample_steps: int = 0):
    from chemeleon_tpu.chem.composition import (
        parse_composition, reduced_composition,
        reduced_formula_alphabetical)
    from chemeleon_tpu.chem.validity import structure_validity
    from chemeleon_tpu.eval.optimize import SoftSphereCalculator, fire_relax

    calc = SoftSphereCalculator(radius_scale=0.6)
    out = {}
    for ti, (target, z) in enumerate(TARGETS):
        comp = reduced_formula_alphabetical(
            reduced_composition(parse_composition(target)))
        key = jax.random.fold_in(jax.random.PRNGKey(seed), ti)
        crystals = model.sample_csp(comp, n_samples, z=z, key=key,
                                    sample_steps=sample_steps or None)
        n_valid = n_relaxed = n_exact = 0
        for c in crystals:
            n_exact += c.reduced_formula() == comp
            if structure_validity(c):
                n_valid += 1
                n_relaxed += 1
            else:
                relaxed, _ = fire_relax(c, calc, steps=60)
                n_relaxed += structure_validity(relaxed)
        out[comp] = {
            "n": n_samples,
            "exact_composition": n_exact / n_samples,  # 1.0 by construction
            "valid_raw": n_valid / n_samples,
            "valid_relaxed": n_relaxed / n_samples,
        }
        print(f"{comp}: exact {out[comp]['exact_composition']:.3f} "
              f"raw {out[comp]['valid_raw']:.3f} "
              f"relaxed {out[comp]['valid_relaxed']:.3f}", flush=True)
    ks = list(out)
    out["_mean"] = {m: sum(out[k][m] for k in ks) / len(ks)
                    for m in ("exact_composition", "valid_raw",
                              "valid_relaxed")}
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True,
                    help="diffusion checkpoint dir (orbax)")
    ap.add_argument("--n-samples", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--sample-steps", type=int, default=0,
                    help="few-step CSP: K strided reverse steps (0 = full "
                         "chain) — exact composition at deployment speed")
    ap.add_argument("--out", default="results/csp_probe.json")
    args = ap.parse_args()

    from chemeleon_tpu.models.chemeleon import Chemeleon
    model = Chemeleon.load_from_checkpoint(args.model)
    result = probe(model, args.n_samples, args.seed, args.sample_steps)
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result["_mean"]))


if __name__ == "__main__":
    main()
