"""Measure the exact reduced-composition match rate of composition-prior
guided sampling vs plain text guidance, on canonical composition targets.

The reference's composition workflow is rejection sampling: generate with
text guidance, keep samples whose reduced composition matches exactly
(sample_target_composition.py:57-62). The pass rate of that filter IS the
workflow's productivity. This probe measures how the analytic composition
prior (models/chemeleon.py sampler_step ``type_prior``) moves that rate,
sweeping the prior scale with the text conditioning held at the protocol
default (cond_scale 2.0).

Usage (on-chip, one TPU process at a time):
    python -m chemeleon_tpu.scripts.probe_comp_prior \
        --model logs/mp40_comp/checkpoints/best \
        --out results/comp_prior_rate.json
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import jax

from chemeleon_tpu.chem.composition import (
    composition_natoms,
    parse_composition,
    reduced_composition,
    reduced_formula_alphabetical,
)
from chemeleon_tpu.chem.elements import Z_BY_SYMBOL

# (target, Z factor) — cells of 6-10 atoms, the scale the probe has used
# since round 3 began (BENCH.md "Composition guidance is live but weak")
TARGETS = [("TiO2", 2), ("NaCl", 3), ("Fe2O3", 2), ("LiMnO4", 1),
           ("SrTiO3", 2)]


def probe(model, scales, n_samples: int, seed: int = 0):
    out = {}
    for scale in scales:
        rates, elemset_rates = {}, {}
        for ti, (target, z) in enumerate(TARGETS):
            red = reduced_composition(parse_composition(target))
            comp = reduced_formula_alphabetical(red)
            n_atoms = composition_natoms(red) * z
            zset = {Z_BY_SYMBOL[el] for el in red}
            key = jax.random.fold_in(jax.random.PRNGKey(seed), ti)
            crystals = model.sample_batch(
                [n_atoms] * n_samples, [comp] * n_samples, key=key,
                comp_prior=[comp] * n_samples, comp_prior_scale=scale)
            match = sum(c.reduced_formula() == comp for c in crystals)
            inset = sum(set(c.atom_types.tolist()) <= zset for c in crystals)
            rates[comp] = match / n_samples
            elemset_rates[comp] = inset / n_samples
            print(f"scale={scale} {comp}: exact {rates[comp]:.3f} "
                  f"element-set {elemset_rates[comp]:.3f}", flush=True)
        out[str(scale)] = {
            "exact": rates,
            "exact_mean": sum(rates.values()) / len(rates),
            "element_set": elemset_rates,
            "element_set_mean":
                sum(elemset_rates.values()) / len(elemset_rates),
        }
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--out", default="results/comp_prior_rate.json")
    ap.add_argument("--n-samples", type=int, default=64)
    ap.add_argument("--scales", type=float, nargs="+",
                    default=[0.0, 0.5, 1.0, 2.0, 4.0])
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from chemeleon_tpu.models.chemeleon import Chemeleon
    model = Chemeleon.load_from_checkpoint(args.model)
    results = {"n_samples_per_target": args.n_samples,
               "cond_scale": 2.0,
               "model": args.model,
               "by_scale": probe(model, args.scales, args.n_samples,
                                 args.seed)}
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(json.dumps(results, indent=1))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
