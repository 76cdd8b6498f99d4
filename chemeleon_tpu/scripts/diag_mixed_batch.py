"""Diagnose the fixed per-call overhead of mixed-row sample_batch.

The fewstep probe measured ~15s fixed per 32-sample call at bucket 32 —
far above bench.py's uniform-row 6.2s TOTAL per call. All four cells below
compile to the same (B=32, N=32) program; any timing difference is
host-side work or retracing keyed on the python inputs.
"""

from __future__ import annotations

import random
import time

import jax

from chemeleon_tpu.models.chemeleon import Chemeleon

MODEL = "logs/mp40_comp_aug/checkpoints/best"
B = 32

TEXTS_DISTINCT = [
    "Fe2O3", "O2Ti", "ClNa", "LiMnO4", "O3SrTi", "BaO3Ti", "AlN", "CSi",
    "GaN", "InP", "MgO", "CaF2", "K2O", "Na2S", "CuO", "ZnS",
    "AgCl", "CdTe", "PbS", "SnO2", "MnO2", "NiO", "CoO", "CrN",
    "VN", "MoS2", "WS2", "TaC", "NbN", "ZrO2", "HfO2", "YN",
]


def cell(model, label, natoms, texts, trials=3):
    for trial in range(trials):
        key = jax.random.PRNGKey(1000 + trial)
        t0 = time.perf_counter()
        model.sample_batch(natoms, texts, key=key)
        dt = time.perf_counter() - t0
        print(f"{label} trial {trial}: {dt:.2f}s", flush=True)


def main():
    model = Chemeleon.load_from_checkpoint(MODEL)
    rng = random.Random(1)
    mixed = [rng.randint(25, 32) for _ in range(B)]
    mixed[0] = 32  # pin the pad bucket
    uni = [32] * B
    one_text = ["O2Ti"] * B

    cell(model, "uniform-n / same-text   ", uni, one_text)
    cell(model, "uniform-n / distinct-text", uni, TEXTS_DISTINCT)
    cell(model, "mixed-n   / same-text   ", mixed, one_text)
    cell(model, "mixed-n   / distinct-text", mixed, TEXTS_DISTINCT)
    # fresh-key variants: every call above reuses trial keys; check a never-
    # seen key does not retrace
    cell(model, "mixed-n   / distinct / new keys", mixed, TEXTS_DISTINCT,
         trials=1)


if __name__ == "__main__":
    main()
