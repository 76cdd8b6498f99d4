"""Benchmark: crystal-structure sampling throughput on one TPU chip.

North star (BASELINE.json / BASELINE.md): 1000 valid mp-40-scale structures
via 1000-step predictor-corrector DDPM in <60 s on a v5e-8 slice
=> 2.083 structures/s/chip. This bench samples a batch of structures with the
full-size score net (hidden 512, 6 layers, 128 freqs, CFG cond_scale=2.0 —
2 decoder forwards of batch 2B per step) on the single available chip and
reports structures/s/chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BASELINE_STRUCTURES_PER_SEC_PER_CHIP = 1000.0 / 60.0 / 8.0  # 2.0833


def main():
    import jax
    from chemeleon_tpu.config import get_config
    from chemeleon_tpu.models.chemeleon import Chemeleon

    batch_size = int(os.environ.get("BENCH_BATCH", "128"))
    n_atoms = int(os.environ.get("BENCH_NATOMS", "16"))
    timesteps = int(os.environ.get("BENCH_TIMESTEPS", "1000"))
    compute_dtype = os.environ.get("BENCH_DTYPE", "bfloat16")
    # XLA path is currently faster than the fused Pallas kernel at bench
    # shapes (18.7 vs 14.6 structs/s: XLA's epilogue fusion on the large flat
    # matmuls wins); flip with BENCH_PALLAS=1 to measure the kernel.
    use_pallas = os.environ.get("BENCH_PALLAS", "0") == "1"
    edge_style = os.environ.get("BENCH_EDGE", "fc")  # fc | knn

    cfg = get_config(None, timesteps=timesteps, compute_dtype=compute_dtype,
                     pad_buckets=(n_atoms,), use_pallas=use_pallas,
                     edge_style=edge_style)
    model = Chemeleon(cfg, text_backend="hash")
    model.init_params(jax.random.PRNGKey(0))

    # Warm-up / compile (excluded from timing; jit caches persist).
    warm = model.sample("LiMnO4 with orthorhombic symmetry", n_atoms,
                        batch_size, key=jax.random.PRNGKey(1))
    del warm

    t0 = time.perf_counter()
    crystals = model.sample("LiMnO4 with orthorhombic symmetry", n_atoms,
                            batch_size, key=jax.random.PRNGKey(2))
    elapsed = time.perf_counter() - t0

    sps = batch_size / elapsed
    fwd_ms_per_step = elapsed / timesteps * 1000.0  # 2 decoder fwd of 2B each

    result = {
        "metric": "structures_per_sec_per_chip",
        "value": round(sps, 3),
        "unit": "structures/s/chip",
        "vs_baseline": round(sps / BASELINE_STRUCTURES_PER_SEC_PER_CHIP, 3),
        "detail": {
            "batch_size": batch_size,
            "n_atoms": n_atoms,
            "timesteps": timesteps,
            "compute_dtype": compute_dtype,
            "elapsed_s": round(elapsed, 3),
            "sampler_ms_per_step": round(fwd_ms_per_step, 3),
            "n_structures": len(crystals),
            "backend": jax.default_backend(),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
