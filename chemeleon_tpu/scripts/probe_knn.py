"""On-chip timing probe for the knn edge path vs fc (round-3 VERDICT #8).

The knn path (config edge_style="knn": radius_graph_pbc + gathered
[B,N,2K,*] message passing, ops/graph.py / models/cspnet.py) measured
1.77 structs/s at N=40 in round 2 — 0.85x the north star vs 3.38 for the
dense fc path. Round 4 removed the two [B,N,N*27] scatters from the
neighbor selection (threshold-compare selection, ops/graph.py); this probe
re-times both paths at the tail bucket plus a beyond-mp40 size where the
2K < N edge reduction actually bites, so the knn path's designation
(deployment vs large-N-only) is a measured statement.

    python -m chemeleon_tpu.scripts.probe_knn --out results/knn_probe.json
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]


def time_sampler(edge_style: str, n_atoms: int, batch: int,
                 timesteps: int = 1000, max_neighbors: int = 20,
                 **dims):
    import jax
    from chemeleon_tpu.config import get_config
    from chemeleon_tpu.models.chemeleon import Chemeleon

    arch = dict(hidden_dim=512, num_layers=6, num_freqs=128, time_dim=256,
                text_dim=128, text_embed_dim=256)
    arch.update(dims)  # smoke tests shrink the model (tests/test_probes.py)
    cfg = get_config(
        "chemeleon_composition", edge_style=edge_style, timesteps=timesteps,
        max_neighbors=max_neighbors, compute_dtype="bfloat16",
        pad_buckets=(n_atoms,), **arch)
    m = Chemeleon(cfg, text_backend="composition")
    m.init_params(jax.random.PRNGKey(0))
    natoms = [n_atoms] * batch
    texts = ["LiMnO4"] * batch
    # warm (compile)
    m.sample_batch(natoms, texts, key=jax.random.PRNGKey(1), n_max=n_atoms)
    t0 = time.perf_counter()
    crystals = m.sample_batch(natoms, texts, key=jax.random.PRNGKey(2),
                              n_max=n_atoms)
    dt = time.perf_counter() - t0
    return len(crystals) / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="results/knn_probe.json")
    ap.add_argument("--timesteps", type=int, default=1000)
    args = ap.parse_args()

    out = {}
    #   (n_atoms, batch): N=40/B=32 is the mp-40 tail bucket (fc incumbent
    #   3.38 structs/s); N=64/B=16 is past the fc crossover candidate
    for n_atoms, batch in ((40, 32), (64, 16)):
        cell = {}
        for style in ("fc", "knn"):
            try:
                sps = time_sampler(style, n_atoms, batch,
                                   timesteps=args.timesteps)
                cell[style] = round(sps, 3)
                print(f"N={n_atoms} B={batch} {style}: {sps:.3f} structs/s",
                      flush=True)
            except Exception as e:  # keep the probe running per-cell
                cell[style] = f"error: {e}"
                print(f"N={n_atoms} {style} failed: {e}", flush=True)
        if (isinstance(cell.get("fc"), float)
                and isinstance(cell.get("knn"), float)):
            cell["knn_over_fc"] = round(cell["knn"] / cell["fc"], 3)
        out[f"n{n_atoms}_b{batch}"] = cell

    path = REPO / args.out
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
