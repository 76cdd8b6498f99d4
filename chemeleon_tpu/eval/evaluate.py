"""Model-quality evaluation over the mp-40 test set.

Rebuild of the reference evaluation script (reference:
chemeleon/scripts/evaluate.py:22-174): per test row, sample n structures with
the row's text condition, then compute validity / uniqueness / structure
matching / metastability / composition / crystal-system / lattice-system
matching; write per-row + mean results to CSV.

TPU-native speedup: rows with the same natoms bucket reuse one compiled
sampler; all chemistry metrics stay host-side numpy (they are chemistry, not
model code).
"""

from __future__ import annotations

import csv
import json
import math
from collections import defaultdict
from pathlib import Path
from typing import Dict, List, Optional, Union

import jax
import numpy as np

from chemeleon_tpu.chem.cif import parse_cif
from chemeleon_tpu.eval import metrics as M


def _assemble_text(row: Dict[str, str], text_targets) -> str:
    vals = [row[t] for t in text_targets]
    if len(text_targets) == 1:
        return str(vals[0])
    return ", ".join(f"{t}: {v}" for t, v in zip(text_targets, vals))


def _save_gen_chunk(path: Path, crystals) -> None:
    """Persist one generation chunk (ragged Crystal list as flat arrays)."""
    natoms = np.asarray([len(c) for c in crystals], np.int32)
    np.savez(path,
             natoms=natoms,
             atom_types=np.concatenate([c.atom_types for c in crystals]),
             frac_coords=np.concatenate([c.frac_coords for c in crystals]),
             lattices=np.stack([c.lattice for c in crystals]))


def _load_gen_chunk(path: Path):
    from chemeleon_tpu.chem.structure import Crystal
    d = np.load(path)
    out, off = [], 0
    for i, n in enumerate(d["natoms"]):
        out.append(Crystal(lattice=d["lattices"][i],
                           frac_coords=d["frac_coords"][off:off + n],
                           atom_types=d["atom_types"][off:off + n]))
        off += int(n)
    return out


def _max_gen_batch(bucket: int, hidden_dim: int) -> int:
    """Largest safe sampler batch for a padding bucket.

    The dominant live tensors in the compiled sampler are the dual-replica
    [2B, N, N, H] bf16 edge blocks; cap their footprint so packed generation
    cannot exhaust device memory at large buckets (measured on v5e: B=160
    at N=36/H=512 crashes the TPU worker; B<=96 at N=40 is sweep-verified,
    BENCH.md round-2 batch sweep)."""
    import os
    budget = float(os.environ.get("CHEMTPU_GEN_EDGE_MB", "256")) * 1e6
    return max(1, int(budget // (2 * bucket * bucket * hidden_dim * 2)))


def _packed_generate(model, parsed, n_samples, cond_scale, key,
                     pack_rows: int = 8, csp: bool = False,
                     comp_prior_scale: float = 0.0,
                     cache_dir: Optional[Path] = None,
                     sample_steps: int = 0, fixed_cell: bool = False,
                     step_lr: float = 1e-5, cache_only: bool = False):
    """TPU-first generation: pack several test rows into one sampler batch
    (grouped by padding bucket), instead of one sampler call per row like
    the reference (evaluate.py:94-99). Returns {row_index: [Crystal]}.

    ``csp=True`` evaluates the CSP task instead of free generation: atom
    types are clamped to each test structure's own composition
    (models/chemeleon.py sampler_step), so the metrics measure geometry
    quality at known stoichiometry (the DiffCSP protocol).
    ``comp_prior_scale > 0`` keeps types diffusing freely but biases each
    row's x0 type logits toward its own composition's element fractions
    (composition-prior guidance, models/chemeleon.py sampler_step).

    ``cache_dir`` persists each generated chunk to disk and skips chunks
    already present, so a multi-hour full-protocol run survives
    interruption and resumes where it stopped."""
    from chemeleon_tpu.ops.graph import pick_bucket
    buckets = model.cfg.pad_buckets
    by_bucket: Dict[int, list] = defaultdict(list)
    for i, (test_st, text) in parsed.items():
        by_bucket[pick_bucket(len(test_st), buckets)].append(i)
    out: Dict[int, list] = {}
    if cache_dir is not None:
        cache_dir = Path(cache_dir)
        cache_dir.mkdir(parents=True, exist_ok=True)
    # protocol-variant tag: a cache written under one conditioning mode must
    # not be served to another (csp / prior-guided runs vs the same
    # save_path). Free generation keeps the untagged name so the 14k-chunk
    # full-protocol cache written before tagging (free mode only — no
    # pre-tag csp/prior cache ever existed) stays valid.
    tag = ("_csp" if csp else
           f"_prior{comp_prior_scale:g}" if comp_prior_scale > 0 else "")
    if fixed_cell:
        tag += "_cell"  # known-cell (clamped lattice) runs
    if sample_steps:
        tag += f"_k{sample_steps}"  # few-step runs get their own cache
    if step_lr != 1e-5:
        tag += f"_lr{step_lr:g}"  # non-default corrector strength
    for bucket, idxs in sorted(by_bucket.items()):
        for s in range(0, len(idxs), pack_rows):
            chunk = idxs[s: s + pack_rows]
            cpath = (cache_dir / f"gen_b{bucket}_s{s}{tag}.npz"
                     if cache_dir is not None else None)
            cached = None
            if cpath is not None and cpath.exists():
                cached = _load_gen_chunk(cpath)
                if len(cached) != len(chunk) * n_samples:
                    # a chunk written under different row packing (other
                    # max_rows/pack_rows/test_data) would silently pair
                    # samples with the wrong rows — treat as missing
                    print(f"stale cache chunk {cpath}: {len(cached)} "
                          f"samples != {len(chunk)} rows x {n_samples}")
                    cached = None
            if cached is not None:
                gen = cached
            elif cache_only:
                # scoring-only invocation (e.g. recompute_protocol on a CPU
                # host): a missing chunk means the chip-side generation was
                # interrupted — skip those rows rather than silently
                # regenerating at CPU speed
                print(f"cache_only: missing chunk {cpath}; skipping "
                      f"{len(chunk)} rows")
                continue
            else:
                natoms, texts, ftypes, comps, cells = [], [], [], [], []
                for i in chunk:
                    test_st, text = parsed[i]
                    natoms += [len(test_st)] * n_samples
                    texts += [text] * n_samples
                    ftypes += [np.asarray(test_st.atom_types)] * n_samples
                    comps += [test_st.reduced_formula()] * n_samples
                    if fixed_cell:
                        # clamp to the row's own cell in the training frame
                        # (Niggli + canonicalize, data/mp_dataset.py)
                        from chemeleon_tpu.data.mp_dataset import \
                            preprocess_structure
                        cells += [preprocess_structure(test_st).lattice
                                  ] * n_samples
                # sub-batch so the compiled sampler stays inside the device
                # memory budget at large buckets (see _max_gen_batch)
                rows_per_call = max(
                    1, _max_gen_batch(bucket,
                                      model.cfg.hidden_dim) // n_samples)
                step = rows_per_call * n_samples
                kb = jax.random.fold_in(key, bucket * 100003 + s)
                gen = []
                for p, lo in enumerate(range(0, len(natoms), step)):
                    sl = slice(lo, lo + step)
                    gen += model.sample_batch(
                        natoms[sl],
                        texts[sl] if texts[0] is not None else None,
                        cond_scale=cond_scale, n_max=bucket,
                        fixed_types=ftypes[sl] if csp else None,
                        comp_prior=(comps[sl] if comp_prior_scale > 0
                                    else None),
                        comp_prior_scale=comp_prior_scale,
                        sample_steps=sample_steps or None,
                        fixed_lattice=cells[sl] if fixed_cell else None,
                        step_lr=step_lr,
                        key=jax.random.fold_in(kb, p))
                if cpath is not None:
                    _save_gen_chunk(cpath, gen)
            for j, i in enumerate(chunk):
                out[i] = gen[j * n_samples: (j + 1) * n_samples]
    return out


def test_evaluate(model, test_data: Union[str, Path] = "data/mp-40/test.csv",
                  n_samples: int = 20, cond_scale: float = 2.0,
                  save_path: Union[str, Path] = "results",
                  max_rows: Optional[int] = None,
                  calculator=None, seed: int = 42,
                  progress: bool = True, pack_rows: int = 8,
                  csp: bool = False, comp_prior_scale: float = 0.0,
                  cache_generation: bool = False,
                  sample_steps: int = 0,
                  fixed_cell: bool = False,
                  step_lr: float = 1e-5,
                  gen_only: bool = False,
                  score_ids: Optional[set] = None,
                  cache_only: bool = False) -> Dict[str, float]:
    """Evaluate ``model`` (a Chemeleon with params loaded) on the test CSV.

    ``pack_rows`` > 1 batches several rows per compiled sampler call (same
    protocol, much higher TPU utilization). ``csp`` switches to the
    fixed-composition protocol (see _packed_generate).
    ``cache_generation`` persists generated chunks under
    save_path/gen_cache so an interrupted run resumes (re-invoke with the
    SAME test_data/n_samples/seed — chunks are keyed by position). Returns
    the mean metrics dict; writes results.csv under save_path. The CPU
    scoring pass checkpoints per-row metrics to save_path/scores.jsonl and
    resumes from it; delete that file (or recompute_protocol --rescore)
    after changing a metric definition.

    ``score_ids`` (a set of material_ids) scores only those rows this
    invocation — generation and cache keying are untouched (still
    positional over the full row list), so a later unfiltered run resumes
    from scores.jsonl and fills in the rest. Lets the held-out subset of a
    706-row protocol be scored first on a slow host.

    ``gen_only`` (requires cache_generation) stops after the generation
    phase: the chip-bound half of the protocol finishes and releases the
    device, and the CPU-bound metric pass runs later from the cache via
    scripts/recompute_protocol.py — the split that lets a 706x20 protocol
    and a training run share one chip without ever running two TPU
    clients concurrently.
    """
    if gen_only and not cache_generation:
        raise ValueError("gen_only without cache_generation would discard "
                         "the generation — pass cache_generation=True")
    if csp and comp_prior_scale > 0:
        raise ValueError("csp and comp_prior_scale are mutually exclusive: "
                         "CSP clamps atom types, so a type prior has no "
                         "effect (same rule as sample_batch)")
    csv.field_size_limit(10 ** 9)
    path = Path(test_data)
    if not path.exists():
        raise FileNotFoundError(f"{path} does not exist.")
    text_targets = list(model.cfg.text_targets)
    print(f"Text targets: {text_targets}")
    if calculator is None:
        calculator = M.default_calculator()

    collections: Dict[str, list] = defaultdict(list)
    key = jax.random.PRNGKey(seed)
    with open(path) as f:
        rows = list(csv.DictReader(f))
    if max_rows is not None:
        rows = rows[:max_rows]

    # phase 1: parse + phase 2: generation (packed across rows)
    parsed = {}
    for i, row in enumerate(rows):
        try:
            test_st = parse_cif(row["cif"])
            text = _assemble_text(row, text_targets) if text_targets else None
            parsed[i] = (test_st, text)
        except Exception as e:
            print(f"Error parsing row {i}: {e}")
    generated = _packed_generate(
        model, parsed, n_samples, cond_scale, key,
        pack_rows=max(1, pack_rows), csp=csp,
        comp_prior_scale=comp_prior_scale,
        cache_dir=Path(save_path) / "gen_cache" if cache_generation else None,
        sample_steps=sample_steps, fixed_cell=fixed_cell, step_lr=step_lr,
        cache_only=cache_only)
    if gen_only:
        print(f"gen_only: {len(generated)} rows cached under "
              f"{save_path}/gen_cache; score with recompute_protocol")
        return {}

    # Incremental scoring checkpoint: the CPU metric pass over a 706x20
    # protocol (FIRE relaxations inside test_meta_stable) can take hours on
    # a small host — persist each row's metrics as scored so a timeout or
    # interruption resumes instead of discarding the pass (the generation
    # half is already resumable via gen_cache). Keyed by row position +
    # material_id; same invariants as the gen cache (same
    # test_data/n_samples/seed).
    save = Path(save_path)
    save.mkdir(parents=True, exist_ok=True)
    scores_path = save / "scores.jsonl"
    scored: Dict[int, dict] = {}
    if scores_path.exists():
        with open(scores_path) as f:
            for line in f:
                try:
                    rec = json.loads(line)
                except json.JSONDecodeError:  # torn tail write
                    continue
                scored[int(rec["i"])] = rec
        if scored:
            print(f"Resuming scoring: {len(scored)} rows already in "
                  f"{scores_path}")

    it = [(i, rows[i]) for i in sorted(parsed)]
    if progress:
        try:
            from tqdm import tqdm
            it = tqdm(it)
        except ImportError:  # optional nicety; keep default args runnable
            pass
    for i, row in it:
        try:
            rec = scored.get(i)
            if rec is None and i not in generated:
                continue  # cache_only skipped this row's missing chunk
            if (rec is None and score_ids is not None
                    and row.get("material_id", str(i)) not in score_ids):
                continue
            if rec is None:
                test_st, text = parsed[i]
                natoms = len(test_st)
                gen_list = generated[i]

                valid = M.test_valid(gen_list)
                if not valid:
                    print("No valid samples generated.")
                    rec = {"i": i, "empty": True}
                else:
                    num_unique = M.test_unique(valid)
                    num_match = M.test_structure_matching(valid, test_st)
                    meta_stable = M.test_meta_stable(valid, test_st,
                                                     calculator)
                    num_comp = M.test_composition_matching(valid, test_st)
                    num_cs = M.test_crystal_system_matching(valid, test_st)
                    num_ls = M.test_lattice_system_matching(valid, test_st)
                    rec = {
                        "i": i,
                        "material_id": row.get("material_id", str(i)),
                        "natoms": natoms,
                        "valid_samples": len(valid) / len(gen_list),
                        "unique": num_unique / len(valid),
                        "structure_matching": bool(num_match > 0),
                        "structure_matching_ratio": num_match / len(valid),
                        "meta_stable": meta_stable,
                        "composition_matching": num_comp / len(valid),
                        "crystal_system_matching": num_cs / len(valid),
                        "lattice_system_matching": num_ls / len(valid),
                    }
                with open(scores_path, "a") as f:
                    f.write(json.dumps(rec) + "\n")
            if rec.get("empty"):
                continue
            for k, v in rec.items():
                if k not in ("i", "empty"):
                    collections[k].append(v)
        except Exception as e:  # per-row fault tolerance (evaluate.py:151-152)
            print(f"Error: {e}")

    means = {}
    for k, v in collections.items():
        if k == "material_id":
            continue
        arr = np.asarray(v, dtype=np.float64)
        finite = arr[np.isfinite(arr)]
        means[f"mean_{k}"] = (float(finite.mean()) if len(finite)
                              else float("nan"))
        # error bar on the headline (VERDICT r4 weak #4): stderr of the
        # per-row values + the finite denominator it was computed over
        means[f"stderr_{k}"] = (
            float(finite.std(ddof=1) / np.sqrt(len(finite)))
            if len(finite) > 1 else float("nan"))
        means[f"n_{k}"] = int(len(finite))

    keys = [k for k in collections if collections[k]]
    with open(save / "results.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(keys)
        for j in range(len(collections["material_id"])):
            w.writerow([collections[k][j] for k in keys])
    with open(save / "means.json", "w") as f:
        json.dump(means, f, indent=2)
    print(f"Results saved to {save / 'results.csv'}")
    print(json.dumps(means, indent=2))
    return means
