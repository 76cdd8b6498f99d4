"""subset_means: held-out re-scoring of a protocol results.csv (CPU-only)."""

import csv
import json

from chemeleon_tpu.scripts.subset_means import subset_means


def _write_csv(path, rows, fields):
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=fields)
        w.writeheader()
        w.writerows(rows)


def test_subset_and_invert(tmp_path):
    results = tmp_path / "results.csv"
    _write_csv(results, [
        {"material_id": "mp-1", "structure_matching": "True",
         "composition_matching": "0.5"},
        {"material_id": "mp-2", "structure_matching": "False",
         "composition_matching": "0.25"},
        {"material_id": "mp-3", "structure_matching": "False",
         "composition_matching": "nan"},
    ], ["material_id", "structure_matching", "composition_matching"])
    split = tmp_path / "test.csv"
    _write_csv(split, [{"material_id": "mp-1", "cif": ""},
                       {"material_id": "mp-3", "cif": ""}],
               ["material_id", "cif"])

    out = tmp_path / "means_heldout.json"
    m = subset_means(str(results), [str(split)], str(out))
    assert m["rows_total"] == 3 and m["rows_subset"] == 2
    assert m["mean_structure_matching"] == 0.5          # True + False
    assert m["mean_composition_matching"] == 0.5        # nan excluded
    assert m["n_composition_matching"] == 1
    # NaN stderr entries (n=1) are deliberately kept; compare finite keys
    saved = json.load(open(out))
    assert {k: v for k, v in saved.items() if v == v} \
        == {k: v for k, v in m.items() if v == v}

    inv = subset_means(str(results), [str(split)], invert=True)
    assert inv["rows_subset"] == 1
    assert inv["mean_composition_matching"] == 0.25
