"""bench.py's claimed workload must stay tied to the vendored dataset.

The headline bench number is "the real mp-40 test-set bucket mix"
(reference evaluate.py:26-28 runs exactly this 708-row set); these tests
recompute the histogram from data/mp-40/test.csv so the constants in
bench.py can never silently drift from the data they claim to represent.
"""

import csv
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import bench  # noqa: E402
from chemeleon_tpu.chem.cif import parse_cif  # noqa: E402
from chemeleon_tpu.ops.graph import pick_bucket  # noqa: E402


def test_bucket_mix_matches_dataset():
    csv.field_size_limit(10 ** 9)
    buckets = sorted(bench.MP40_BUCKET_MIX)
    hist = {b: 0 for b in buckets}
    with open(REPO / "data" / "mp-40" / "test.csv") as f:
        rows = list(csv.DictReader(f))
    for r in rows:
        hist[pick_bucket(len(parse_cif(r["cif"])), buckets)] += 1
    assert len(rows) == 708  # reference evaluate.py:26-28 protocol
    assert hist == bench.MP40_BUCKET_MIX


def test_every_bucket_has_a_tuned_batch_size():
    assert set(bench.BUCKET_BATCH) == set(bench.MP40_BUCKET_MIX)
    assert all(b > 0 for b in bench.BUCKET_BATCH.values())
