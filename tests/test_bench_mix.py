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


def test_scan_flops_multiplier_calibrates_body_undercount():
    """XLA cost analysis counts a scan body once (no trip-count multiply);
    the bench MFU column must calibrate this or it under-reports by
    ~timesteps x (the round-3 0.0007-MFU bug)."""
    import jax

    from chemeleon_tpu import Chemeleon, get_config

    cfg = get_config(None, hidden_dim=32, num_layers=1, num_freqs=8,
                     time_dim=16, text_dim=16, text_embed_dim=32,
                     timesteps=20, pad_buckets=(8,))
    m = Chemeleon(cfg, text_backend="hash")
    m.init_params(jax.random.PRNGKey(0))
    bench._SCAN_FLOPS_MULT = None  # reset the per-run cache
    try:
        mult = bench._scan_flops_multiplier(m, 6, 4)
    finally:
        bench._SCAN_FLOPS_MULT = None
    # either the backend counts the body once (-> multiplier == timesteps)
    # or it already multiplies (-> 1.0); anything else means the
    # calibration itself is broken
    assert mult in (20.0, 1.0)
    # on current CPU/TPU backends it is the undercounting case; if this
    # flips after a JAX upgrade the bench stays correct by construction,
    # but we want to notice
    full = float(m.sampler_cost_analysis([6] * 4, ["x"] * 4)["flops"])
    one = float(m.sampler_cost_analysis([6] * 4, ["x"] * 4,
                                        ts_len=1)["flops"])
    assert (mult == 20.0) == (full < 2.0 * one)
