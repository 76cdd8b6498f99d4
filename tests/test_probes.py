"""CPU smokes for the on-chip measurement probes (scripts/probe_*.py).

The probes are how every capability claim in BENCH.md gets measured; these
smokes run their full control flow (sampling, detection, aggregation) with
a tiny random-init model so an API change cannot silently break the next
on-chip measurement run.
"""

import jax
import pytest

from chemeleon_tpu import Chemeleon, get_config

TINY = dict(hidden_dim=32, time_dim=16, num_layers=1, num_freqs=8,
            timesteps=10, text_embed_dim=32, text_dim=32)


@pytest.fixture(scope="module")
def comp_model():
    cfg = get_config("chemeleon_composition_crystal_system", **TINY)
    m = Chemeleon(cfg)
    m.init_params(jax.random.PRNGKey(0))
    return m


def test_probe_system_smoke(comp_model, monkeypatch):
    import chemeleon_tpu.scripts.probe_system as ps

    monkeypatch.setattr(ps, "TARGETS", ps.TARGETS[:1])
    monkeypatch.setattr(ps, "SYSTEMS", ("cubic", "triclinic"))
    out = ps.probe(comp_model, n_samples=1, seed=0)
    assert set(out["by_system"]) == {"cubic", "triclinic"}
    for s, d in out["by_system"].items():
        assert d["n"] == 1
        assert abs(sum(d["raw_dist"].values()) - 1.0) < 1e-9
        assert 0.0 <= d["follow"] <= 1.0
    # a random-init model cannot steer; aggregate stats must still be finite
    assert 0.0 <= out["follow_mean"] <= 1.0
    assert 0.0 <= out["baseline_match_mean"] <= 1.0
    # continuous lattice statistics (the sensitive steering readout)
    import math
    for agg in [out["baseline"], *out["by_system"].values()]:
        ls = agg["lattice_stats"]
        assert ls["n"] == agg["n"] == len(agg["lattice_params"])
        for k in ("angle_dev90", "angle_dev120", "len_cv"):
            assert math.isfinite(ls[k]["mean"]) and ls[k]["mean"] >= 0.0
            assert math.isfinite(ls[k]["se"])


def test_probe_system_clamp_smoke(comp_model, monkeypatch):
    import chemeleon_tpu.scripts.probe_system as ps

    monkeypatch.setattr(ps, "TARGETS", ps.TARGETS[:1])
    monkeypatch.setattr(ps, "SYSTEMS", ("cubic",))
    out = ps.probe_clamp(comp_model, n_samples=2, seed=0)
    assert set(out) == {"unclamped", "cubic"}
    # the clamp is a guarantee, not a tendency: even a random-init model
    # must emit lattice-system-exact cells
    assert out["cubic"]["lattice_follow"] == 1.0
    for d in out.values():
        assert 0.0 <= d["valid_raw"] <= 1.0
        assert 0.0 <= d["valid_relaxed"] <= 1.0


def test_probe_system_no_relax(comp_model, monkeypatch):
    import chemeleon_tpu.scripts.probe_system as ps

    monkeypatch.setattr(ps, "TARGETS", ps.TARGETS[:1])
    monkeypatch.setattr(ps, "SYSTEMS", ("cubic",))
    out = ps.probe(comp_model, n_samples=2, seed=0, relax=False)
    d = out["by_system"]["cubic"]
    assert d["raw_dist"] == d["rel_dist"]  # relax skipped => identical


def test_probe_fewstep_smoke(comp_model, monkeypatch):
    import chemeleon_tpu.scripts.probe_fewstep as pf

    monkeypatch.setattr(pf, "CHUNK", {16: 2})
    out = pf.probe(comp_model, steps_ladder=[0, 5], per_bucket=4)
    assert set(out) == {"full", "5"}
    for d in out.values():
        b = d["buckets"]["16"]
        assert b["n"] == 4
        # 2 chunks of 2: exactly one steady-state timed chunk
        assert b["structures_per_sec"] is None or \
            b["structures_per_sec"] > 0
        assert 0.0 <= d["valid"] <= d["valid_relaxed"] <= 1.0


def test_probe_csp_fewstep_smoke(comp_model, monkeypatch):
    import chemeleon_tpu.scripts.probe_csp as pc

    monkeypatch.setattr(pc, "TARGETS", pc.TARGETS[:1])
    out = pc.probe(comp_model, n_samples=2, sample_steps=5)
    comp, = [k for k in out if not k.startswith("_")]
    assert out[comp]["exact_composition"] == 1.0  # CSP clamp guarantees it
    assert out["_mean"]["valid_relaxed"] >= out["_mean"]["valid_raw"]


def test_probe_knn_smoke():
    """probe_knn (the fc-vs-knn edge-path timing probe) control flow at
    tiny dims: both edge styles sample successfully and report a rate."""
    from chemeleon_tpu.scripts.probe_knn import time_sampler

    for style in ("fc", "knn"):
        sps = time_sampler(style, 8, 2, timesteps=4, max_neighbors=4,
                           hidden_dim=32, num_layers=1, num_freqs=8,
                           time_dim=16, text_dim=32, text_embed_dim=32)
        assert sps > 0


def test_probe_meta_stable_staged_smoke(comp_model, tmp_path, monkeypatch):
    """probe_meta_stable's gen/score split: 'gen' must cache crystals and
    stop before any energy work; 'score' must rebuild the full report from
    the cache alone (no sampler, no checkpoint load)."""
    import sys

    import chemeleon_tpu.scripts.probe_meta_stable as pm

    monkeypatch.setattr(pm, "N_ROWS", 2)
    monkeypatch.setattr(pm, "N_SAMPLES", 2)
    monkeypatch.setattr(pm, "REPEATS", 2)
    monkeypatch.setattr(pm, "RELAX_STEPS", 3)
    monkeypatch.setattr(pm, "MIN_SAME", 1)
    from chemeleon_tpu.models.chemeleon import Chemeleon as C
    monkeypatch.setattr(C, "load_from_checkpoint",
                        classmethod(lambda cls, *a, **kw: comp_model))
    out = tmp_path / "pinned.json"
    argv = ["probe_meta_stable", "--model", "ignored",
            "--test-data", "data/mp-40/test.csv", "--out", str(out)]

    monkeypatch.setattr(sys, "argv", argv + ["--stage", "gen"])
    pm.main()
    cache = out.with_suffix(".gencache")
    assert len(list(cache.glob("rep*_row*.npz"))) == 4  # 2 reps x 2 rows
    assert not out.exists()  # gen stage stops before scoring

    monkeypatch.setattr(sys, "argv", argv + ["--stage", "score"])
    pm.main()
    import json
    rep = json.loads(out.read_text())
    assert rep["quoted"]["depth"] == 3
    assert len(rep["repeats"]) == 2
    assert "surrogate_calibration_at_depth" in rep
