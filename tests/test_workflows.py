"""Workflow-layer tests: CLI, scripts, evaluation, serving, visualization,
relaxation — all with a tiny injected model (no pretrained weights)."""

import csv
import json
import os
import socket
import time

import jax
import numpy as np
import pytest
from click.testing import CliRunner

from chemeleon_tpu.chem.cif import write_cif
from chemeleon_tpu.chem.lattice import lattice_from_parameters
from chemeleon_tpu.chem.structure import Crystal
from chemeleon_tpu.config import get_config
from chemeleon_tpu.models.chemeleon import Chemeleon

TINY = dict(hidden_dim=32, time_dim=16, text_dim=24, num_layers=2,
            num_freqs=4, timesteps=20, text_embed_dim=32, pad_buckets=(8, 16))


@pytest.fixture(scope="module")
def model():
    cfg = get_config(None, **TINY)
    m = Chemeleon(cfg, text_backend="hash")
    m.init_params(jax.random.PRNGKey(0))
    return m


def test_cli_help_tree():
    from chemeleon_tpu.cli import cli
    r = CliRunner().invoke(cli, ["--help"])
    assert r.exit_code == 0
    for grp in ["navigate", "sample", "evaluate", "bench", "warmup",
                "retrieval"]:
        assert grp in r.output
    r = CliRunner().invoke(cli, ["sample", "--help"])
    assert "composition" in r.output and "prompt" in r.output
    r = CliRunner().invoke(cli, ["sample", "prompt", "--help"])
    for flag in ["--text-input", "--n-atoms", "--n-samples", "--save-dir"]:
        assert flag in r.output
    r = CliRunner().invoke(cli, ["navigate", "system", "--help"])
    for flag in ["--elements", "--max-stoich", "--max-natoms", "--max-factor"]:
        assert flag in r.output


def test_sample_prompt_script(model, tmp_path):
    from chemeleon_tpu.scripts.sample_prompt import sample_prompt
    out = sample_prompt("LiMnO4", n_samples=2, n_atoms=4,
                        save_dir=str(tmp_path), model=model,
                        key=jax.random.PRNGKey(0))
    assert len(out) == 2
    cifs = [f for f in os.listdir(tmp_path) if f.endswith(".cif")]
    assert len(cifs) == 2
    text = (tmp_path / cifs[0]).read_text()
    assert "_cell_length_a" in text


def test_sample_target_composition_script(model, tmp_path):
    from chemeleon_tpu.scripts.sample_target_composition import (
        sample_target_composition,
    )
    out = sample_target_composition("TiO2", n_samples=3, max_natoms=6,
                                    max_factor=2, save_dir=str(tmp_path),
                                    model=model, key=jax.random.PRNGKey(0))
    # untrained model: unlikely to hit composition, but pipeline must run
    assert isinstance(out, list)


def test_enumerate_valid_compositions():
    from chemeleon_tpu.scripts.navigate_chemical_system import (
        enumerate_valid_compositions,
    )
    comps = enumerate_valid_compositions(["Ti", "O"], max_stoich=4)
    formulas = {"".join(f"{el}{n if n > 1 else ''}"
                        for el, n in sorted(c.items())) for c in comps}
    assert "O2Ti" in formulas  # TiO2
    assert "Ti" in formulas    # elemental is valid
    # all returned pass smact
    from chemeleon_tpu.chem.validity import smact_validity
    assert all(smact_validity(c) for c in comps)


def test_evaluate_end_to_end(model, tmp_path, monkeypatch):
    from chemeleon_tpu.eval import evaluate as ev
    from chemeleon_tpu.eval.evaluate import test_evaluate
    # untrained weights produce >60 A lattices; bypass the validity filter so
    # the metric pipeline itself is exercised
    monkeypatch.setattr(ev.M, "test_valid", lambda lst: list(lst))
    rng = np.random.default_rng(0)
    rows = []
    for i in range(2):
        n = int(rng.integers(3, 6))
        c = Crystal(lattice_from_parameters(4, 5, 6, 90, 90, 90),
                    rng.uniform(size=(n, 3)), rng.integers(1, 20, n))
        rows.append({"material_id": f"mp-{i}", "cif": write_cif(c),
                     "composition": c.reduced_formula()})
    path = tmp_path / "test.csv"
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["material_id", "cif", "composition"])
        w.writeheader()
        w.writerows(rows)

    means = test_evaluate(model, test_data=path, n_samples=4,
                          save_path=str(tmp_path / "res"), progress=False)
    assert (tmp_path / "res" / "results.csv").exists()
    for k in ["mean_valid_samples", "mean_unique", "mean_structure_matching",
              "mean_composition_matching", "mean_crystal_system_matching",
              "mean_lattice_system_matching"]:
        assert k in means, k
    assert 0.0 <= means["mean_valid_samples"] <= 1.0


def test_evaluate_scoring_resume(model, tmp_path, monkeypatch):
    """The CPU scoring pass checkpoints per-row metrics to scores.jsonl:
    a re-invocation must reuse them (no re-scoring) and reproduce the same
    means; deleting the file forces a fresh score."""
    from chemeleon_tpu.eval import evaluate as ev
    from chemeleon_tpu.eval.evaluate import test_evaluate
    monkeypatch.setattr(ev.M, "test_valid", lambda lst: list(lst))
    rng = np.random.default_rng(3)
    rows = []
    for i in range(2):
        n = int(rng.integers(3, 6))
        c = Crystal(lattice_from_parameters(4, 5, 6, 90, 90, 90),
                    rng.uniform(size=(n, 3)), rng.integers(1, 20, n))
        rows.append({"material_id": f"mp-{i}", "cif": write_cif(c),
                     "composition": c.reduced_formula()})
    path = tmp_path / "test.csv"
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["material_id", "cif", "composition"])
        w.writeheader()
        w.writerows(rows)

    save = tmp_path / "res"
    means1 = test_evaluate(model, test_data=path, n_samples=2,
                           save_path=str(save), progress=False,
                           cache_generation=True)
    scores = save / "scores.jsonl"
    assert scores.exists()
    assert len(scores.read_text().splitlines()) == 2

    calls = []
    orig = ev.M.test_structure_matching
    monkeypatch.setattr(ev.M, "test_structure_matching",
                        lambda *a, **kw: calls.append(1) or orig(*a, **kw))
    means2 = test_evaluate(model, test_data=path, n_samples=2,
                           save_path=str(save), progress=False,
                           cache_generation=True)
    assert not calls  # every row resumed from the checkpoint

    def same(a, b):
        assert a.keys() == b.keys()
        for k in a:
            x, y = a[k], b[k]
            assert x == y or (x != x and y != y), (k, x, y)  # NaN == NaN

    same(means2, means1)

    scores.unlink()
    means3 = test_evaluate(model, test_data=path, n_samples=2,
                           save_path=str(save), progress=False,
                           cache_generation=True)
    assert calls  # fresh scoring actually ran
    same(means3, means1)


def test_evaluate_step_lr_knob(model, tmp_path, monkeypatch):
    """step_lr reaches sample_batch and non-default values get their own
    generation-cache tag (a corrector-off cache must never be served to a
    reference-parity run)."""
    from chemeleon_tpu.eval import evaluate as ev
    from chemeleon_tpu.eval.evaluate import test_evaluate
    monkeypatch.setattr(ev.M, "test_valid", lambda lst: list(lst))
    seen = []
    orig = type(model).sample_batch

    def spy(self, *a, **kw):
        seen.append(kw.get("step_lr"))
        return orig(self, *a, **kw)

    monkeypatch.setattr(type(model), "sample_batch", spy)
    rng = np.random.default_rng(2)
    c = Crystal(lattice_from_parameters(4, 5, 6, 90, 90, 90),
                rng.uniform(size=(4, 3)), rng.integers(1, 20, 4))
    path = tmp_path / "test.csv"
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["material_id", "cif", "composition"])
        w.writeheader()
        w.writerow({"material_id": "mp-0", "cif": write_cif(c),
                    "composition": c.reduced_formula()})
    test_evaluate(model, test_data=path, n_samples=2, progress=False,
                  save_path=str(tmp_path / "res"), step_lr=0.0,
                  cache_generation=True)
    assert seen and all(lr == 0.0 for lr in seen)
    cached = list((tmp_path / "res" / "gen_cache").glob("*.npz"))
    assert cached and all("_lr0" in p.name for p in cached)


def test_sample_target_composition_prior_mode(model, tmp_path):
    from chemeleon_tpu.scripts.sample_target_composition import (
        sample_target_composition,
    )
    # a strong prior confines the element set, so with the lattice filter
    # bypassed by small cells the composition filter becomes reachable even
    # for random-init params; the pipeline must run end to end either way
    out = sample_target_composition("TiO2", n_samples=4, max_natoms=3,
                                    max_factor=1, save_dir=str(tmp_path),
                                    model=model, key=jax.random.PRNGKey(2),
                                    comp_prior_scale=50.0)
    assert isinstance(out, list)


def test_evaluate_comp_prior_scale(model, tmp_path, monkeypatch):
    """comp_prior_scale>0 drives composition_matching to 1.0 on a random-init
    model when the prior is strong (each row biased to its own composition
    with a single-element target => exact match guaranteed)."""
    from chemeleon_tpu.eval import evaluate as ev
    from chemeleon_tpu.eval.evaluate import test_evaluate
    monkeypatch.setattr(ev.M, "test_valid", lambda lst: list(lst))
    rng = np.random.default_rng(1)
    rows = []
    for i in range(2):
        n = int(rng.integers(3, 6))
        c = Crystal(lattice_from_parameters(4, 5, 6, 90, 90, 90),
                    rng.uniform(size=(n, 3)),
                    np.full(n, 14))  # pure Si rows: any count matches Si
        rows.append({"material_id": f"mp-{i}", "cif": write_cif(c),
                     "composition": c.reduced_formula()})
    path = tmp_path / "test.csv"
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["material_id", "cif", "composition"])
        w.writeheader()
        w.writerows(rows)
    means = test_evaluate(model, test_data=path, n_samples=2,
                          save_path=str(tmp_path / "res"), progress=False,
                          comp_prior_scale=50.0)
    assert means["mean_composition_matching"] == 1.0


def test_navigate_csp_and_prior_modes(model, tmp_path):
    from chemeleon_tpu.scripts.navigate_chemical_system import (
        navigate_chemical_system,
    )
    # tiny system, tiny budget: both alternate modes must run end to end
    out = navigate_chemical_system(["Na", "Cl"], max_stoich=1, n_samples=2,
                                   max_natoms=4, max_factor=1,
                                   save_dir=str(tmp_path / "csp"),
                                   model=model, key=jax.random.PRNGKey(0),
                                   csp=True)
    # CSP clamps types, so every kept structure is exactly NaCl (only the
    # >60 A lattice filter can drop samples)
    assert all(st.reduced_formula() == "ClNa" for st in out)
    out2 = navigate_chemical_system(["Na", "Cl"], max_stoich=1, n_samples=2,
                                    max_natoms=4, max_factor=1,
                                    save_dir=str(tmp_path / "prior"),
                                    model=model, key=jax.random.PRNGKey(0),
                                    comp_prior_scale=50.0)
    assert isinstance(out2, list)


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_server_streaming(model):
    from chemeleon_tpu.serve.client import predict, predict_stream
    from chemeleon_tpu.serve.server import ChemeleonServer

    port = _free_port()
    server = ChemeleonServer(model=model, host="127.0.0.1", port=port,
                             stream_chunk=5)
    server.run(background=True)
    try:
        url = f"http://127.0.0.1:{port}"
        # health
        import urllib.request
        with urllib.request.urlopen(url + "/health", timeout=30) as r:
            assert json.loads(r.read())["status"] == "ok"
        payloads = list(predict_stream(url, "TiO2", 4, 2, timeout=600))
        assert len(payloads) == 20 // 5
        assert payloads[-1]["step"] == 0
        crystals = predict(url, "TiO2", 4, 2, timeout=600)
        assert len(crystals) == 2 and len(crystals[0]) == 4
    finally:
        server.shutdown()


def test_server_dynamic_batching(model):
    """Concurrent /generate requests coalesce into fewer device calls than
    requests (TPU serving capacity comes from batching, not workers)."""
    from concurrent.futures import ThreadPoolExecutor
    from chemeleon_tpu.serve.client import generate
    from chemeleon_tpu.serve.server import ChemeleonServer

    port = _free_port()
    server = ChemeleonServer(model=model, host="127.0.0.1", port=port,
                             batch_window_s=1.0, max_batch=64)
    server.run(background=True)
    try:
        url = f"http://127.0.0.1:{port}"
        with ThreadPoolExecutor(max_workers=4) as ex:
            futs = [ex.submit(generate, url, f"T{i}O2", 4, 2, 600.0)
                    for i in range(4)]
            results = [f.result() for f in futs]
        assert all(len(r) == 2 for r in results)
        assert all(len(c) == 4 for r in results for c in r)
        # 4 concurrent requests inside one 1 s window -> fewer device calls
        assert server.batch_calls < 4, server.batch_calls
    finally:
        server.shutdown()


def test_server_batch_shape_ladder(model):
    """Coalesced /generate batches are padded to a power-of-two ladder so
    the compiled sampler shapes stay bounded (every distinct batch size is
    a fresh XLA compile that would stall the device lock in production)."""
    from concurrent.futures import ThreadPoolExecutor
    from chemeleon_tpu.serve.client import generate
    from chemeleon_tpu.serve.server import ChemeleonServer

    class SpyModel:
        def __init__(self, inner):
            self._inner = inner
            self.cfg = inner.cfg
            self.batch_sizes = []

        def sample_batch(self, natoms, texts, **kw):
            self.batch_sizes.append(len(natoms))
            return self._inner.sample_batch(natoms, texts, **kw)

    spy = SpyModel(model)
    port = _free_port()
    server = ChemeleonServer(model=spy, host="127.0.0.1", port=port,
                             batch_window_s=1.0, max_batch=64)
    assert [server._quantize_batch(t) for t in (1, 2, 3, 5, 33, 64)] == \
        [1, 2, 4, 8, 64, 64]
    server.run(background=True)
    try:
        url = f"http://127.0.0.1:{port}"
        with ThreadPoolExecutor(max_workers=3) as ex:
            futs = [ex.submit(generate, url, f"T{i}O2", 4, 2, 600.0)
                    for i in range(3)]
            results = [f.result() for f in futs]
        assert all(len(r) == 2 for r in results)
        # every device call used a ladder size, never an arbitrary total
        assert spy.batch_sizes and all(
            b in (1, 2, 4, 8, 16, 32, 64) for b in spy.batch_sizes), \
            spy.batch_sizes
    finally:
        server.shutdown()


def test_server_generate_comp_prior(model):
    """Per-request composition priors: guided and unguided requests coalesce
    into ONE device batch, and a strong prior confines that request's
    element set without touching the other request's rows."""
    from concurrent.futures import ThreadPoolExecutor
    from chemeleon_tpu.serve.client import generate
    from chemeleon_tpu.serve.server import ChemeleonServer

    port = _free_port()
    server = ChemeleonServer(model=model, host="127.0.0.1", port=port,
                             batch_window_s=1.0, max_batch=64)
    server.run(background=True)
    try:
        url = f"http://127.0.0.1:{port}"
        with ThreadPoolExecutor(max_workers=2) as ex:
            guided = ex.submit(generate, url, "NaCl", 4, 2, 600.0,
                               "NaCl", 50.0)
            free = ex.submit(generate, url, "XyzFree", 4, 2, 600.0)
            g, f = guided.result(), free.result()
        assert all(set(c.atom_types.tolist()) <= {11, 17} for c in g)
        assert len(f) == 2
        assert server.batch_calls == 1, server.batch_calls
    finally:
        server.shutdown()


def test_server_generate_lattice_system(model):
    """Per-request lattice-system clamp: a clamped and a free request
    coalesce into ONE device batch; the clamped request's cells satisfy
    the prompted system exactly, the free request's rows stay free."""
    from concurrent.futures import ThreadPoolExecutor
    from chemeleon_tpu.chem.lattice import lattice_system
    from chemeleon_tpu.serve.client import generate
    from chemeleon_tpu.serve.server import ChemeleonServer

    port = _free_port()
    server = ChemeleonServer(model=model, host="127.0.0.1", port=port,
                             batch_window_s=1.0, max_batch=64)
    server.run(background=True)
    try:
        url = f"http://127.0.0.1:{port}"
        with ThreadPoolExecutor(max_workers=2) as ex:
            clamped = ex.submit(generate, url, "TiO2", 4, 2, 600.0,
                                None, 1.0, "cubic")
            free = ex.submit(generate, url, "XyzFree", 4, 2, 600.0)
            c, f = clamped.result(), free.result()
        assert all(lattice_system(x.lattice) == "cubic" for x in c)
        assert len(f) == 2
        assert server.batch_calls == 1, server.batch_calls
    finally:
        server.shutdown()


def test_server_generate_fixed_comp_csp(model):
    """Server-side CSP (wire field fixed_comp — closes the streamlit
    CSP-over-server gap): a CSP and a free request coalesce into ONE
    device batch; the CSP request's samples carry exactly the requested
    composition (n_atoms derived from fixed_z formula units server-side),
    the free request's rows still type-diffuse."""
    from concurrent.futures import ThreadPoolExecutor
    from chemeleon_tpu.serve.client import generate
    from chemeleon_tpu.serve.server import ChemeleonServer

    port = _free_port()
    server = ChemeleonServer(model=model, host="127.0.0.1", port=port,
                             batch_window_s=1.0, max_batch=64)
    server.run(background=True)
    try:
        url = f"http://127.0.0.1:{port}"
        with ThreadPoolExecutor(max_workers=2) as ex:
            csp = ex.submit(generate, url, "TiO2", 4, 2, 600.0,
                            None, 1.0, None, "TiO2", 2)
            free = ex.submit(generate, url, "XyzFree", 6, 2, 600.0)
            c, f = csp.result(), free.result()
        for x in c:
            assert len(x) == 6  # 2 formula units of TiO2
            assert sorted(x.atom_types.tolist()) == [8, 8, 8, 8, 22, 22]
        assert len(f) == 2 and all(len(x) == 6 for x in f)
        assert server.batch_calls == 1, server.batch_calls
    finally:
        server.shutdown()


def test_server_rejects_bad_fixed_comp(model):
    """fixed_comp validation 400s at decode time: a conflicting explicit
    n_atoms, a fixed_z overflowing the pad buckets, and combining with
    comp_prior must all fail the request, not the coalesced batch."""
    import json
    from urllib.error import HTTPError
    from urllib.request import Request, urlopen
    from chemeleon_tpu.serve.server import ChemeleonServer

    port = _free_port()
    server = ChemeleonServer(model=model, host="127.0.0.1", port=port,
                             batch_window_s=0.05, max_batch=64)
    server.run(background=True)
    try:
        url = f"http://127.0.0.1:{port}/generate"

        def post(body):
            req = Request(url, data=json.dumps(body).encode(),
                          headers={"Content-Type": "application/json"})
            with urlopen(req, timeout=60) as r:
                return json.loads(r.read())

        for body in (
                {"fixed_comp": "TiO2", "n_atoms": 4, "n_samples": 1},
                {"fixed_comp": "TiO2", "fixed_z": 1000, "n_samples": 1},
                {"fixed_comp": "TiO2", "comp_prior": "TiO2",
                 "n_samples": 1}):
            with pytest.raises(HTTPError) as ei:
                post(body)
            assert ei.value.code == 400
    finally:
        server.shutdown()


def test_server_rejects_bad_lattice_system(model):
    """An unknown crystal-system word 400s at decode time instead of
    poisoning the coalesced device batch."""
    import urllib.error
    import urllib.request
    from chemeleon_tpu.serve.server import ChemeleonServer

    port = _free_port()
    server = ChemeleonServer(model=model, host="127.0.0.1", port=port)
    server.run(background=True)
    try:
        body = json.dumps({"text_input": "x", "n_atoms": 4, "n_samples": 1,
                           "lattice_system": "spherical"}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate", data=body,
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=60)
        assert ei.value.code == 400
    finally:
        server.shutdown()


def test_server_rejects_bad_comp_prior(model):
    """An unparseable comp_prior 400s at decode time instead of poisoning
    the coalesced device batch."""
    import urllib.error
    import urllib.request
    from chemeleon_tpu.serve.server import ChemeleonServer

    port = _free_port()
    server = ChemeleonServer(model=model, host="127.0.0.1", port=port)
    server.run(background=True)
    try:
        body = json.dumps({"text_input": "x", "n_atoms": 4, "n_samples": 1,
                           "comp_prior": "NotAFormula123!!"}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate", data=body,
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=60)
        assert e.value.code == 400
    finally:
        server.shutdown()


def test_visualizer(tmp_path, model):
    from chemeleon_tpu.visualize import Visualizer
    crystals = model.sample("TiO2", 4, 1, key=jax.random.PRNGKey(0))
    v = Visualizer()
    assert v.backend == "matplotlib"  # no plotly in this env
    v.view(crystals[0], save_path=str(tmp_path / "st.png"))
    assert (tmp_path / "st.png").stat().st_size > 1000


def test_fire_relax_reduces_overlap():
    from chemeleon_tpu.eval.optimize import SoftSphereCalculator, fire_relax
    lat = lattice_from_parameters(5, 5, 5, 90, 90, 90)
    st = Crystal(lat, [[0.5, 0.5, 0.5], [0.52, 0.5, 0.5]], [11, 17])
    calc = SoftSphereCalculator()
    e0, _ = calc(st)
    relaxed, info = fire_relax(st, calc, steps=100)
    e1, _ = calc(relaxed)
    assert e1 < e0
    assert relaxed.min_pair_distance() > st.min_pair_distance()


def test_pbc_offsets_cover_short_axes():
    """Cells with an axis shorter than the cutoff need images beyond +/-1
    (a 3 A axis with rcut=8 A has in-range neighbors 2 cells away); a fixed
    27-image search silently truncates the potential there."""
    from chemeleon_tpu.eval.optimize import (
        LennardJonesCalculator,
        _pbc_offsets,
    )
    lat = lattice_from_parameters(3.0, 12.0, 12.0, 90, 90, 90)
    offs = _pbc_offsets(lat, rcut=8.0)
    # 3 A axis: ceil(8/3)=3 repeats; 12 A axes: 1 repeat
    assert offs[:, 0].max() == 3 and offs[:, 1].max() == 1
    st = Crystal(lat, [[0.0, 0.0, 0.0]], [11])
    calc = LennardJonesCalculator(eps=0.2, rcut=8.0)
    e_full, _ = calc(st)
    # truncated-to-27-images energy misses the 6 A and 9 A image shells
    import chemeleon_tpu.eval.optimize as opt
    import numpy as _np
    full = _pbc_offsets(lat, 8.0)
    near = full[np.abs(full).max(axis=1) <= 1]
    e_near = 0.0
    radii = 1.66  # Na covalent radius (sigma for the 11-11 pair is 2r)
    for img in near @ lat:
        r = _np.linalg.norm(img)
        if 1e-8 < r < 8.0:
            x6 = (2 * radii / r) ** 6
            e_near += 0.5 * 4 * 0.2 * (x6 ** 2 - x6)
    assert abs(e_full - e_near) > 1e-4  # the far images matter...
    assert e_full < e_near  # ...and they are attractive (LJ tail)


def test_anisotropic_cell_relax_restores_cubic():
    """Full-cell relaxation (the FrechetCellFilter analog, reference
    optimize.py:100-108): a stretched AND sheared FCC LJ crystal must relax
    back to a cubic cell — lengths equalize and angles return to 90°, which
    isotropic volume scaling cannot do."""
    from chemeleon_tpu.eval.optimize import (
        LennardJonesCalculator,
        fire_relax,
        numerical_stress,
    )
    calc = LennardJonesCalculator(eps=0.2)
    FCC = [[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]]

    def fcc(a, gamma=90.0, stretch=1.0):
        lat = lattice_from_parameters(a * stretch, a, a, 90, 90, gamma)
        return Crystal(lat, FCC, [11] * 4)

    # find the equilibrium cubic lattice constant first (stress ~ 0)
    st0, info0 = fire_relax(fcc(4.2), calc, steps=300, relax_cell=True,
                            smax=5e-4)
    assert info0["converged"]
    a0 = st0.lattice_params[0]
    assert abs(st0.lattice_params[1] - a0) / a0 < 1e-3

    # stretch a by 8% and shear gamma to 82 deg; relax the full cell
    relaxed, info = fire_relax(fcc(a0, gamma=82.0, stretch=1.08), calc,
                               steps=800, relax_cell=True, smax=5e-4)
    assert info["converged"]
    a, b, c, al, be, ga = relaxed.lattice_params
    assert abs(ga - 90) < 0.5, f"shear not relaxed: gamma={ga}"
    assert abs(al - 90) < 0.5 and abs(be - 90) < 0.5
    assert abs(a - b) / b < 0.02 and abs(b - c) / c < 0.02, (a, b, c)
    # residual stress is below the convergence threshold
    s = numerical_stress(relaxed, calc)
    assert float(np.abs(s).max()) < 1e-3


def test_numerical_stress_sign():
    """A compressed LJ crystal is under compression: relaxing strain must
    EXPAND the cell (positive pressure -> negative required strain of -sigma
    direction grows volume)."""
    from chemeleon_tpu.eval.optimize import (
        LennardJonesCalculator,
        numerical_stress,
    )
    calc = LennardJonesCalculator(eps=0.2)
    lat = lattice_from_parameters(2.8, 2.8, 2.8, 90, 90, 90)
    st = Crystal(lat, [[0, 0, 0], [0.5, 0.5, 0.5]], [11, 11])
    s = numerical_stress(st, calc)
    # compression => dE/d(eps_aa) < 0 (expanding lowers energy)
    assert s[0, 0] < 0 and s[1, 1] < 0 and s[2, 2] < 0
    # applying the descent strain -gamma*sigma increases the volume
    gamma = 0.02 / float(np.abs(s).max())
    lat2 = lat @ (np.eye(3) - gamma * s)
    assert np.linalg.det(lat2) > np.linalg.det(lat)


def test_optimize_atoms_list_fail_log(tmp_path):
    from chemeleon_tpu.eval.optimize import optimize_atoms_list
    lat = lattice_from_parameters(5, 5, 5, 90, 90, 90)
    sts = [Crystal(lat, [[0.1, 0.1, 0.1], [0.3, 0.3, 0.3]], [11, 17])]
    out = optimize_atoms_list(sts, str(tmp_path), steps=20)
    assert len(out) == 1 and out[0] is not None
    assert (tmp_path / "opt_0.cif").exists()


def test_tpe_beats_random_on_synthetic_objective():
    """The in-repo TPE Bayesian optimizer (the wandb-bayes replacement,
    reference sweep.py:18-33) must find better optima than random search on
    a mixed categorical/continuous objective with the same trial budget."""
    import math
    from chemeleon_tpu.utils.bayesopt import TPEOptimizer

    space = {
        "opt": ["a", "b", "c"],
        "lr": ("log", 1e-4, 1e-1),
        "wd": (0.0, 1.0),
    }

    def objective(cfg):
        pen = {"a": 0.5, "b": 0.0, "c": 0.8}[cfg["opt"]]
        return (pen + (math.log10(cfg["lr"]) + 2.5) ** 2
                + (cfg["wd"] - 0.3) ** 2)

    def run(method_seed, n_startup, count=60):
        opt = TPEOptimizer(space, seed=method_seed, n_startup=n_startup)
        for _ in range(count):
            cfg = opt.suggest()
            opt.observe(cfg, objective(cfg))
        return opt.best[1]

    tpe = sorted(run(s, n_startup=10) for s in range(7))
    rand = sorted(run(s, n_startup=10 ** 9) for s in range(7))  # pure random
    # median comparison: TPE can lose an unlucky seed to the categorical
    # basin trap (a known TPE pathology), but must typically dominate
    assert tpe[3] < rand[3], (tpe, rand)
    # and the optimum is genuinely approached
    assert min(tpe) < 0.02


def test_tpe_respects_space():
    from chemeleon_tpu.utils.bayesopt import TPEOptimizer
    space = {"c": [1, 2, 4], "x": (0.0, 1.0), "lr": ("log", 1e-5, 1e-2)}
    opt = TPEOptimizer(space, seed=1, n_startup=5)
    for i in range(30):
        cfg = opt.suggest()
        assert cfg["c"] in (1, 2, 4)
        assert 0.0 <= cfg["x"] <= 1.0
        assert 1e-5 <= cfg["lr"] <= 1e-2
        opt.observe(cfg, float(i % 7))


def test_profiling_utilities(tmp_path, model):
    """jax.profiler trace context + phase timers produce artifacts."""
    from chemeleon_tpu.utils.profiling import Timer, profile_sampler

    t = Timer()
    with t("phase_a"):
        sum(range(1000))
    with t("phase_a"):
        sum(range(1000))
    rep = t.report()
    assert "phase_a" in rep

    out = profile_sampler(model, "TiO2", 4, 2,
                          trace_dir=str(tmp_path / "tr"))
    for phase in ("text_encode", "device_scan", "host_convert"):
        assert phase in out and out[phase] >= 0
    # the jax profiler trace directory was written
    assert (tmp_path / "tr").exists()


def test_server_rejects_oversized_and_bad_requests(model):
    """A single oversized /generate request must not bypass the max_batch
    device-memory cap (it is rejected 400 up front), and n_atoms beyond the
    largest padding bucket is likewise a client error, not an OOM."""
    import urllib.error
    import urllib.request
    from chemeleon_tpu.serve.server import ChemeleonServer

    port = _free_port()
    server = ChemeleonServer(model=model, host="127.0.0.1", port=port,
                             max_batch=8)
    server.run(background=True)
    try:
        url = f"http://127.0.0.1:{port}"

        def post(body):
            req = urllib.request.Request(
                url + "/generate", data=json.dumps(body).encode(),
                headers={"Content-Type": "application/json"})
            return urllib.request.urlopen(req, timeout=60)

        for bad in [{"n_samples": 100000, "n_atoms": 4},
                    {"n_samples": 0, "n_atoms": 4},
                    {"n_samples": 1, "n_atoms": 10 ** 6},
                    [],                       # non-object JSON body
                    "just a string"]:
            with pytest.raises(urllib.error.HTTPError) as ei:
                post(bad)
            assert ei.value.code == 400
        # an in-range request on the same server still succeeds
        with post({"n_samples": 1, "n_atoms": 4, "text_input": "TiO2"}) as r:
            assert r.status == 200
            assert len(json.loads(r.read())["atoms"]) == 1
    finally:
        server.shutdown()


def test_generate_prompts_template_and_empty(tmp_path):
    """Prompt generation (reference generate_text_prompt.py): template path
    fills a prompt column; a header-only CSV writes a valid empty output
    instead of crashing."""
    import csv as _csv
    from chemeleon_tpu.scripts.generate_text_prompt import generate_prompts

    src = tmp_path / "in.csv"
    with open(src, "w", newline="") as f:
        w = _csv.DictWriter(f, fieldnames=["composition", "crystal_system"])
        w.writeheader()
    assert generate_prompts(str(src), str(tmp_path / "out0.csv")) == 0
    assert (tmp_path / "out0.csv").read_text().startswith("composition")

    with open(src, "a", newline="") as f:
        _csv.DictWriter(f, fieldnames=["composition", "crystal_system"]) \
            .writerow({"composition": "TiO2", "crystal_system": "tetragonal"})
    assert generate_prompts(str(src), str(tmp_path / "out1.csv")) == 1
    row = list(_csv.DictReader(open(tmp_path / "out1.csv")))[0]
    assert "TiO2" in row["prompt"]


def test_stream_error_surfaces_to_client(model, monkeypatch):
    """A model failure mid-stream must reach the client as an error, not a
    silently truncated 200 NDJSON stream."""
    from chemeleon_tpu.serve.client import predict_stream
    from chemeleon_tpu.serve.server import ChemeleonServer

    server = ChemeleonServer(model=model, host="127.0.0.1",
                             port=_free_port(), stream_chunk=5)

    def boom(req):
        yield '{"atoms": []}'
        raise RuntimeError("device fell over")

    monkeypatch.setattr(server, "predict_stream", boom)
    server.run(background=True)
    try:
        url = f"http://127.0.0.1:{server.port}"
        with pytest.raises(RuntimeError, match="device fell over"):
            list(predict_stream(url, "TiO2", 4, 1, timeout=60))
    finally:
        server.shutdown()


def test_concurrent_streams_coalesce(model):
    """N concurrent /predict streams coalesce into ~1 chunked scan per
    window instead of N serialized scans (round-2 VERDICT item 6), and each
    client receives exactly its own samples at every step."""
    from concurrent.futures import ThreadPoolExecutor
    from chemeleon_tpu.serve.client import predict_stream
    from chemeleon_tpu.serve.server import ChemeleonServer

    port = _free_port()
    server = ChemeleonServer(model=model, host="127.0.0.1", port=port,
                             stream_chunk=5, batch_window_s=1.0)
    server.run(background=True)
    try:
        url = f"http://127.0.0.1:{port}"

        def one(i):
            return list(predict_stream(url, f"T{i}O2", 4, i + 1,
                                       timeout=600))

        with ThreadPoolExecutor(max_workers=4) as ex:
            results = [f.result() for f in
                       [ex.submit(one, i) for i in range(4)]]
        for i, payloads in enumerate(results):
            assert len(payloads) == 20 // 5
            assert payloads[-1]["step"] == 0
            # demultiplexing: client i asked for i+1 samples of 4 atoms
            for p in payloads:
                assert len(p["atoms"]) == i + 1
                assert all(len(a["atom_types"]) == 4 for a in p["atoms"])
        # the 4 same-window streams shared device scans
        assert server.stream_batch_calls < 4, server.stream_batch_calls
    finally:
        server.shutdown()


def test_sampling_session_viewmodel(model):
    """The Dash app's dash-free view-model (app/utils.SamplingSession):
    background streaming job, poll() snapshots, per-sample/step selection,
    CIF export, double-start guard (reference dash_app.py feature set)."""
    import sys
    import time as _time
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from app.utils import SamplingSession, crystal_to_png_b64

    s = SamplingSession()
    assert s.poll() == {"n_steps": 0, "done": False, "error": None,
                        "progress": 0.0, "total_chunks": 0}
    assert s.crystal(0) is None
    assert s.start(model, "TiO2", 4, 2)
    deadline = _time.time() + 300
    while not s.poll()["done"] and _time.time() < deadline:
        _time.sleep(0.1)
    state = s.poll()
    assert state["done"] and state["error"] is None
    assert state["n_steps"] == 20 // 5 or state["n_steps"] == 20
    assert state["progress"] == 1.0  # done pins the bar to 100%
    c = s.crystal(1, -1)
    assert c is not None and len(c) == 4
    assert s.crystal(5, -1) is None  # out-of-range sample
    cif = s.cif(0)
    assert "_cell_length_a" in cif
    png = crystal_to_png_b64(c)
    assert png.startswith("data:image/png;base64,") and len(png) > 1000
    # a finished session can be restarted
    assert s.start(model, "SiO2", 4, 1)
    while not s.poll()["done"] and _time.time() < deadline:
        _time.sleep(0.1)
    assert s.poll()["done"]


def test_sampling_session_error_surfaces():
    from pathlib import Path
    import sys
    import time as _time
    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from app.utils import SamplingSession

    class Boom:
        class cfg:
            timesteps = 20

        def sample(self, *a, **kw):
            raise RuntimeError("model fell over")

    s = SamplingSession()
    assert s.start(Boom(), "x", 4, 1)
    deadline = _time.time() + 30
    while not s.poll()["done"] and _time.time() < deadline:
        _time.sleep(0.05)
    assert "model fell over" in s.poll()["error"]


def test_player_tick_replay_logic():
    """Play/Pause trajectory replay (app/utils.player_tick — the dash-free
    frame clock behind the Dash app's Play button; the reference gets the
    equivalent from plotly animate buttons, visualize.py:154-208)."""
    from pathlib import Path
    import sys
    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from app.utils import player_tick

    # no frames yet: parked at 0, not playing
    assert player_tick(None, 0, True, True) == (0, False)
    # live streaming follows the newest frame...
    assert player_tick(None, 5, False, True) == (4, False)
    assert player_tick(4, 6, False, True) == (5, False)
    # ...unless the user scrubbed backwards
    assert player_tick(1, 6, False, True) == (1, False)
    # paused replay holds position (and clamps to the recorded range)
    assert player_tick(3, 10, False, False) == (3, False)
    assert player_tick(99, 10, False, False) == (9, False)
    # playing advances one frame per tick and auto-pauses at the end
    assert player_tick(0, 4, True, False) == (1, True)
    assert player_tick(1, 4, True, False) == (2, True)
    assert player_tick(2, 4, True, False) == (3, False)
    # restarting play from the end stays parked (caller resets to 0 via
    # the slider); from None it starts at frame 0
    assert player_tick(None, 4, True, False) == (0, True)


def test_dash_app_import_guarded():
    """Without dash installed, importing the app module exits with a clear
    message instead of a bare ImportError traceback."""
    import importlib.util
    if importlib.util.find_spec("dash") is not None:
        pytest.skip("dash installed; guard not reachable")
    from pathlib import Path
    import subprocess
    import sys
    r = subprocess.run(
        [sys.executable, "-c", "import app.dash_app"],
        cwd=str(Path(__file__).resolve().parents[1]),
        capture_output=True, text=True)
    assert r.returncode != 0
    assert "dash is not installed" in (r.stderr + r.stdout)


def test_packed_generate_sub_batches_under_memory_cap(model, tmp_path,
                                                      monkeypatch):
    """With a tiny edge-memory budget the packed generator must split each
    chunk into several sampler calls (the full-protocol run crashed the TPU
    worker at B=160/N=36 before this cap existed) while preserving the
    row -> samples mapping: in CSP mode every sample of a row must still
    carry that row's own composition."""
    from chemeleon_tpu.eval import evaluate as ev
    from chemeleon_tpu.eval.evaluate import test_evaluate
    monkeypatch.setenv("CHEMTPU_GEN_EDGE_MB", "0.004")  # forces ~1 row/call
    assert ev._max_gen_batch(8, model.cfg.hidden_dim) <= 4
    monkeypatch.setattr(ev.M, "test_valid", lambda lst: list(lst))
    calls = []
    orig = model.sample_batch
    monkeypatch.setattr(
        model, "sample_batch",
        lambda natoms, *a, **k: calls.append(len(natoms)) or
        orig(natoms, *a, **k))
    rng = np.random.default_rng(3)
    rows = []
    for i in range(3):
        n = int(rng.integers(3, 6))
        c = Crystal(lattice_from_parameters(4, 5, 6, 90, 90, 90),
                    rng.uniform(size=(n, 3)),
                    rng.integers(1 + i * 5, 6 + i * 5, n))
        rows.append({"material_id": f"mp-{i}", "cif": write_cif(c),
                     "composition": c.reduced_formula()})
    path = tmp_path / "test.csv"
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["material_id", "cif", "composition"])
        w.writeheader()
        w.writerows(rows)
    means = test_evaluate(model, test_data=path, n_samples=4,
                          save_path=str(tmp_path / "res"), progress=False,
                          csp=True)
    assert len(calls) > 1, "memory cap did not split the packed chunk"
    # the floor is one row per call: n_samples structures
    assert max(calls) == 4
    # mapping intact: CSP clamping keeps every row's own composition
    assert means["mean_composition_matching"] == 1.0


def test_evaluate_csp_and_cache(model, tmp_path, monkeypatch):
    """CSP protocol: generated samples carry each row's exact composition;
    cache_generation: a second run reuses the persisted chunks (no sampler
    calls) and reproduces the same metrics."""
    from chemeleon_tpu.eval import evaluate as ev
    from chemeleon_tpu.eval.evaluate import test_evaluate
    monkeypatch.setattr(ev.M, "test_valid", lambda lst: list(lst))
    rng = np.random.default_rng(1)
    rows = []
    for i in range(2):
        n = int(rng.integers(3, 6))
        c = Crystal(lattice_from_parameters(4, 5, 6, 90, 90, 90),
                    rng.uniform(size=(n, 3)), rng.integers(1, 20, n))
        rows.append({"material_id": f"mp-{i}", "cif": write_cif(c),
                     "composition": c.reduced_formula()})
    path = tmp_path / "test.csv"
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["material_id", "cif", "composition"])
        w.writeheader()
        w.writerows(rows)

    means = test_evaluate(model, test_data=path, n_samples=3,
                          save_path=str(tmp_path / "res"), progress=False,
                          csp=True, cache_generation=True)
    # CSP clamps types to the reference composition -> exact match always
    assert means["mean_composition_matching"] == 1.0
    cache = list((tmp_path / "res" / "gen_cache").glob("*.npz"))
    assert cache, "generation chunks were not persisted"

    # second run must not sample at all: poison the sampler
    monkeypatch.setattr(model, "sample_batch",
                        lambda *a, **k: (_ for _ in ()).throw(
                            AssertionError("sampler called despite cache")))
    means2 = test_evaluate(model, test_data=path, n_samples=3,
                           save_path=str(tmp_path / "res"), progress=False,
                           csp=True, cache_generation=True)
    assert means2["mean_composition_matching"] == 1.0
    assert means2["mean_valid_samples"] == means["mean_valid_samples"]


def test_server_stream_honors_fixed_comp_and_clamp(model):
    """/predict (streaming) must honor the same per-request conditioning as
    /generate: fixed_comp's CSP clamp is absolute ('exact composition by
    construction'), so silently dropping it on the streaming path returned
    free-diffused types under a CSP contract. A CSP stream and a free
    stream coalesce into one window; the CSP client's final payload carries
    exactly the requested composition."""
    from concurrent.futures import ThreadPoolExecutor
    from chemeleon_tpu.chem.structure import Crystal
    from chemeleon_tpu.serve.client import predict_stream
    from chemeleon_tpu.serve.server import ChemeleonServer

    port = _free_port()
    server = ChemeleonServer(model=model, host="127.0.0.1", port=port,
                             stream_chunk=5, batch_window_s=1.0)
    server.run(background=True)
    try:
        url = f"http://127.0.0.1:{port}"
        with ThreadPoolExecutor(max_workers=2) as ex:
            csp = ex.submit(lambda: list(predict_stream(
                url, "TiO2", 0, 2, 600.0, fixed_comp="TiO2", fixed_z=2)))
            free = ex.submit(lambda: list(predict_stream(
                url, "XyzFree", 6, 2, 600.0)))
            cs, fs = csp.result(), free.result()
        assert cs[-1]["step"] == 0 and fs[-1]["step"] == 0
        for d in cs[-1]["atoms"]:
            c = Crystal.from_dict(d)
            assert sorted(c.atom_types.tolist()) == [8, 8, 8, 8, 22, 22]
        assert len(fs[-1]["atoms"]) == 2
        # both streams coalesced into one scan window
        assert server.stream_batch_calls == 1, server.stream_batch_calls
    finally:
        server.shutdown()


def test_streamlit_viewmodel_local_sampling():
    """The streamlit app's generation plumbing (app/utils view-model,
    round-5 VERDICT item 7): CSP Z-fill reduction, prior kwargs, lattice
    clamp, and the chunk rule — headless, no streamlit required."""
    from pathlib import Path
    import sys
    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from app.utils import (COMP_MODE_CSP, COMP_MODE_OFF, COMP_MODE_PRIOR,
                           build_local_sampling, csp_fill_types, csp_fill_z,
                           pick_stream_chunk)

    # chunk rule: every 100 when it divides the schedule, else every step
    assert pick_stream_chunk(1000) == 100
    assert pick_stream_chunk(20) == 1
    assert pick_stream_chunk(20, snapshot_every=5) == 5

    # CSP fill: TiO2 reduces to a 3-atom unit; a 10-atom box fits Z=3
    types, n = csp_fill_types("TiO2", 10)
    assert n == 9 and len(types) == 9
    assert sorted(set(types)) == [8, 22] and types.count(8) == 6
    # fractional formulas integer-reduce instead of rounding elements away
    types, n = csp_fill_types("Li0.5CoO2", 4)
    assert 3 in types and 27 in types and 8 in types
    # box smaller than one unit still yields one unit
    types, n = csp_fill_types("TiO2", 2)
    assert n == 3
    # the remote wire's Z matches the local tiling
    assert csp_fill_z("TiO2", 10) == 3
    assert csp_fill_z("TiO2", 2) == 1

    # kwargs dispatch
    kw, n = build_local_sampling("TiO2", COMP_MODE_CSP, 2.0, 2, None, 10)
    assert n == 9 and len(kw["fixed_types"]) == 2
    assert all(len(t) == 9 for t in kw["fixed_types"])
    kw, n = build_local_sampling("TiO2", COMP_MODE_PRIOR, 3.5, 2, "cubic", 10)
    assert n == 10 and kw["comp_prior"] == ["TiO2", "TiO2"]
    assert kw["comp_prior_scale"] == 3.5 and kw["lattice_system"] == "cubic"
    kw, n = build_local_sampling(None, COMP_MODE_OFF, 1.0, 2, None, 10)
    assert kw == {} and n == 10
    # empty comp means unconditioned regardless of the mode radio
    kw, n = build_local_sampling("", COMP_MODE_CSP, 1.0, 2, None, 10)
    assert kw == {} and n == 10


def test_streamlit_viewmodel_routing_and_progress():
    from pathlib import Path
    import sys
    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from app.utils import (COMP_MODE_CSP, COMP_MODE_OFF, remote_progress,
                           route_generation)

    # conditioned remote requests must use /generate (the /predict stream
    # wire has no conditioning fields)
    url = "http://h:8000"
    assert route_generation(url, "TiO2", COMP_MODE_CSP, None) \
        == "server_generate"
    assert route_generation(url, None, COMP_MODE_OFF, "cubic") \
        == "server_generate"
    assert route_generation(url, None, COMP_MODE_OFF, None) \
        == "server_stream"
    assert route_generation("", "TiO2", COMP_MODE_CSP, "cubic") == "local"

    # progress: first payload's remaining-step count becomes the total
    frac, total = remote_progress(900, None)
    assert total == 900 and frac == 0.0
    frac, total = remote_progress(450, total)
    assert frac == pytest.approx(0.5) and total == 900
    frac, total = remote_progress(0, total)
    assert frac == 1.0
    # degenerate single-step stream never divides by zero
    frac, total = remote_progress(0, None)
    assert total == 1 and frac == 1.0


def test_streamlit_csp_round_trip_matches_sample_csp(model):
    """The view-model's CSP clamp drives the same sampler mode as
    Chemeleon.sample_csp: same composition + Z through either path yields
    the same per-sample composition guarantee."""
    from pathlib import Path
    import sys
    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    import jax

    from app.utils import COMP_MODE_CSP, build_local_sampling

    kw, n_atoms = build_local_sampling("TiO2", COMP_MODE_CSP, 1.0, 2, None, 6)
    crystals = model.sample_batch([n_atoms] * 2,
                                  ["TiO2"] * 2 if model.cfg.text_guide
                                  else None,
                                  key=jax.random.PRNGKey(4), **kw)
    for c in crystals:
        assert c.reduced_formula() == "O2Ti"


def test_evaluate_cache_only_skips_missing(model, tmp_path, monkeypatch):
    """cache_only scoring (recompute_protocol's default) must never sample:
    missing chunks are skipped, and once the cache exists the same call
    scores normally."""
    from chemeleon_tpu.eval import evaluate as ev
    from chemeleon_tpu.eval.evaluate import test_evaluate
    monkeypatch.setattr(ev.M, "test_valid", lambda lst: list(lst))
    rng = np.random.default_rng(4)
    c = Crystal(lattice_from_parameters(4, 5, 6, 90, 90, 90),
                rng.uniform(size=(4, 3)), rng.integers(1, 20, 4))
    path = tmp_path / "test.csv"
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["material_id", "cif", "composition"])
        w.writeheader()
        w.writerow({"material_id": "mp-0", "cif": write_cif(c),
                    "composition": c.reduced_formula()})
    save = tmp_path / "res"

    def boom(self, *a, **kw):
        raise AssertionError("cache_only run must not sample")

    with pytest.MonkeyPatch.context() as mp:
        mp.setattr(type(model), "sample_batch", boom)
        means = test_evaluate(model, test_data=path, n_samples=2,
                              progress=False, save_path=str(save),
                              cache_generation=True, cache_only=True)
    assert means == {}  # nothing scored, nothing sampled

    test_evaluate(model, test_data=path, n_samples=2, progress=False,
                  save_path=str(save), cache_generation=True)
    with pytest.MonkeyPatch.context() as mp:
        mp.setattr(type(model), "sample_batch", boom)
        means = test_evaluate(model, test_data=path, n_samples=2,
                              progress=False, save_path=str(save),
                              cache_generation=True, cache_only=True)
    assert means["n_valid_samples"] == 1  # scored purely from the cache
