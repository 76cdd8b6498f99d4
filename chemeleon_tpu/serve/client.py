"""Streaming HTTP client (reference: app/server_client.py:6-50, client.py)."""

from __future__ import annotations

import json
from typing import Iterator, List, Optional
from urllib.request import Request, urlopen

from chemeleon_tpu.chem.structure import Crystal


def predict_stream(url: str, text_input: str, n_atoms: int, n_samples: int,
                   timeout: float = 600.0, comp_prior: str = None,
                   comp_prior_scale: float = 1.0,
                   lattice_system: str = None, fixed_comp: str = None,
                   fixed_z: int = 1) -> Iterator[dict]:
    """POST /predict and yield decoded JSON lines as they stream.
    Conditioning kwargs as in ``generate`` — the streaming path honors the
    same per-request clamps/priors (mixed rows coalesce into one scan)."""
    payload = {"text_input": text_input, "n_atoms": n_atoms,
               "n_samples": n_samples}
    if comp_prior:
        payload["comp_prior"] = comp_prior
        payload["comp_prior_scale"] = comp_prior_scale
    if lattice_system:
        payload["lattice_system"] = lattice_system
    if fixed_comp:
        payload["fixed_comp"] = fixed_comp
        payload["fixed_z"] = fixed_z
        payload.pop("n_atoms", None)  # derived server-side from the formula
    body = json.dumps(payload).encode()
    req = Request(url.rstrip("/") + "/predict", data=body,
                  headers={"Content-Type": "application/json"})
    with urlopen(req, timeout=timeout) as r:
        buf = b""
        while True:
            chunk = r.read(65536)
            if not chunk:
                break
            buf += chunk
            while b"\n" in buf:
                line, buf = buf.split(b"\n", 1)
                if line.strip():
                    payload = json.loads(line)
                    if "error" in payload:  # in-band mid-stream failure
                        raise RuntimeError(
                            f"server error: {payload['error']}")
                    yield payload


def predict(url: str, text_input: str, n_atoms: int, n_samples: int,
            timeout: float = 600.0) -> List[Crystal]:
    """Blocking call: return the final structures."""
    last = None
    for payload in predict_stream(url, text_input, n_atoms, n_samples,
                                  timeout):
        last = payload
    if last is None:
        return []
    return [Crystal.from_dict(d) for d in last["atoms"]]


def generate(url: str, text_input: str, n_atoms: int, n_samples: int,
             timeout: float = 600.0, comp_prior: str = None,
             comp_prior_scale: float = 1.0,
             lattice_system: str = None, fixed_comp: str = None,
             fixed_z: int = 1) -> List[Crystal]:
    """POST /generate (non-streaming; server-side dynamic batching).
    ``comp_prior`` requests composition-prior guided sampling for this
    request only (requests with different priors/scales still coalesce).
    ``lattice_system`` clamps this request's cells to that crystal
    system's metric constraints (per-row ids: clamped and free requests
    coalesce into the same device batch). ``fixed_comp`` (+ ``fixed_z``
    formula units) requests server-side CSP — atom types clamped to the
    composition, n_atoms derived server-side; CSP and free requests
    coalesce into one device batch (mixed-row sampler support,
    models/chemeleon.py sampler_step)."""
    payload = {"text_input": text_input, "n_atoms": n_atoms,
               "n_samples": n_samples}
    if comp_prior:
        payload["comp_prior"] = comp_prior
        payload["comp_prior_scale"] = comp_prior_scale
    if lattice_system:
        payload["lattice_system"] = lattice_system
    if fixed_comp:
        payload["fixed_comp"] = fixed_comp
        payload["fixed_z"] = fixed_z
        payload.pop("n_atoms", None)  # derived server-side from the formula
    body = json.dumps(payload).encode()
    req = Request(url.rstrip("/") + "/generate", data=body,
                  headers={"Content-Type": "application/json"})
    with urlopen(req, timeout=timeout) as r:
        payload = json.loads(r.read())
    return [Crystal.from_dict(d) for d in payload["atoms"]]


if __name__ == "__main__":
    import sys
    url = sys.argv[1] if len(sys.argv) > 1 else "http://127.0.0.1:8000"
    for payload in predict_stream(url, "A Crystal Structure of LiMnO4", 6, 2):
        print("step", payload.get("step"), "natoms",
              [len(a["atom_types"]) for a in payload["atoms"]])
