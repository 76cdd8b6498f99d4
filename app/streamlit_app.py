"""Streamlit demo app (reference: app/streamlit_app.py:109-292).

Sidebar prompt / n_atoms<=20 / n_samples<=5; local-model or remote-server
generation; progress across the diffusion steps with trajectory snapshots;
tabs for the final structure, the trajectory animation, and CIF download.

Run: ``streamlit run app/streamlit_app.py`` (requires streamlit, not bundled
in the TPU image — the core framework has no dependency on it).
"""

from __future__ import annotations

import os

try:
    import streamlit as st
except ImportError as e:  # pragma: no cover
    raise SystemExit(
        "streamlit is not installed. `pip install streamlit` to run the demo "
        "app; the chemeleon_tpu core does not require it.") from e

import numpy as np

from chemeleon_tpu.chem.structure import Crystal
from chemeleon_tpu.visualize import Visualizer

SERVER_URL = os.environ.get("CHEMELEON_SERVER_URL", "")
SNAPSHOT_EVERY = 100


@st.cache_resource
def load_model():
    from chemeleon_tpu.models.chemeleon import Chemeleon
    return Chemeleon.load_general_text_model()


def generate_local(text, n_atoms, n_samples, progress,
                   comp=None, comp_mode="off", comp_scale=1.0,
                   lattice_sys=None):
    from app.utils import build_local_sampling, pick_stream_chunk

    model = load_model()
    total = model.cfg.timesteps
    chunk = pick_stream_chunk(total, SNAPSHOT_EVERY)
    kw, n_atoms = build_local_sampling(comp, comp_mode, comp_scale,
                                       n_samples, lattice_sys, n_atoms)
    snapshots = []
    done = 0
    for crystals in model.sample_batch_stream(
            [n_atoms] * n_samples,
            [text] * n_samples if model.cfg.text_guide else None,
            stream_chunk=chunk, **kw):
        done += chunk
        progress.progress(done / total)
        snapshots.append(crystals)
    return snapshots


def generate_remote(text, n_atoms, n_samples, progress):
    from app.utils import remote_progress
    from chemeleon_tpu.serve.client import predict_stream
    # total timesteps are the server's cfg, unknown here; the first payload's
    # step is the remaining count, so use it as the denominator and clamp
    total = None
    snapshots = []
    for payload in predict_stream(SERVER_URL, text, n_atoms, n_samples):
        frac, total = remote_progress(payload.get("step", 0), total)
        snapshots.append([Crystal.from_dict(d) for d in payload["atoms"]])
        progress.progress(frac)
    return snapshots


def main():
    st.set_page_config(page_title="Chemeleon-TPU", layout="wide")
    st.title("Chemeleon-TPU: text-guided crystal generation")

    with st.sidebar:
        text = st.text_area("Prompt",
                            "A Crystal Structure of LiMnO4 with "
                            "orthorhombic symmetry")
        n_atoms = st.slider("Number of atoms", 1, 20, 6)
        n_samples = st.slider("Number of samples", 1, 5, 3)
        comp = st.text_input("Target composition (optional)", "")
        comp_mode = st.radio("Composition mode",
                             ["off", "prior (bias types)",
                              "CSP (clamp types)"]) if comp else "off"
        comp_scale = (st.slider("Prior strength", 0.5, 8.0, 2.0, 0.5)
                      if comp and comp_mode == "prior (bias types)" else 1.0)
        lattice_sys = st.selectbox(
            "Lattice system clamp",
            ["off", "triclinic", "monoclinic", "orthorhombic", "tetragonal",
             "trigonal", "hexagonal", "cubic"])
        lattice_sys = None if lattice_sys == "off" else lattice_sys
        run = st.button("Generate")

    if not run:
        st.info("Set a prompt and press Generate.")
        return

    from app.utils import (COMP_MODE_CSP, COMP_MODE_PRIOR, csp_fill_z,
                           route_generation)

    progress = st.progress(0.0)
    route = route_generation(SERVER_URL, comp, comp_mode, lattice_sys)
    with st.spinner("Sampling..."):
        if route == "server_generate":
            # /generate carries per-request priors, lattice clamps, AND the
            # CSP composition clamp (wire field fixed_comp — round-4
            # mixed-row sampler; non-streaming: one final snapshot)
            from chemeleon_tpu.serve.client import generate
            prior = comp if comp and comp_mode == COMP_MODE_PRIOR else None
            csp = comp if comp and comp_mode == COMP_MODE_CSP else None
            # same Z rule as the local path: fill up to the n_atoms box
            fixed_z = csp_fill_z(csp, n_atoms) if csp else 1
            snapshots = [generate(SERVER_URL, text, n_atoms, n_samples,
                                  comp_prior=prior,
                                  comp_prior_scale=comp_scale,
                                  lattice_system=lattice_sys,
                                  fixed_comp=csp, fixed_z=fixed_z)]
            progress.progress(1.0)
        elif route == "server_stream":
            snapshots = generate_remote(text, n_atoms, n_samples, progress)
        else:
            snapshots = generate_local(text, n_atoms, n_samples, progress,
                                       comp=comp or None,
                                       comp_mode=comp_mode,
                                       comp_scale=comp_scale,
                                       lattice_sys=lattice_sys)
    if not snapshots:
        st.error("Generation failed: the server returned no structures.")
        return
    final = snapshots[-1]

    tabs = st.tabs([f"Sample {i}" for i in range(len(final))])
    viz = Visualizer()
    for i, tab in enumerate(tabs):
        with tab:
            st.text(repr(final[i]))
            sub1, sub2 = st.tabs(["Structure", "Trajectory"])
            with sub1:
                fig = viz.view(final[i])
                if viz.backend == "plotly":
                    st.plotly_chart(fig)
                else:
                    st.pyplot(fig)
            with sub2:
                traj_fig = viz.view_trajectory(
                    [[s[i]] for s in snapshots], index=0, stride=1)
                if viz.backend == "plotly":
                    st.plotly_chart(traj_fig)
                else:
                    st.pyplot(traj_fig)
            st.download_button("Download CIF", final[i].to_cif(),
                               file_name=f"gen_{i}.cif")


if __name__ == "__main__":
    main()
