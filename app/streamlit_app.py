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


def generate_local(text, n_atoms, n_samples, progress):
    model = load_model()
    total = model.cfg.timesteps
    chunk = SNAPSHOT_EVERY if total % SNAPSHOT_EVERY == 0 else 1
    snapshots = []
    done = 0
    for crystals in model.sample(text, n_atoms, n_samples, stream=True,
                                 stream_chunk=chunk):
        done += chunk
        progress.progress(done / total)
        snapshots.append(crystals)
    return snapshots


def generate_remote(text, n_atoms, n_samples, progress):
    from chemeleon_tpu.serve.client import predict_stream
    # total timesteps are the server's cfg, unknown here; the first payload's
    # step is the remaining count, so use it as the denominator and clamp
    total = None
    snapshots = []
    for payload in predict_stream(SERVER_URL, text, n_atoms, n_samples):
        step = payload.get("step", 0)
        if total is None:
            total = max(step, 1)
        snapshots.append([Crystal.from_dict(d) for d in payload["atoms"]])
        progress.progress(min(max(1.0 - step / total, 0.0), 1.0))
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
        run = st.button("Generate")

    if not run:
        st.info("Set a prompt and press Generate.")
        return

    progress = st.progress(0.0)
    with st.spinner("Sampling..."):
        if SERVER_URL:
            snapshots = generate_remote(text, n_atoms, n_samples, progress)
        else:
            snapshots = generate_local(text, n_atoms, n_samples, progress)
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
