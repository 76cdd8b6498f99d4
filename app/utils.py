"""App-side JSON codecs (reference: app/utils.py:22-44)."""

from __future__ import annotations

from typing import Dict, List

from chemeleon_tpu.chem.structure import Crystal


def atoms_to_dict(crystal: Crystal) -> Dict:
    return crystal.to_dict()


def dict_to_atoms(d: Dict) -> Crystal:
    return Crystal.from_dict(d)


def empty_fig():
    """Placeholder figure (reference app/utils.py:5-19)."""
    from chemeleon_tpu.visualize import _have_plotly
    if _have_plotly():
        import plotly.graph_objects as go
        fig = go.Figure()
        fig.update_layout(xaxis={"visible": False}, yaxis={"visible": False},
                          annotations=[dict(text="No structure yet",
                                            showarrow=False)])
        return fig
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots()
    ax.axis("off")
    ax.text(0.5, 0.5, "No structure yet", ha="center")
    return fig


def crystal_to_png_b64(crystal: Crystal) -> str:
    """Render one structure to a base64 PNG data URI via the matplotlib
    backend (works in images without plotly; the Dash app embeds it in an
    html.Img — the TPU-image analog of the reference's dcc.Graph structure
    figure, dash_app.py:266-268, :512-525)."""
    import base64
    import io

    from chemeleon_tpu.visualize import Visualizer

    fig = Visualizer(backend="matplotlib").view(crystal)
    buf = io.BytesIO()
    fig.savefig(buf, format="png", dpi=110, bbox_inches="tight")
    return "data:image/png;base64," + base64.b64encode(
        buf.getvalue()).decode()


class SamplingSession:
    """Dash-free view-model for the demo apps: runs one streaming sampling
    job in a background thread and exposes a poll()-able snapshot state.
    Keeping this out of dash_app.py makes the app logic testable in images
    where dash itself is absent (the UI layer is a thin wrapper)."""

    def __init__(self):
        import threading
        self._lock = threading.Lock()
        self._thread = None
        self.reset()

    def reset(self):
        with self._lock:
            self.steps = []      # [(t, [crystal dicts])] newest last
            self.done = False
            self.error = None
            self.total_chunks = 0  # expected stream length (set by worker)

    @property
    def running(self):
        return self._thread is not None and self._thread.is_alive()

    def start(self, model, text: str, n_atoms: int, n_samples: int) -> bool:
        """Spawn the worker; returns False if a job is already running
        (double-click guard)."""
        import threading
        with self._lock:
            if self._thread is not None and self._thread.is_alive():
                return False
            self._thread = threading.Thread(
                target=self._worker, args=(model, text, n_atoms, n_samples),
                daemon=True)
        self.reset()
        self._thread.start()
        return True

    def _worker(self, model, text, n_atoms, n_samples):
        try:
            total = model.cfg.timesteps
            chunk = 100 if total % 100 == 0 else 1
            with self._lock:
                self.total_chunks = total // chunk
            t = total
            for crystals in model.sample(text, n_atoms, n_samples,
                                         stream=True, stream_chunk=chunk):
                t -= chunk
                with self._lock:
                    self.steps.append((t, [c.to_dict() for c in crystals]))
        except Exception as e:
            with self._lock:
                self.error = str(e)
        finally:
            with self._lock:
                self.done = True

    def poll(self) -> Dict:
        """Snapshot: {n_steps, done, error, progress in [0,1]} — progress
        mirrors the reference's queue messages carrying
        ``int(step / timesteps * 100)`` (dash_app.py:344-354)."""
        with self._lock:
            n = len(self.steps)
            if self.done:
                prog = 1.0
            elif self.total_chunks:
                prog = min(1.0, n / self.total_chunks)
            else:
                prog = 0.0
            return {"n_steps": n, "done": self.done, "error": self.error,
                    "progress": prog, "total_chunks": self.total_chunks}

    def crystal(self, sample_idx: int, step_idx: int = -1):
        """Selected sample at a recorded step (-1 = latest); None before the
        first chunk lands."""
        with self._lock:
            if not self.steps:
                return None
            _, dicts = self.steps[step_idx]
        if not 0 <= sample_idx < len(dicts):
            return None
        return dict_to_atoms(dicts[sample_idx])

    def cif(self, sample_idx: int) -> str:
        c = self.crystal(sample_idx, -1)
        if c is None:
            raise RuntimeError("no structures generated yet")
        return c.to_cif()


def player_tick(step_idx, n_steps: int, playing: bool,
                live: bool) -> "tuple[int, bool]":
    """Advance the trajectory player by one UI tick (dash-free so the
    Play/Pause replay logic is testable headless; the reference's replay is
    plotly's built-in animate buttons, visualize.py:154-208 — a static Dash
    Img needs an explicit frame clock).

    ``step_idx``: current slider position (None before any frame).
    ``n_steps``: frames recorded so far. ``playing``: Play toggled on.
    ``live``: sampling still streaming — follow the newest frame.
    Returns (next_idx, still_playing): playback advances one frame per tick
    and auto-pauses at the final frame; live mode pins to the tail.
    """
    if n_steps <= 0:
        return 0, False
    last = n_steps - 1
    if live:
        # follow the stream unless the user scrubbed backwards
        if step_idx is None or step_idx >= last - 1:
            return last, playing
        return min(int(step_idx), last), playing
    if not playing:
        return min(int(step_idx or 0), last), False
    nxt = 0 if step_idx is None else int(step_idx) + 1
    if nxt >= last:
        return last, False  # reached the end: auto-pause
    return nxt, True


# -- streamlit app view-model -------------------------------------------------
# Pure logic extracted from streamlit_app.py (reference
# app/streamlit_app.py:109-292) so the app's generation plumbing is testable
# headless (round-5: the dash app had view-model tests, the streamlit one
# did not). The UI layer is a thin wrapper over these.

COMP_MODE_OFF = "off"
COMP_MODE_PRIOR = "prior (bias types)"
COMP_MODE_CSP = "CSP (clamp types)"


def pick_stream_chunk(timesteps: int, snapshot_every: int = 100) -> int:
    """Snapshot cadence for the progress bar: every ``snapshot_every`` steps
    when that divides the schedule (sample_batch_stream requires chunk |
    total), else every step."""
    return snapshot_every if timesteps % snapshot_every == 0 else 1


def csp_fill_types(comp: str, n_atoms: int):
    """CSP clamp for the app's n_atoms box: integer-reduce ``comp`` exactly
    like Chemeleon.sample_csp (fractional formulas would otherwise round
    elements away) and tile Z formula units up to ``n_atoms``. Returns
    (types, actual_n_atoms) — the actual count is the largest multiple of
    the reduced unit that fits (>= one unit)."""
    from chemeleon_tpu.chem.composition import (parse_composition,
                                                reduced_composition)
    from chemeleon_tpu.chem.elements import z_of

    red = reduced_composition(parse_composition(comp))
    unit = [z_of(el) for el, cnt in sorted(red.items())
            for _ in range(int(cnt))]
    types = unit * max(1, n_atoms // len(unit))
    return types, len(types)


def csp_fill_z(comp: str, n_atoms: int) -> int:
    """The remote twin of csp_fill_types: the /generate wire carries
    (fixed_comp, fixed_z), so send the same Z the local path would tile."""
    from chemeleon_tpu.chem.composition import composition_to_types

    return max(1, n_atoms // len(composition_to_types(comp)))


def build_local_sampling(comp, comp_mode, comp_scale, n_samples, lattice_sys,
                         n_atoms):
    """(kwargs for sample_batch_stream, actual n_atoms) for the local path.
    ``comp_mode`` in {COMP_MODE_OFF, COMP_MODE_PRIOR, COMP_MODE_CSP};
    empty/None ``comp`` means unconditioned regardless of mode."""
    kw = {}
    if comp and comp_mode == COMP_MODE_CSP:
        types, n_atoms = csp_fill_types(comp, n_atoms)
        kw["fixed_types"] = [types] * n_samples
    elif comp and comp_mode == COMP_MODE_PRIOR:
        kw["comp_prior"] = [comp] * n_samples
        kw["comp_prior_scale"] = comp_scale
    if lattice_sys:
        kw["lattice_system"] = lattice_sys
    return kw, n_atoms


def route_generation(server_url, comp, comp_mode, lattice_sys) -> str:
    """Which backend path the app takes (streamlit_app.main dispatch):
    'server_generate' — remote with per-request conditioning (the streaming
    /predict wire has no conditioning fields); 'server_stream' — remote
    unconditioned with live progress; 'local' — in-process model."""
    if server_url and (lattice_sys or (comp and comp_mode != COMP_MODE_OFF)):
        return "server_generate"
    if server_url:
        return "server_stream"
    return "local"


def remote_progress(step, total):
    """Progress fraction from a /predict payload's remaining-step counter.
    ``total`` is unknown until the first payload (the server's timesteps are
    not on the wire) — pass total=None on the first call and reuse the
    returned total after. Returns (fraction in [0, 1], total)."""
    if total is None:
        total = max(step, 1)
    return min(max(1.0 - step / total, 0.0), 1.0), total
