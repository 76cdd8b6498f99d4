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
