"""Dash demo app (reference: app/dash_app.py — NOTE the upstream version is
bit-rotted: it calls a nonexistent ``load_from_default_checkpoint`` and a
stale ``sample(natoms, texts, stream=True)`` signature, dash_app.py:29,:357.
This rebuild uses the working API.)

Background sampling runs in a thread feeding a Queue polled by dcc.Interval,
like the reference (dash_app.py:107, :305-310, :416-423).

Run: ``python app/dash_app.py`` (requires dash, not bundled in the TPU image).
"""

from __future__ import annotations

import json
import queue
import threading

try:
    import dash
    from dash import dcc, html
    from dash.dependencies import Input, Output, State
except ImportError as e:  # pragma: no cover
    raise SystemExit(
        "dash is not installed. `pip install dash` to run the demo app; the "
        "chemeleon_tpu core does not require it.") from e

from chemeleon_tpu.serve.server import crystals_to_payload

_results: "queue.Queue" = queue.Queue()
_model = None
_lock = threading.Lock()
# one sampling job at a time: concurrent compiled scans contend on the one
# TPU chip (serve/server.py serializes with a device lock for the same
# reason) and interleave their payloads in the single output queue
_job_active = threading.Event()


def get_model():
    global _model
    with _lock:
        if _model is None:
            from chemeleon_tpu.models.chemeleon import Chemeleon
            _model = Chemeleon.load_general_text_model()
    return _model


def _sample_worker(text, n_atoms, n_samples):
    try:
        model = get_model()
        total = model.cfg.timesteps
        chunk = 100 if total % 100 == 0 else 1
        t = total
        for crystals in model.sample(text, n_atoms, n_samples, stream=True,
                                     stream_chunk=chunk):
            t -= chunk
            _results.put(crystals_to_payload(crystals, step=t))
    except Exception as e:  # surface the failure in the UI stream
        _results.put(json.dumps({"error": str(e)}))
    finally:
        # the end-of-stream sentinel must ALWAYS arrive — without it the
        # poll callback never shows [done] and the next run's payloads
        # would interleave with this stalled one's
        _results.put(None)
        _job_active.clear()


app = dash.Dash(__name__)
app.layout = html.Div([
    html.H2("Chemeleon-TPU"),
    dcc.Input(id="prompt", type="text",
              value="A Crystal Structure of LiMnO4 with orthorhombic symmetry",
              style={"width": "60%"}),
    dcc.Input(id="n-atoms", type="number", value=6, min=1, max=20),
    dcc.Input(id="n-samples", type="number", value=2, min=1, max=5),
    html.Button("Generate", id="go"),
    html.Pre(id="out"),
    dcc.Interval(id="poll", interval=500),
    dcc.Store(id="running", data=False),
])


@app.callback(Output("running", "data"), Input("go", "n_clicks"),
              State("prompt", "value"), State("n-atoms", "value"),
              State("n-samples", "value"), prevent_initial_call=True)
def start(n_clicks, prompt, n_atoms, n_samples):
    with _lock:  # atomic test-and-set: double-click spawns one worker
        if _job_active.is_set():
            return True
        _job_active.set()
    threading.Thread(target=_sample_worker,
                     args=(prompt, int(n_atoms), int(n_samples)),
                     daemon=True).start()
    return True


@app.callback(Output("out", "children"), Input("poll", "n_intervals"),
              State("out", "children"))
def poll(_, current):
    lines = []
    try:
        while True:
            item = _results.get_nowait()
            if item is None:
                lines.append("[done]")
            else:
                lines.append(item[:200] + "...")
    except queue.Empty:
        pass
    if not lines:
        return current
    return (current or "") + "\n" + "\n".join(lines)


if __name__ == "__main__":
    app.run(debug=False, port=8050)
