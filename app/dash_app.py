"""Dash demo app (reference: app/dash_app.py — NOTE the upstream version is
bit-rotted: it calls a nonexistent ``load_from_default_checkpoint`` and a
stale ``sample(natoms, texts, stream=True)`` signature, dash_app.py:29,:357.
This rebuild uses the working API and restores the intended feature set:

- a structure figure (dash_app.py:266-268, :512-525 — rendered as a base64
  PNG via the matplotlib backend so it works without plotly), with a
  per-sample selector (:303 radio) and CIF download (:530-543);
- background sampling in a thread feeding a poll()-able SamplingSession
  (app/utils.py), read by dcc.Interval — the reference's thread + Queue
  pattern (dash_app.py:107, :305-310, :416-423);
- a live progress bar (reference :344-354 puts ``step/timesteps*100`` on
  the queue; ours derives it from the stream chunk count);
- generate-button disable while a job runs (+ re-enable on DONE,
  reference :430-436);
- Play/Pause trajectory replay over the recorded denoising frames — the
  reference gets this from plotly's animate buttons
  (visualize.py:154-208); a static Img needs an explicit frame clock,
  implemented dash-free in app/utils.py:player_tick and driven by the
  same dcc.Interval.

Run: ``python app/dash_app.py`` (requires dash, not bundled in the TPU
image; the session/view-model/player logic is dash-free and tested
in-suite — tests/test_workflows.py).
"""

from __future__ import annotations

import threading

try:
    import dash
    from dash import dcc, html
    from dash.dependencies import Input, Output, State
except ImportError as e:  # pragma: no cover
    raise SystemExit(
        "dash is not installed. `pip install dash` to run the demo app; the "
        "chemeleon_tpu core does not require it.") from e

from app.utils import SamplingSession, crystal_to_png_b64, player_tick

_model = None
_model_lock = threading.Lock()
_session = SamplingSession()


def get_model():
    global _model
    with _model_lock:
        if _model is None:
            from chemeleon_tpu.models.chemeleon import Chemeleon
            _model = Chemeleon.load_general_text_model()
    return _model


app = dash.Dash(__name__)
app.layout = html.Div([
    html.H2("Chemeleon-TPU"),
    html.Div([
        dcc.Input(id="prompt", type="text",
                  value="A Crystal Structure of LiMnO4 with orthorhombic "
                        "symmetry",
                  style={"width": "55%"}),
        dcc.Input(id="n-atoms", type="number", value=6, min=1, max=20),
        dcc.Input(id="n-samples", type="number", value=2, min=1, max=5),
        html.Button("Generate", id="go"),
    ]),
    # progress bar (reference dash_app.py:219-231 dbc.Progress)
    html.Div(html.Div(id="progress-fill",
                      style={"width": "0%", "height": "14px",
                             "background": "#2c7be5",
                             "transition": "width .3s"}),
             style={"width": "55%", "border": "1px solid #ccc",
                    "borderRadius": "4px", "margin": "8px 0"}),
    html.Div(id="status"),
    html.Div([
        html.Label("Sample"),
        dcc.Dropdown(id="sample-idx", options=[{"label": "1", "value": 0}],
                     value=0, clearable=False, style={"width": "120px"}),
        html.Label("Trajectory step"),
        dcc.Slider(id="step-idx", min=0, max=0, step=1, value=0,
                   tooltip={"placement": "bottom"}),
        html.Button("Play", id="play"),
    ]),
    html.Img(id="structure", style={"maxWidth": "480px"}),
    html.Div([
        html.Button("Download CIF", id="download-btn", disabled=True),
        dcc.Download(id="download-cif"),
    ]),
    dcc.Store(id="playing", data=False),
    dcc.Interval(id="poll", interval=500),
])


@app.callback(Output("sample-idx", "options"), Output("go", "disabled"),
              Input("go", "n_clicks"),
              State("prompt", "value"), State("n-atoms", "value"),
              State("n-samples", "value"), prevent_initial_call=True)
def start(n_clicks, prompt, n_atoms, n_samples):
    n_samples = int(n_samples)
    if not _session.start(get_model(), prompt, int(n_atoms), n_samples):
        raise dash.exceptions.PreventUpdate  # double-click guard
    return ([{"label": str(i + 1), "value": i} for i in range(n_samples)],
            True)


@app.callback(Output("playing", "data"), Output("play", "children"),
              Input("play", "n_clicks"), State("playing", "data"),
              prevent_initial_call=True)
def toggle_play(n_clicks, playing):
    playing = not bool(playing)
    return playing, ("Pause" if playing else "Play")


@app.callback(Output("status", "children"), Output("structure", "src"),
              Output("step-idx", "max"), Output("step-idx", "value"),
              Output("download-btn", "disabled"),
              Output("progress-fill", "style"),
              Output("go", "disabled", allow_duplicate=True),
              Input("poll", "n_intervals"), Input("sample-idx", "value"),
              Input("step-idx", "value"), State("playing", "data"),
              prevent_initial_call="initial_duplicate")
def poll(_, sample_idx, step_idx, playing):
    state = _session.poll()
    bar = {"width": f"{state['progress'] * 100:.0f}%", "height": "14px",
           "background": "#2c7be5", "transition": "width .3s"}
    if state["error"]:
        return (f"error: {state['error']}", dash.no_update, 0, 0, True,
                bar, False)
    n = state["n_steps"]
    if n == 0:
        return (("sampling..." if _session.running else "ready"),
                dash.no_update, 0, 0, True, bar, _session.running)
    live = not state["done"]
    idx, _still = player_tick(step_idx, n, bool(playing), live)
    crystal = _session.crystal(int(sample_idx or 0), idx)
    src = (crystal_to_png_b64(crystal) if crystal is not None
           else dash.no_update)
    status = ("done" if state["done"]
              else f"sampling... chunk {n}/{state['total_chunks'] or '?'}")
    return status, src, n - 1, idx, live, bar, live


@app.callback(Output("download-cif", "data"), Input("download-btn", "n_clicks"),
              State("sample-idx", "value"), prevent_initial_call=True)
def download(n_clicks, sample_idx):
    i = int(sample_idx or 0)
    return dict(content=_session.cif(i), filename=f"chemeleon_gen_{i}.cif")


if __name__ == "__main__":
    app.run(debug=False, port=8050)
