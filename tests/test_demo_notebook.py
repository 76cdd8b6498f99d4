"""demo.ipynb must keep executing against the live API.

The reference's Dash app and evaluate.py rotted against its own API
(SURVEY §3.5 'Known API skew'); executing the demo notebook cell-by-cell
in CI prevents the same drift here (e.g. the trajectory index-convention
change would have broken cell 4 silently otherwise).
"""

import json
import os
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_demo_notebook_executes(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)  # the notebook writes demo_*.png / gen_*.cif
    nb = json.load(open(REPO / "demo.ipynb"))
    ns = {}
    for i, cell in enumerate(nb["cells"]):
        if cell["cell_type"] != "code":
            continue
        src = "".join(cell["source"])
        exec(compile(src, f"demo_cell_{i}", "exec"), ns)  # noqa: S102
    # the notebook's artifacts exist
    assert (tmp_path / "demo_structure.png").stat().st_size > 1000
    assert (tmp_path / "demo_trajectory.png").stat().st_size > 1000
    assert "_cell_length_a" in (tmp_path / "gen_0.cif").read_text()
