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
