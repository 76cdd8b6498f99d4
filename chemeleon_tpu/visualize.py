"""Crystal visualization (reference: chemeleon/visualize.py:18-217).

The reference renders plotly spheres + the 12 unit-cell edges with a
trajectory animation. plotly is not available in this environment, so the
default backend is matplotlib (3D scatter sized by covalent radius, colored
by JMOL CPK colors, cell edges drawn); the plotly backend (incl. animation
frames and save_html) activates automatically when plotly is importable.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from chemeleon_tpu.chem.elements import COVALENT_RADII, JMOL_COLORS, symbol_of
from chemeleon_tpu.chem.structure import Crystal

# the 12 edges of the unit cell as pairs of fractional corners
_CORNERS = np.array([[i, j, k] for i in (0, 1) for j in (0, 1)
                     for k in (0, 1)], dtype=float)
_EDGES = [(a, b) for a in range(8) for b in range(8)
          if a < b and np.abs(_CORNERS[a] - _CORNERS[b]).sum() == 1]


def _have_plotly() -> bool:
    try:
        import plotly  # noqa: F401
        return True
    except ImportError:
        return False


class Visualizer:
    def __init__(self, backend: Optional[str] = None):
        if backend is None:
            backend = "plotly" if _have_plotly() else "matplotlib"
        self.backend = backend

    # -- single structure -----------------------------------------------------
    def view(self, crystal: Crystal, show: bool = False,
             save_path: Optional[str] = None):
        if self.backend == "plotly":
            fig = self._plotly_figure(crystal)
            if save_path:
                fig.write_html(save_path)
            if show:
                fig.show()
            return fig
        return self._mpl_figure(crystal, show=show, save_path=save_path)

    def view_trajectory(self, trajectory: List[List[Crystal]], index: int = 0,
                        save_path: Optional[str] = None, stride: int = 10):
        """Animate one sample across the trajectory (plotly) or render a
        strip of snapshots (matplotlib)."""
        frames = [step[index] for step in trajectory[::stride]]
        if self.backend == "plotly":
            return self._plotly_animation(frames, save_path)
        # Figure() directly, NOT plt.figure(): pyplot's global registry
        # would keep every figure alive for the process lifetime (a leak in
        # long-running apps that render per request)
        from matplotlib.figure import Figure
        n = len(frames)
        fig = Figure(figsize=(3 * n, 3))
        for i, c in enumerate(frames):
            ax = fig.add_subplot(1, n, i + 1, projection="3d")
            self._mpl_draw(ax, c)
            ax.set_title(f"frame {i * stride}")
        if save_path:
            fig.savefig(save_path, dpi=100, bbox_inches="tight")
        return fig

    def save_html(self, crystal: Crystal, path: str):
        if self.backend != "plotly":
            raise RuntimeError("save_html requires the plotly backend")
        self._plotly_figure(crystal).write_html(path)

    # -- matplotlib backend ------------------------------------------------------
    def _mpl_draw(self, ax, crystal: Crystal):
        cart = crystal.cart_coords
        for z, pos in zip(crystal.atom_types, cart):
            sym = symbol_of(int(z))
            r = COVALENT_RADII.get(sym, 1.0)
            ax.scatter(*pos, s=200 * r ** 2,
                       color=JMOL_COLORS.get(sym, "#B0B0B0"),
                       edgecolors="black", linewidths=0.5)
            ax.text(*pos, sym, fontsize=7)
        corners = _CORNERS @ crystal.lattice
        for a, b in _EDGES:
            seg = np.stack([corners[a], corners[b]])
            ax.plot(seg[:, 0], seg[:, 1], seg[:, 2], color="gray", lw=0.8)
        ax.set_box_aspect((1, 1, 1))

    def _mpl_figure(self, crystal: Crystal, show: bool = False,
                    save_path: Optional[str] = None):
        # see view_trajectory: registry-free Figure, no pyplot state.
        # ``show`` was already a no-op under the forced Agg backend.
        from matplotlib.figure import Figure
        fig = Figure(figsize=(5, 5))
        ax = fig.add_subplot(projection="3d")
        self._mpl_draw(ax, crystal)
        ax.set_title(crystal.formula())
        if save_path:
            fig.savefig(save_path, dpi=120, bbox_inches="tight")
        return fig

    # -- plotly backend -------------------------------------------------------------
    def _plotly_traces(self, crystal: Crystal):
        import plotly.graph_objects as go
        traces = []
        cart = crystal.cart_coords
        syms = crystal.symbols
        traces.append(go.Scatter3d(
            x=cart[:, 0], y=cart[:, 1], z=cart[:, 2], mode="markers+text",
            text=syms,
            marker=dict(
                size=[18 * COVALENT_RADII.get(s, 1.0) for s in syms],
                color=[JMOL_COLORS.get(s, "#B0B0B0") for s in syms],
                line=dict(color="black", width=1))))
        corners = _CORNERS @ crystal.lattice
        for a, b in _EDGES:
            traces.append(go.Scatter3d(
                x=corners[[a, b], 0], y=corners[[a, b], 1],
                z=corners[[a, b], 2], mode="lines",
                line=dict(color="gray", width=2), showlegend=False))
        return traces

    def _plotly_figure(self, crystal: Crystal):
        import plotly.graph_objects as go
        return go.Figure(data=self._plotly_traces(crystal))

    def _plotly_animation(self, frames: Sequence[Crystal],
                          save_path: Optional[str]):
        import plotly.graph_objects as go
        fig = go.Figure(
            data=self._plotly_traces(frames[0]),
            frames=[go.Frame(data=self._plotly_traces(c), name=str(i))
                    for i, c in enumerate(frames)])
        fig.update_layout(updatemenus=[dict(
            type="buttons",
            buttons=[dict(label="Play", method="animate", args=[None]),
                     dict(label="Pause", method="animate",
                          args=[[None], {"mode": "immediate"}])])])
        if save_path:
            fig.write_html(save_path)
        return fig
