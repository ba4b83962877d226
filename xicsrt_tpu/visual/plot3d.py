"""3D scene rendering: ray paths and optic outlines.

Equivalent of ``xicsrt/visual/xicsrt_3d__plotly.py`` /
``xicsrt_3d__ipyvolume.py``. Uses plotly when installed, otherwise falls
back to matplotlib's 3D axes, with the same API: ``figure`` then
``add_rays`` / ``add_optics`` / ``add_sources``, then ``show``.
"""

from __future__ import annotations

import numpy as np

from xicsrt_tpu.public import get_element

try:
    import plotly.graph_objects as go

    HAVE_PLOTLY = True
except ImportError:  # pragma: no cover - plotly optional
    HAVE_PLOTLY = False


class Scene:
    """Accumulates 3D traces; renders with plotly or matplotlib."""

    def __init__(self, backend=None):
        if backend is None:
            backend = "plotly" if HAVE_PLOTLY else "matplotlib"
        self.backend = backend
        self._lines = []  # (segments [M, 2, 3], color, name)
        self._points = []  # (points [M, 3], color, name)

    def add_line_segments(self, segments, color="red", name="rays"):
        segments = np.asarray(segments)
        if len(segments):
            self._lines.append((segments, color, name))

    def add_points(self, points, color="blue", name="points"):
        points = np.asarray(points)
        if len(points):
            self._points.append((points, color, name))

    # ------------------------------------------------------------------
    def show(self, filename=None):
        if self.backend == "plotly" and HAVE_PLOTLY:
            return self._show_plotly(filename)
        return self._show_matplotlib(filename)

    def _show_plotly(self, filename):
        fig = go.Figure()
        for segments, color, name in self._lines:
            # NaN-separated polyline batching.
            m = len(segments)
            pts = np.full((m * 3, 3), np.nan)
            pts[0::3] = segments[:, 0]
            pts[1::3] = segments[:, 1]
            fig.add_trace(
                go.Scatter3d(
                    x=pts[:, 0], y=pts[:, 1], z=pts[:, 2],
                    mode="lines", line={"color": color, "width": 1}, name=name,
                )
            )
        for points, color, name in self._points:
            fig.add_trace(
                go.Scatter3d(
                    x=points[:, 0], y=points[:, 1], z=points[:, 2],
                    mode="markers", marker={"color": color, "size": 2},
                    name=name,
                )
            )
        fig.update_layout(scene={"aspectmode": "data"})
        if filename:
            fig.write_html(filename)
        else:
            fig.show()
        return fig

    def _show_matplotlib(self, filename):
        import matplotlib.pyplot as plt
        from mpl_toolkits.mplot3d.art3d import Line3DCollection

        fig = plt.figure(figsize=(8, 7))
        ax = fig.add_subplot(projection="3d")
        for segments, color, name in self._lines:
            ax.add_collection3d(
                Line3DCollection(segments, colors=color, linewidths=0.3)
            )
        for points, color, name in self._points:
            ax.scatter(points[:, 0], points[:, 1], points[:, 2],
                       c=color, s=2, label=name)
        all_pts = np.concatenate(
            [s.reshape(-1, 3) for s, _, _ in self._lines]
            + [p for p, _, _ in self._points]
        ) if (self._lines or self._points) else np.zeros((1, 3))
        lo, hi = all_pts.min(axis=0), all_pts.max(axis=0)
        ax.set_xlim(lo[0], hi[0])
        ax.set_ylim(lo[1], hi[1])
        ax.set_zlim(lo[2], hi[2])
        ax.set_xlabel("x [m]")
        ax.set_ylabel("y [m]")
        ax.set_zlabel("z [m]")
        if filename:
            fig.savefig(filename, dpi=150)
        return fig


def figure(backend=None) -> Scene:
    """Create a 3D scene (cf. ``xicsrt_3d__plotly.figure``)."""
    return Scene(backend=backend)


def add_rays(scene: Scene, results, section="found", max_rays=1000,
             color=None):
    """Add ray paths between consecutive elements from the history.

    Cf. ``xicsrt_3d__plotly.add_rays`` (:113-229).
    """
    history = results.get(section, {}).get("history", {})
    names = list(history.keys())
    if len(names) < 2:
        return scene
    n = len(history[names[0]]["origin"])
    take = min(n, max_rays)
    idx = np.linspace(0, n - 1, take).astype(int) if n else []
    if color is None:
        color = "red" if section == "found" else "gray"
    segments = []
    for a, b in zip(names[:-1], names[1:]):
        p0 = np.asarray(history[a]["origin"])[idx]
        p1 = np.asarray(history[b]["origin"])[idx]
        # Only draw segments for rays that actually moved to element b.
        moved = np.linalg.norm(p1 - p0, axis=1) > 1e-12
        segments.append(np.stack([p0[moved], p1[moved]], axis=1))
    if segments:
        scene.add_line_segments(np.concatenate(segments), color=color,
                                name=f"{section} rays")
    return scene


def add_optics(scene: Scene, config, color="blue"):
    """Add optic bound outlines (cf. ``xicsrt_3d__plotly.add_optics``)."""
    for name in config.get("optics", {}):
        element = get_element(config, name)
        xsize = element.param.get("xsize")
        ysize = element.param.get("ysize")
        if not (xsize and ysize):
            continue
        x = xsize / 2.0
        y = ysize / 2.0
        corners_local = np.array(
            [[-x, -y, 0], [x, -y, 0], [x, y, 0], [-x, y, 0], [-x, -y, 0]],
            dtype=np.float64,
        )
        corners = np.asarray(element.frame.point_to_external(corners_local))
        segs = np.stack([corners[:-1], corners[1:]], axis=1)
        scene.add_line_segments(segs, color=color, name=name)
    return scene


def add_sources(scene: Scene, config, color="green"):
    """Add source bound outlines (cf. ``xicsrt_3d__plotly.add_sources``)."""
    for name in config.get("sources", {}):
        element = get_element(config, name)
        sizes = [element.param.get(k) or 0.0 for k in ("xsize", "ysize", "zsize")]
        x, y, z = (s / 2.0 for s in sizes)
        corners = np.array(
            [
                [-x, -y, -z], [x, -y, -z], [x, y, -z], [-x, y, -z],
                [-x, -y, z], [x, -y, z], [x, y, z], [-x, y, z],
            ]
        )
        edges = [
            (0, 1), (1, 2), (2, 3), (3, 0),
            (4, 5), (5, 6), (6, 7), (7, 4),
            (0, 4), (1, 5), (2, 6), (3, 7),
        ]
        pts = np.asarray(element.frame.point_to_external(corners))
        segs = np.stack([pts[[a for a, b in edges]],
                         pts[[b for a, b in edges]]], axis=1)
        scene.add_line_segments(segs, color=color, name=name)
    return scene
