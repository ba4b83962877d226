"""Declarative plot specification -> matplotlib figure.

Equivalent of the reference's ``xicsrt/util/mirplot.py:111-420``: diagnostics
are described as a list of dict specs ("plotlist") and rendered in one call,
so notebook/analysis code stays free of matplotlib boilerplate.

Each item is a dict:

- ``type``: 'line' (default) | 'scatter' | 'hist' | 'image' | 'errorbar'
- ``x``, ``y`` (data), ``yerr`` (errorbar), ``bins`` (hist), ``z`` (image)
- ``axes``: integer subplot index (default 0); subplots are laid out on a
  near-square grid in index order
- styling: ``label``, ``color``, ``alpha``, ``markersize``, ``linestyle``
- axis-level keys (applied to the item's subplot): ``xlabel``, ``ylabel``,
  ``title``, ``xbound``, ``ybound``, ``xscale``, ``yscale``, ``aspect``,
  ``legend`` (bool)
"""

from __future__ import annotations

import math

import numpy as np

_AXIS_KEYS = ("xlabel", "ylabel", "title", "xbound", "ybound", "xscale",
              "yscale", "aspect", "legend")


def plot_to_screen(plotlist, filename=None, show=False, figsize=None):
    """Render a plotlist; optionally save to ``filename``. Returns the fig."""
    import matplotlib.pyplot as plt

    plotlist = [dict(item) for item in plotlist]
    indices = sorted({int(item.get("axes", 0)) for item in plotlist})
    ncols = int(math.ceil(math.sqrt(len(indices))))
    nrows = int(math.ceil(len(indices) / ncols))
    if figsize is None:
        figsize = (5.5 * ncols, 4.5 * nrows)
    fig, axs = plt.subplots(nrows, ncols, figsize=figsize, squeeze=False)
    ax_of = {idx: axs.flat[k] for k, idx in enumerate(indices)}
    for extra in axs.flat[len(indices):]:
        extra.set_visible(False)

    for item in plotlist:
        ax = ax_of[int(item.get("axes", 0))]
        _draw(ax, item)
        _style_axis(ax, item)
    for idx in indices:
        ax = ax_of[idx]
        handles, _ = ax.get_legend_handles_labels()
        if handles:
            ax.legend(fontsize=8)

    if filename:
        fig.savefig(filename)
    if show:  # pragma: no cover - interactive
        plt.show()
    return fig


def _draw(ax, item):
    kind = str(item.get("type", "line")).lower()
    style = {
        k: item[k]
        for k in ("label", "color", "alpha", "markersize", "linestyle")
        if k in item
    }
    if kind == "line":
        ax.plot(np.asarray(item["x"]), np.asarray(item["y"]), **style)
    elif kind == "scatter":
        style.pop("linestyle", None)
        ms = style.pop("markersize", 4.0)
        ax.plot(np.asarray(item["x"]), np.asarray(item["y"]), ".",
                markersize=ms, **style)
    elif kind == "hist":
        style.pop("linestyle", None)
        style.pop("markersize", None)
        ax.hist(np.asarray(item["x"]), bins=item.get("bins", 50), **style)
    elif kind == "errorbar":
        ax.errorbar(np.asarray(item["x"]), np.asarray(item["y"]),
                    yerr=np.asarray(item.get("yerr")), fmt=".", **style)
    elif kind == "image":
        im = ax.imshow(
            np.asarray(item["z"]).T,
            origin="lower",
            extent=item.get("extent"),
            cmap=item.get("cmap", "viridis"),
            aspect=item.get("aspect", "auto"),
            interpolation="nearest",
        )
        if item.get("colorbar", True):
            ax.figure.colorbar(im, ax=ax)
    else:
        raise ValueError(f"Unknown plotlist item type: {kind}")


def _style_axis(ax, item):
    if "xlabel" in item:
        ax.set_xlabel(item["xlabel"])
    if "ylabel" in item:
        ax.set_ylabel(item["ylabel"])
    if "title" in item:
        ax.set_title(item["title"])
    if "xbound" in item:
        ax.set_xbound(*item["xbound"])
    if "ybound" in item:
        ax.set_ybound(*item["ybound"])
    if "xscale" in item:
        ax.set_xscale(item["xscale"])
    if "yscale" in item:
        ax.set_yscale(item["yscale"])
    if item.get("aspect") and str(item.get("type", "line")) != "image":
        ax.set_aspect(item["aspect"])
