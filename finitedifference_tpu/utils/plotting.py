"""Plotting: midline slices and speedup/error summaries.

Role of the reference's plot_snaps (hypernet2D.py:3147-3180) and
plot_snapshots_with_speedup_and_errors.py. Matplotlib is imported lazily
and all functions accept/return fig-ax so they are headless-safe.
"""

from __future__ import annotations

import numpy as np


def plot_snaps(grid, snaps, snaps_to_plot, linewidth=2, color="black",
               linestyle="solid", label=None, fig_ax=None):
    """Midline slice plots: u(x, y=mid) and u(x=mid, y) for selected
    snapshot columns."""
    import matplotlib.pyplot as plt

    if fig_ax is None:
        fig, (ax1, ax2) = plt.subplots(2, 1)
    else:
        fig, ax1, ax2 = fig_ax

    x = np.asarray(grid.xc())
    y = np.asarray(grid.yc())
    mid_x, mid_y = x.size // 2, y.size // 2
    first = True
    snaps = np.asarray(snaps)
    for ind in snaps_to_plot:
        lbl = label if first else None
        first = False
        snap = snaps[: y.size * x.size, ind].reshape(y.size, x.size)
        ax1.plot(x, snap[mid_y, :], color=color, linestyle=linestyle,
                 linewidth=linewidth, label=lbl)
        ax2.plot(y, snap[:, mid_x], color=color, linestyle=linestyle,
                 linewidth=linewidth, label=lbl)
    ax1.set_xlabel("$x$")
    ax1.set_ylabel(f"$u(x, y={y[mid_y]:.1f})$")
    ax1.grid(True)
    ax2.set_xlabel("$y$")
    ax2.set_ylabel(f"$u(x={x[mid_x]:.1f}, y)$")
    ax2.grid(True)
    return fig, ax1, ax2


def plot_speedup_errors(results: dict, out_path: str | None = None):
    """Bar chart of speedup vs FOM and relative error per ROM variant.

    results: {name: {"elapsed": s, "rel_err_pct": e}} with a "FOM" entry.
    """
    import matplotlib.pyplot as plt

    fom_time = results["FOM"]["elapsed"]
    names = [k for k in results if k != "FOM"]
    speedups = [fom_time / results[k]["elapsed"] for k in names]
    errors = [results[k]["rel_err_pct"] for k in names]

    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(10, 4))
    ax1.bar(names, speedups)
    ax1.set_ylabel("speedup vs FOM")
    ax1.tick_params(axis="x", rotation=45)
    ax2.bar(names, errors)
    ax2.set_ylabel("relative error (%)")
    ax2.tick_params(axis="x", rotation=45)
    fig.tight_layout()
    if out_path:
        fig.savefig(out_path, dpi=200)
    return fig
