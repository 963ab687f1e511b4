"""Smoke tests for the plotting layer (headless Agg backend): midline
slices, 2D heatmaps, 3D surfaces, overlays, and GIF animations — the
roles of the reference's plot_2d_burgers.py / plot_3d_burgers.py /
animations/* scripts."""

import os

import matplotlib

matplotlib.use("Agg")

import numpy as np
import pytest

from finitedifference_tpu.grid import Grid2D
from finitedifference_tpu.utils.plotting import (
    animate_field,
    animate_midline,
    overlay_midline,
    plot_field_2d,
    plot_field_3d,
    plot_snaps,
)


@pytest.fixture(scope="module")
def problem():
    grid = Grid2D(nx=12, ny=12, x_up=100.0, y_up=100.0)
    rng = np.random.default_rng(0)
    snaps = 1.0 + rng.random((2 * grid.n_cells, 6))
    return grid, snaps


class TestStaticPlots:
    def test_midline_slices(self, problem):
        grid, snaps = problem
        fig, ax1, ax2 = plot_snaps(grid, snaps, [0, 3, 5], label="HDM")
        assert len(ax1.lines) == 3

    def test_field_2d_panel(self, problem, tmp_path):
        grid, snaps = problem
        out = tmp_path / "f2d.png"
        plot_field_2d(grid, snaps, [0, 2, 4, 5], 0.05, str(out))
        assert out.exists() and out.stat().st_size > 0

    def test_field_3d_panel(self, problem, tmp_path):
        grid, snaps = problem
        out = tmp_path / "f3d.png"
        plot_field_3d(grid, snaps, [0, 2, 4, 5], 0.05, str(out))
        assert out.exists() and out.stat().st_size > 0

    def test_overlay(self, problem, tmp_path):
        grid, snaps = problem
        out = tmp_path / "ov.png"
        overlay_midline(grid, snaps, {"ROM-A": snaps * 1.01,
                                      "ROM-B": snaps * 0.99}, 5, 0.05,
                        str(out))
        assert out.exists() and out.stat().st_size > 0


class TestAnimations:
    def test_animate_2d(self, problem, tmp_path):
        grid, snaps = problem
        out = tmp_path / "a2d.gif"
        animate_field(grid, snaps, range(0, 6, 2), str(out), 0.05,
                      mode="2d")
        assert out.exists() and out.stat().st_size > 0

    def test_animate_3d(self, problem, tmp_path):
        grid, snaps = problem
        out = tmp_path / "a3d.gif"
        animate_field(grid, snaps, range(0, 6, 2), str(out), 0.05,
                      mode="3d")
        assert out.exists() and out.stat().st_size > 0

    def test_animate_midline(self, problem, tmp_path):
        grid, snaps = problem
        out = tmp_path / "am.gif"
        animate_midline(grid, snaps, {"ROM": snaps * 1.01}, [0, 2, 4],
                        str(out), 0.05)
        assert out.exists() and out.stat().st_size > 0
