"""Snapshot cache: the param -> file protocol.

Mirrors the reference's only FOM entry point for all pipelines
(hypernet2D.py:3081-3145): deterministic filenames
`param_snaps/mu1_{v}+mu2_{v}.npy`, compute-once / reuse-everywhere.
Filenames are byte-identical to the reference's so artifact directories
are interchangeable.
"""

from __future__ import annotations

import glob
import os
import time
from typing import Sequence

import numpy as np

from finitedifference_tpu.grid import Grid2D


def param_to_snap_fn(mu: Sequence[float], snap_folder: str = "param_snaps",
                     suffix: str = ".npy") -> str:
    """`param_snaps/mu1_{mu1}+mu2_{mu2}.npy` (reference hypernet2D.py:3081)."""
    parts = [f"mu{i + 1}_{m}" for i, m in enumerate(mu)]
    return os.path.join(snap_folder, "+".join(parts)) + suffix


def get_saved_params(snap_folder: str = "param_snaps") -> set:
    return set(glob.glob(os.path.join(snap_folder, "*")))


def load_or_compute_snaps(mu, grid: Grid2D, w0, dt, num_steps,
                          snap_folder: str = "param_snaps",
                          snaps_dtype=None) -> np.ndarray:
    """Load cached FOM snapshots, else run the implicit FOM and cache.

    Returns (2n, num_steps+1) ndarray (float64 unless `snaps_dtype`
    narrows the *stored* trajectory — the Newton solve itself always
    runs at w0's precision), identical layout and filename protocol to
    the reference (hypernet2D.py:3111-3145).
    """
    import jax
    import jax.numpy as jnp

    from finitedifference_tpu.fom import (
        inviscid_burgers_implicit2d,
        inviscid_burgers_implicit2d_skewed,
    )

    os.makedirs(snap_folder, exist_ok=True)
    snap_fn = param_to_snap_fn(mu, snap_folder=snap_folder)
    if snap_fn in get_saved_params(snap_folder=snap_folder):
        cached = np.load(snap_fn)
        # the filename protocol (byte-identical to the reference's)
        # encodes only mu, not num_steps: a cache written by a shorter
        # run cannot serve a longer one — fall through and recompute
        # (the longer trajectory overwrites the cache; a LONGER cache is
        # fine, its prefix is the same trajectory and is sliced below)
        if cached.shape[1] >= num_steps + 1:
            cached = cached[:, : num_steps + 1]
            # the filename also does not encode the stored dtype, so a
            # trajectory cached by an f32 pipeline could silently feed a
            # full-precision consumer: warn loudly on mismatch (ADVICE r2)
            expected = np.dtype(snaps_dtype if snaps_dtype is not None
                                else np.float64)
            if cached.dtype != expected:
                print(f"WARNING: cached snapshot {snap_fn} is "
                      f"{cached.dtype} but the caller expects "
                      f"{expected.name} — delete the file to recompute "
                      f"at full precision")
            return cached
        print(f"cached snapshot {snap_fn} has {cached.shape[1] - 1} steps "
              f"< requested {num_steps} — recomputing")

    t0 = time.time()
    if jax.default_backend() != "cpu":
        # skewed engine with Pallas solves — same trajectories, much
        # faster on TPU (mixed-precision inexact Newton)
        res = inviscid_burgers_implicit2d_skewed(
            grid, jnp.asarray(w0), float(dt), num_steps,
            float(mu[0]), float(mu[1]), snaps_dtype=snaps_dtype)
    else:
        res = inviscid_burgers_implicit2d(
            grid, jnp.asarray(w0), dt, num_steps,
            float(mu[0]), float(mu[1]), snaps_dtype=snaps_dtype)
    snaps = np.asarray(res.snaps)
    print(f"Computed FOM snaps for mu1={mu[0]}, mu2={mu[1]} in "
          f"{time.time() - t0:.3e} s ({int(res.total_newton_its)} Newton its)")
    if res.max_final_relnorm is not None:
        worst = float(res.max_final_relnorm)
        cutoff = 1e-12 if snaps.dtype == np.float64 else 1e-6
        if worst > cutoff:
            print(f"WARNING: some Newton step exited unconverged "
                  f"(worst final relative residual {worst:.2e} > {cutoff:g})")
    # atomic publish: np.save straight to the target leaves a torn file
    # if the writer dies (or two generators race) mid-write; writers are
    # per-process-unique tmp + os.replace so readers only ever see
    # complete trajectories
    tmp_fn = f"{snap_fn}.tmp.{os.getpid()}.npy"
    np.save(tmp_fn, snaps)
    os.replace(tmp_fn, snap_fn)
    return snaps


def collect_snapshots(mu_list, grid: Grid2D, w0, dt, num_steps,
                      snap_folder: str = "param_snaps",
                      allow_missing: bool = False) -> np.ndarray:
    """Stack snapshot matrices for a list of mu points -> (2n, T+1 * len).

    allow_missing=True tolerates absent cached snapshots instead of
    computing them: the point is logged to missing_snapshots.log and
    skipped, trimming the matrix (the reference trainers' behavior when
    data is incomplete, compute_global_weights_*:117-178).
    """
    import logging

    cols = []
    for mu in mu_list:
        if allow_missing:
            fn = param_to_snap_fn(mu, snap_folder=snap_folder)
            if not os.path.exists(fn):
                logger = logging.getLogger("finitedifference_tpu.snapshots")
                if not logger.handlers:
                    logger.addHandler(
                        logging.FileHandler("missing_snapshots.log"))
                    logger.setLevel(logging.WARNING)
                logger.warning("missing snapshot for mu=%s (%s)", mu, fn)
                print(f"warning: missing snapshot for mu={mu}; skipping")
                continue
        cols.append(load_or_compute_snaps(mu, grid, w0, dt, num_steps,
                                          snap_folder=snap_folder))
    if not cols:
        raise FileNotFoundError(
            f"no snapshots available in {snap_folder} for {mu_list}")
    return np.hstack(cols)


def compute_error(rom_snaps, hdm_snaps):
    """Per-timestep relative error + mean (reference hypernet2D.py:3074-3079).

    Note: matches the reference exactly, including its quirk of
    normalizing by ||rom|| rather than ||hdm||.
    """
    sq_rom = np.sqrt(np.square(rom_snaps).sum(axis=0))
    sq_err = np.sqrt(np.square(rom_snaps - hdm_snaps).sum(axis=0))
    rel_err = sq_err / sq_rom
    return rel_err, rel_err.mean()


def relative_error_pct(rom_snaps, hdm_snaps) -> float:
    """The canonical end-to-end metric 100*||hdm-rom||_F/||hdm||_F
    (e.g. reference run_prom.py:121)."""
    return float(
        100.0 * np.linalg.norm(hdm_snaps - rom_snaps)
        / np.linalg.norm(hdm_snaps)
    )
