"""Densify the fine-grid closure training set in parameter space.

The 750^2 closure fits fail to generalize from the reference's 9
training trajectories (RESULTS.md: 11.6-27% online) — the q_p -> q_s map
is interpolated from too few paths through mu-space at a resolution
where the shock position varies sharply with mu. The mesh side was
already generalized in round 3 (multi-trajectory ECSW); this script does
the same for the FIT: run the fast device FOM at a denser mu grid and
save ONLY the projected coordinates q = V^T w (150 x 501 per point,
~300 KB) — the 2.25 GB raw snapshots never cross the 24 MB/s dev tunnel.

Artifacts: fine_qcoords/mu1_{m1}+mu2_{m2}.npz (test points:
test_mu1_{m1}+mu2_{m2}.npz), one archive per parameter point with keys
`q` ((501, modes) f32, row t = projected coords at step t), `w_norm`
(f64 scalar ||snaps||_F, for exact coordinate-space error scoring) and
`mu` ((2,)). Points with a cached raw snapshot (param_snaps_750x750/)
are projected from disk on the host instead of re-running the FOM.

Role of the reference's offline training-data stage
(POD-RBF_global_20/compute_global_weights_*.py:115-180 loads 9 cached
runs); the densification itself is this framework's own capability — the
reference cannot afford 6.8 h per extra fine trajectory, this runs one
in ~3 s.

Run (TPU): python scripts/gen_fine_qcoords.py [--grid-size 5]
"""

import argparse
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)

OUT_DIR = "fine_qcoords"


TEST_POINTS = [(5.19, 0.026), (4.56, 0.019), (4.75, 0.02)]


def mu_grid(size: int):
    """size x size grid over the reference mu box (config.py:25-26)."""
    m1 = np.linspace(4.25, 5.5, size)
    m2 = np.linspace(0.015, 0.03, size)
    return [(round(float(a), 6), round(float(b), 6))
            for a in m1 for b in m2]


def qpath(mu1, mu2, test=False):
    stem = f"mu1_{mu1}+mu2_{mu2}.npz"
    return os.path.join(OUT_DIR, ("test_" if test else "") + stem)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--num-cells", type=int, default=750)
    p.add_argument("--grid-size", type=int, default=5,
                   help="mu-grid side (5 -> 25 training trajectories; "
                        "the reference grid is the 3x3 corner subset)")
    p.add_argument("--num-modes", type=int, default=150)
    a = p.parse_args()
    n = a.num_cells

    import jax

    # x64 ON: the w_norm bookkeeping needs f64 accumulation (an f32
    # norm of 1.1e9 elements carries ~1e-4 relative error — the SAME
    # order as the 150-mode projection floor it is meant to expose),
    # and the fresh FOM runs then use the reference f64 Newton. Pallas
    # kernels trace inside enable_x64(False) internally (CLAUDE.md).
    jax.config.update("jax_enable_x64", True)
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/fdtpu_jax_cache"))
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from finitedifference_tpu.fom import (
        inviscid_burgers_implicit2d_skewed,
    )
    from finitedifference_tpu.grid import Grid2D
    from finitedifference_tpu.snapshots import param_to_snap_fn

    res = f"_{n}x{n}" if n != 250 else ""
    basis = np.load(f"basis{res}.npy")[:, : a.num_modes]
    grid = Grid2D(nx=n, ny=n, x_up=100.0, y_up=100.0)
    snap_folder = f"param_snaps{res}" if res else "param_snaps"
    os.makedirs(OUT_DIR, exist_ok=True)

    # training grid + the 3 canonical test points (held-out validation
    # targets for the offline closure fits; saved with a test_ prefix so
    # split_training never trains on them)
    points = [(m, False) for m in mu_grid(a.grid_size)] \
        + [(m, True) for m in TEST_POINTS]
    todo = [(mu, t) for mu, t in points
            if not os.path.exists(qpath(*mu, test=t))]
    print(f"{len(points)} points, {len(todo)} to compute", flush=True)

    basis_d = None
    w0 = jnp.ones(grid.state_dim, jnp.float64)
    hi = jax.lax.Precision.HIGHEST
    for (mu1, mu2), is_test in todo:
        t0 = time.time()
        snap_fn = param_to_snap_fn([mu1, mu2], snap_folder=snap_folder)
        if os.path.exists(snap_fn):
            w = np.load(snap_fn).astype(np.float64)   # (2n, 501)
            q = (w.T @ basis).astype(np.float32)      # host project
            w_norm = float(np.linalg.norm(w))
            src = "disk"
        else:
            if basis_d is None:
                basis_d = jnp.asarray(basis, jnp.float32)
            r = inviscid_burgers_implicit2d_skewed(
                grid, w0, 0.05, 500, mu1, mu2,
                snaps_dtype=jnp.float32)
            q = np.asarray(jnp.matmul(r.snaps.T, basis_d,
                                      precision=hi))
            # ||w||_F on device with f64 ACCUMULATION but no f64
            # materialization (a 9 GB astype copy OOMed the chip next
            # to the 4.7 GB trajectory buffers)
            w_norm = float(jnp.sqrt(jnp.sum(
                r.snaps * r.snaps, dtype=jnp.float64)))
            src = "fom"
        np.savez(qpath(mu1, mu2, test=is_test), q=q,
                 w_norm=np.float64(w_norm), mu=np.array([mu1, mu2]))
        print(f"mu=({mu1}, {mu2}){' [test]' if is_test else ''}: "
              f"q {q.shape} from {src} [{time.time() - t0:.1f}s]",
              flush=True)
    print("ALL QCOORDS DONE", flush=True)


if __name__ == "__main__":
    main()
