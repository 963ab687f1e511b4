"""Diagnose the full-grid Pallas PROM's f32 accuracy at 750^2.

Runs pallas_prom at one test point under several iteration budgets /
solver settings and scores each trajectory in COORDINATE SPACE against
the cached test qcoords (exact: floor^2 + ||q - red||^2), so no 2.25 GB
snapshot or 9 GB reconstruct is touched. Separates "under-iterating in
f32" (more its help) from "f32 residual floor" (they don't).

Run on the TPU: python scripts/probe_prom_pallas_acc.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_CACHE_DIR",
                                         os.path.expanduser(
                                             "~/.cache/fdtpu_jax_cache")))
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from finitedifference_tpu.grid import Grid2D
    from finitedifference_tpu.rom_factored import (
        pallas_prom,
        precompute_prom_pallas,
    )

    n, k = 750, 95
    grid = Grid2D(nx=n, ny=n, x_up=100.0, y_up=100.0)
    basis = np.load("basis_750x750.npy")[:, :k].astype(np.float32)
    vu_p, vv_p, dmask, _ = precompute_prom_pallas(grid, basis)
    w0 = np.ones(grid.state_dim, np.float32)
    y0 = jnp.asarray(basis.T @ w0, jnp.float32)
    mu = (5.19, 0.026)
    z = np.load("fine_qcoords/test_mu1_5.19+mu2_0.026.npz")
    q, wn = z["q"].astype(np.float64), float(z["w_norm"])
    floor2 = max(wn ** 2 - np.linalg.norm(q) ** 2, 0.0)

    def score(red):
        red = np.asarray(red, np.float64).T[1:]     # (500, k)
        miss = np.linalg.norm(q[1:, :k] - red) ** 2 \
            + np.linalg.norm(q[1:, k:]) ** 2
        return 100 * np.sqrt(floor2 * (500 / 501) + miss) / wn

    for label, kw in [
        ("unroll3/normal", dict(unroll_its=3, ls_method="normal")),
        ("unroll5/normal", dict(unroll_its=5, ls_method="normal")),
        ("dynamic/normal", dict(unroll_its=0, ls_method="normal")),
        ("unroll3/cg", dict(unroll_its=3, ls_method="cg")),
    ]:
        t0 = time.time()
        r = pallas_prom(grid, vu_p, vv_p, dmask, y0, 0.05, 500,
                        mu[0], mu[1], **kw)
        red = np.asarray(r.red_coords)
        el = time.time() - t0
        print(f"{label:16s}: err {score(red):.3f}%  its "
              f"{int(r.total_gn_its)}  [{el:.1f}s incl compile]",
              flush=True)


if __name__ == "__main__":
    main()
