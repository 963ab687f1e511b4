"""HPROM: LSPG on an ECSW/ECM sampled mesh (reference run_HPROM.py,
run_HPROM_ecsw_joshua.py, run_HPROM_ecm.py, run_HPROM_ecsw_multilevel.py
— selected by --weights-method).

Offline (--compute-ecsw): training matrix from the mu=(4.25, 0.0225)
trajectory (snapshots 3:T:10 vs 0:T-3:10), interior NNLS / ECM weights
with fixed boundary-ring weight bc_w=50, saved to ecsw_weights_lspg.npy.
Online: sampled-mesh Gauss-Newton LSPG.
"""

import os
import time

import numpy as np

from common import base_parser, default_config, default_ls, \
    get_or_build_basis, make_problem, report, res_path, setup_jax, sync

WEIGHTS_PATH = "ecsw_weights_lspg.npy"


def main(mu1=5.19, mu2=0.026, num_modes=95, compute_ecsw=False,
         weights_method="nnls", bc_w=50.0, num_cells=None, num_steps=None,
         f32=False, weights_path=None):
    setup_jax(f32)
    import jax.numpy as jnp

    from finitedifference_tpu.ecsw import (
        compute_ecsw_weights,
        ecsw_training_matrix,
        multilevel_nnls_weights,
    )
    from finitedifference_tpu.rom import ecsw_hprom, prepare_hprom
    from finitedifference_tpu.snapshots import load_or_compute_snaps

    cfg = default_config(num_cells, num_steps)
    grid, w0 = make_problem(cfg)
    if weights_path is None:
        weights_path = res_path(cfg, WEIGHTS_PATH)
    dtype = jnp.float32 if f32 else jnp.float64
    basis = get_or_build_basis(cfg, grid, w0, num_modes)

    if compute_ecsw or not os.path.exists(weights_path):
        mu_train = [4.25, 0.0225]   # the reference's single ECSW sample
        snaps = load_or_compute_snaps(mu_train, grid, w0, cfg.dt,
                                      cfg.num_steps,
                                      snap_folder=cfg.snap_folder)
        t = cfg.num_steps
        print(f"Generating ECSW training block for mu = {mu_train}")
        c = np.asarray(ecsw_training_matrix(
            grid, jnp.asarray(snaps[:, 3:t:10]),
            jnp.asarray(snaps[:, 0:t - 3:10]),
            jnp.asarray(basis), mu_train[0], mu_train[1], cfg.dt))
        t0 = time.time()
        if weights_method == "multilevel":
            weights = multilevel_nnls_weights(c, grid, num_subdomains=12,
                                              bc_w=bc_w)
        else:
            weights = compute_ecsw_weights(c, grid, bc_w=bc_w,
                                           method=weights_method,
                                           rel_err_thresh=1e-4)
        print(f"weight solve time: {time.time() - t0:.2f}s")
        np.save(weights_path, weights)
    else:
        weights = np.load(weights_path)
    print(f"N_e = {int((weights > 0).sum())}")

    mesh, sw, basis_aug = prepare_hprom(grid, weights, basis)
    y0 = jnp.asarray(basis.T @ w0, dtype)
    t0 = time.time()
    res = ecsw_hprom(grid, mesh, sw.astype(dtype), y0,
                     basis_aug.astype(dtype), cfg.dt, cfg.num_steps,
                     mu1, mu2, **default_ls(f32))
    rom_snaps = basis @ sync(res.red_coords)
    elapsed = time.time() - t0

    hdm = load_or_compute_snaps([mu1, mu2], grid, w0, cfg.dt,
                                cfg.num_steps, snap_folder=cfg.snap_folder)
    return report("HPROM", rom_snaps, hdm, elapsed, (mu1, mu2),
                  save_prefix="hprom")


if __name__ == "__main__":
    p = base_parser(__doc__)
    p.add_argument("--num-modes", type=int, default=95)
    p.add_argument("--compute-ecsw", action="store_true")
    p.add_argument("--weights-method", default="nnls",
                   choices=["nnls", "scipy_nnls", "ecm", "multilevel"])
    p.add_argument("--bc-w", type=float, default=50.0)
    a = p.parse_args()
    main(a.mu1, a.mu2, a.num_modes, a.compute_ecsw, a.weights_method,
         a.bc_w, a.num_cells, a.num_steps, a.f32)
