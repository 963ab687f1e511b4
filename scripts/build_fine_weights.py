"""Build 750^2 ECSW weights with the training matrix resident on the
TPU end to end (VERDICT r2 #2/#6).

This is exactly the stage where the reference's fine workbench OOMs a
24-core node (BurgersFD_CleanFine/slurm-55470585.out:1-2): the (4750,
562500) training matrix is 10.7 GB in f32.  Here it is assembled in
chunks into one donated device buffer (`ecsw_training_matrix_device`),
level-1 support screening runs as jitted per-subdomain FISTA programs on
the device (the TPU-native analogue of the reference's joblib NNLS
fan-out, run_HPROM_ecsw_multilevel.py:89-120), and only the screened
columns (~100 MB) cross the 24 MB/s tunnel for the exact host
Lawson-Hanson level-2 solve.

Saves to the canonical fine HPROM weight path
(ecsw_weights_lspg_750x750.npy) consumed by record_tpu_rows.py /
run_hprom.py.  Run on the TPU backend from the repo root.  Idempotent
unless --redo.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "runners")

import numpy as np  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir",
                  "/root/.cache/fdtpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--num-cells", type=int, default=750,
                   help="grid resolution (non-750 for CPU smoke tests)")
    p.add_argument("--num-modes", type=int, default=95)
    p.add_argument("--snap-stride", type=int, default=10,
                   help="training-snapshot stride; raise it at larger "
                        "mode counts to keep C = (pairs*modes, n_cells) "
                        "f32 inside the 16 GB HBM (150 modes needs "
                        "stride >= 14: 36*150 x 562500 = 12.2 GB)")
    p.add_argument("--chunk", type=int, default=2,
                   help="snapshots per C-assembly dispatch (bounds HBM)")
    p.add_argument("--subdomains", type=int, default=12)
    p.add_argument("--cap", type=int, default=400,
                   help="level-1 support cap per subdomain (block mode)")
    p.add_argument("--method", default="lh",
                   choices=["lh", "multilevel"],
                   help="lh: EXACT device-scored Lawson-Hanson over all "
                        "candidates (default; reaches the 1e-4 recipe "
                        "target). multilevel: FISTA screening + host "
                        "level-2 (caps what the greedy can reach)")
    p.add_argument("--level1", default="global",
                   choices=["global", "block"],
                   help="multilevel level-1 screening: one global masked "
                        "FISTA or per-subdomain blocks")
    p.add_argument("--cap-total", type=int, default=8000,
                   help="level-1 support cap (global mode)")
    p.add_argument("--fista-iters", type=int, default=4000)
    p.add_argument("--rel-err", type=float, default=1e-4)
    p.add_argument("--ring", default="inflow", choices=["inflow", "full"])
    p.add_argument("--mu-train", default="single",
                   choices=["single", "spread"],
                   help="single: the reference's one-trajectory recipe "
                        "(4.25, 0.0225). spread: the same row budget "
                        "split over three training-grid trajectories — "
                        "generalizes the sampled mesh to test points "
                        "far from (4.25, 0.0225) in mu (stride is "
                        "multiplied by the trajectory count)")
    p.add_argument("--redo", action="store_true")
    a = p.parse_args()

    from common import default_config, res_path

    from finitedifference_tpu.ecsw import (
        ecsw_training_matrix_device,
        lawson_hanson_weights_device,
        multilevel_nnls_weights_device,
    )
    from finitedifference_tpu.grid import grid_from_config
    from finitedifference_tpu.snapshots import load_or_compute_snaps

    cfg = default_config(a.num_cells, None)
    grid = grid_from_config(cfg)
    # non-default mode counts get their own artifact, matching the
    # record_tpu_rows convention: ecsw_weights_lspg_150modes_750x750.npy
    stem = "ecsw_weights_lspg.npy" if a.num_modes == 95 \
        else f"ecsw_weights_lspg_{a.num_modes}modes.npy"
    out = res_path(cfg, stem)
    if os.path.exists(out) and not a.redo:
        w = np.load(out)
        print(f"{out} exists (N_e={int((w > 0).sum())}); --redo to rebuild")
        return

    w0 = np.ones(grid.state_dim)
    # always build/load the CANONICAL 150-mode fine basis and slice
    # (build_coarse_weights.py rationale): requesting 95 then 150 used
    # to rebuild the rSVD at a different sketch width and overwrite the
    # file, leaving the 95-mode weights trained against slightly
    # different leading columns than later campaigns load (r5)
    from common import get_or_build_basis
    basis = get_or_build_basis(cfg, grid, w0,
                               max(150, a.num_modes))[:, : a.num_modes]
    # the reference's single training trajectory + 3-step snapshot
    # pairing (run_HPROM_ecsw_joshua.py:55-66); 'spread' divides the
    # same row budget over three training-grid trajectories
    if a.mu_train == "single":
        mu_list = [(4.25, 0.0225)]
        stride = a.snap_stride
    else:
        mu_list = [(4.25, 0.0225), (4.875, 0.015), (5.5, 0.03)]
        stride = a.snap_stride * len(mu_list)
    groups = []
    t = cfg.num_steps
    n_pairs = 0
    for mu in mu_list:
        snaps = load_or_compute_snaps(list(mu), grid, w0, cfg.dt,
                                      cfg.num_steps,
                                      snap_folder=cfg.snap_folder,
                                      snaps_dtype=jnp.float32)
        s_now = snaps[:, 3:t:stride].astype(np.float32)
        s_prev = snaps[:, 0:t - 3:stride].astype(np.float32)
        del snaps
        if s_now.shape[1] % a.chunk:
            keep = s_now.shape[1] - s_now.shape[1] % a.chunk
            s_now, s_prev = s_now[:, :keep], s_prev[:, :keep]
        n_pairs += s_now.shape[1]
        groups.append((mu[0], mu[1], jnp.asarray(s_now),
                       jnp.asarray(s_prev)))
    print(f"{n_pairs} snapshot pairs over {len(mu_list)} trajectories; "
          f"assembling C on device "
          f"({n_pairs * a.num_modes} x {grid.n_cells}, "
          f"{n_pairs * a.num_modes * grid.n_cells * 4 / 1e9:.1f} GB "
          f"f32)", flush=True)
    t0 = time.time()
    from finitedifference_tpu.ecsw import ecsw_training_matrix_device_multi
    C_dev = ecsw_training_matrix_device_multi(
        grid, groups, jnp.asarray(basis, jnp.float32), cfg.dt,
        chunk=a.chunk)
    del groups
    C_dev.block_until_ready()
    print(f"C assembled in {time.time() - t0:.0f}s", flush=True)

    t0 = time.time()
    if a.method == "lh":
        weights = lawson_hanson_weights_device(
            C_dev, grid, bc_w=50.0, rel_err_thresh=a.rel_err,
            ring=a.ring, verbose=True)
    else:
        weights = multilevel_nnls_weights_device(
            C_dev, grid, num_subdomains=a.subdomains, bc_w=50.0,
            rel_err_thresh=a.rel_err, fista_iters=a.fista_iters,
            support_cap_per_block=a.cap, ring=a.ring, level1=a.level1,
            support_cap_total=a.cap_total, verbose=True)
    print(f"weights solved in {time.time() - t0:.0f}s", flush=True)
    np.save(out, weights)
    print(f"saved {out}: N_e = {int((weights > 0).sum())} "
          f"(interior support "
          f"{int((weights[weights != 50.0] > 0).sum())})", flush=True)


if __name__ == "__main__":
    main()
