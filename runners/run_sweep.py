"""Vmapped (mu1, mu2) parameter sweep — the TPU headline workload.

Runs a whole grid of FOM (or PROM) simulations as ONE compiled program,
sharded across available devices. The reference's equivalent is a serial
Python loop over runners (run_tests.py:38)."""

import argparse
import os
import sys
import time

import numpy as np

from common import default_config, get_or_build_basis, make_problem, \
    res_path, setup_jax, sync


def main(n_mu1=3, n_mu2=3, model="fom", num_modes=95, num_cells=None,
         num_steps=None, f32=True, shard=True, engine="skewed"):
    setup_jax(f32)
    import jax
    import jax.numpy as jnp

    from finitedifference_tpu.parallel.sweep import (
        make_sweep_mesh,
        pad_to_multiple,
        sweep_fom,
        sweep_hprom,
        sweep_lspg,
    )

    cfg = default_config(num_cells, num_steps)
    grid, w0 = make_problem(cfg)
    dtype = jnp.float32 if f32 else jnp.float64

    mu1s = np.linspace(*cfg.mu1_range, n_mu1)
    mu2s = np.linspace(*cfg.mu2_range, n_mu2)
    mus = np.array([[m1, m2] for m1 in mu1s for m2 in mu2s])
    n_dev = len(jax.devices())
    mesh = make_sweep_mesh() if (shard and n_dev > 1) else None
    if mesh is not None:
        mus, n_real = pad_to_multiple(mus, n_dev)
    else:
        n_real = mus.shape[0]
    print(f"sweep: {n_real} points ({mus.shape[0]} padded) on {n_dev} "
          f"device(s), model={model}")

    from common import default_ls

    w0j = jnp.asarray(w0, dtype)
    if model == "fom":
        run = lambda m: sweep_fom(grid, w0j, cfg.dt, cfg.num_steps, m,
                                  mesh=mesh, engine=engine,
                                  snaps_dtype=jnp.float32)
    elif model == "hprom":
        from finitedifference_tpu.rom import prepare_hprom

        basis = get_or_build_basis(cfg, grid, w0, num_modes)
        weights = np.load(res_path(cfg, "ecsw_weights_lspg.npy"))
        smesh, sw, basis_aug = prepare_hprom(grid, weights, basis)
        y0 = jnp.asarray(basis.T @ w0, dtype)
        print(f"N_e = {int((weights > 0).sum())}")
        run = lambda m: sweep_hprom(
            grid, smesh, sw.astype(dtype), y0, basis_aug.astype(dtype),
            cfg.dt, cfg.num_steps, m, mesh=mesh, **default_ls(f32))
    else:
        basis = jnp.asarray(
            get_or_build_basis(cfg, grid, w0, num_modes), dtype)
        run = lambda m: sweep_lspg(grid, w0j, cfg.dt, cfg.num_steps, m,
                                   basis, mesh=mesh, **default_ls(f32))

    # device-side checksum: slice fetches are lazy on the axon backend
    # and would fake the timing
    checksum = jax.jit(lambda m: jnp.sum(run(m)))
    float(checksum(jnp.asarray(mus)))           # compile + settle
    t0 = time.time()
    float(checksum(jnp.asarray(mus * (1 + 1e-6))))   # fresh values
    elapsed = time.time() - t0
    total_steps = n_real * cfg.num_steps
    print(f"sweep wall-clock: {elapsed:.2f} s "
          f"({total_steps / elapsed:.1f} aggregate timesteps/s, "
          f"{elapsed / n_real:.3f} s/point)")
    return elapsed


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n-mu1", type=int, default=3)
    p.add_argument("--n-mu2", type=int, default=3)
    p.add_argument("--model", default="fom",
                   choices=["fom", "prom", "hprom"])
    p.add_argument("--num-modes", type=int, default=95)
    p.add_argument("--num-cells", type=int, default=None)
    p.add_argument("--num-steps", type=int, default=None)
    p.add_argument("--f64", action="store_true")
    p.add_argument("--no-shard", action="store_true")
    p.add_argument("--engine", default="skewed",
                   choices=["standard", "skewed"])
    a = p.parse_args()
    main(a.n_mu1, a.n_mu2, a.model, a.num_modes, a.num_cells, a.num_steps,
         not a.f64, not a.no_shard, a.engine)
