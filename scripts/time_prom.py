"""Time the pure PROM/HPROM online loop on the current backend
(device-side checksum; no trajectory fetch). Usage:
    python scripts/time_prom.py [num_cells] [num_steps]
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/fdtpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

from finitedifference_tpu.config import DEFAULT_CONFIG  # noqa: E402
from finitedifference_tpu.grid import grid_from_config  # noqa: E402
from finitedifference_tpu.rom import ecsw_hprom, lspg_prom, prepare_hprom  # noqa: E402

n = int(sys.argv[1]) if len(sys.argv) > 1 else 250
steps = int(sys.argv[2]) if len(sys.argv) > 2 else 500

cfg = DEFAULT_CONFIG.with_cells(n)
grid = grid_from_config(cfg)
w0 = np.ones(grid.state_dim)
basis = np.load("basis.npy")

f32 = jnp.float32


def timeit(tag, fn, *args, **kw):
    try:
        out = fn(*args, **kw)
        float(jnp.sum(out.red_coords))  # compile + settle
        reps = []
        for _ in range(3):
            t0 = time.time()
            out = fn(*args, **kw)
            s = float(jnp.sum(out.red_coords))
            reps.append(time.time() - t0)
        el = sorted(reps)[1]
        print(f"{tag:34s}: {el:8.3f} s  ({steps / el:9.1f} steps/s)  "
              f"its={int(out.total_gn_its)}  checksum={s:.6e}",
              flush=True)
        return el
    except Exception as e:  # noqa: BLE001 — later cases must still run
        print(f"{tag:34s}: FAILED ({type(e).__name__}: {str(e)[:80]})",
              flush=True)
        return float("nan")


on_tpu = jax.default_backend() not in ("cpu",)
w32 = jnp.asarray(w0, f32)
b32 = jnp.asarray(basis, f32)
timeit("prom f32 normal", lspg_prom, grid, w32, cfg.dt, steps,
       4.75, 0.02, b32, ls_method="normal")
timeit("prom f32 qr", lspg_prom, grid, w32, cfg.dt, steps,
       4.75, 0.02, b32)
if not on_tpu:
    # full f64 programs are emulated AND crash the axon worker
    # (CLAUDE.md); only run them off-TPU
    w0j = jnp.asarray(w0)
    bj = jnp.asarray(basis)
    timeit("prom f64 qr (ls f32)", lspg_prom, grid, w0j, cfg.dt, steps,
           4.75, 0.02, bj, ls_dtype=f32)
    timeit("prom f64 normal (ls f32)", lspg_prom, grid, w0j, cfg.dt,
           steps, 4.75, 0.02, bj, ls_dtype=f32, ls_method="normal")

import os  # noqa: E402

if os.path.exists("ecsw_weights_lspg.npy"):
    weights = np.load("ecsw_weights_lspg.npy")
    mesh, sw, basis_aug = prepare_hprom(grid, weights, basis)
    y0 = jnp.asarray(basis.T @ w0)
    print(f"N_e = {int((weights > 0).sum())}, n_aug = {mesh.n_aug}")
    timeit("hprom f32 normal", ecsw_hprom, grid, mesh,
           sw.astype(f32), y0.astype(f32), jnp.asarray(basis_aug, f32),
           cfg.dt, steps, 4.75, 0.02, ls_method="normal")
    timeit("hprom f32 qr", ecsw_hprom, grid, mesh,
           sw.astype(f32), y0.astype(f32), jnp.asarray(basis_aug, f32),
           cfg.dt, steps, 4.75, 0.02)
    from finitedifference_tpu.parallel.sweep import sweep_hprom
    mus3 = jnp.asarray([[5.19, 0.026], [4.56, 0.019], [4.75, 0.02]], f32)

    class _R:
        pass

    def sweep3(**kw):
        r = _R()
        out = sweep_hprom(grid, mesh, sw.astype(f32), y0.astype(f32),
                          jnp.asarray(basis_aug, f32), cfg.dt, steps,
                          mus3, ls_method="normal")
        r.red_coords = out
        r.total_gn_its = jnp.int32(0)
        return r

    el = timeit("hprom f32 3-point vmapped sweep", sweep3)
    if el == el:
        print(f"{'':34s}  -> {3 * steps / el:.1f} aggregate steps/s; "
              f"vs 3 serial FOM runs at 0.17 s each = {0.51 / el:.2f}x",
              flush=True)
    if not on_tpu:
        timeit("hprom f64 qr (ls f32)", ecsw_hprom, grid, mesh, sw, y0,
               jnp.asarray(basis_aug), cfg.dt, steps, 4.75, 0.02,
               ls_dtype=f32)
