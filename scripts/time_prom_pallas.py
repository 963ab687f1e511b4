"""Hardware timing probe for the full-grid streaming Pallas PROM engine
(rom_factored.pallas_prom) vs the XLA LSPG path. Run on the axon TPU:

    timeout 900 python scripts/time_prom_pallas.py --num-cells 750

Uses a random orthonormal-ish basis when the real one is absent (online
THROUGHPUT is basis-agnostic; errors are recorded by the campaign
scripts, not here). unroll_its fixes the per-step kernel count so the
reported rate is a clean per-iteration measure.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--num-cells", type=int, default=750)
    p.add_argument("--num-modes", type=int, default=95)
    p.add_argument("--num-steps", type=int, default=500)
    p.add_argument("--unroll", type=int, default=3)
    p.add_argument("--skip-xla", action="store_true")
    p.add_argument("--dynamic", action="store_true",
                   help="also time the dynamic while_loop variant")
    a = p.parse_args()

    import jax

    cache = os.path.join(os.path.expanduser("~"), ".cache",
                         "fdtpu_jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
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

    n = a.num_cells
    k = a.num_modes
    grid = Grid2D(nx=n, ny=n, x_up=100.0, y_up=100.0)
    print(f"device={jax.devices()[0]}, grid={n}^2, k={k}", flush=True)

    bpath = f"basis_{n}x{n}.npy" if n != 250 else "basis.npy"
    if os.path.exists(bpath):
        basis = np.load(bpath)[:, :k].astype(np.float32)
        print(f"basis from {bpath}")
    else:
        rng = np.random.default_rng(0)
        basis = rng.normal(size=(grid.state_dim, k)).astype(np.float32)
        basis /= np.linalg.norm(basis, axis=0, keepdims=True)
        # bias mode 0 toward the constant state so y0 ~ reasonable
        basis[:, 0] = 1.0 / np.sqrt(grid.state_dim)
        print("basis: random (timing only)")

    vu_p, vv_p, wmask, tr = precompute_prom_pallas(grid, basis)
    print(f"tile_rows={tr}, padded {vu_p.shape} x2 "
          f"({2 * vu_p.nbytes / 1e9:.2f} GB)", flush=True)
    w0 = np.ones(grid.state_dim, np.float32)
    y0 = jnp.asarray(basis.T @ w0, jnp.float32)

    def run(unroll):
        r = pallas_prom(grid, vu_p, vv_p, wmask, y0, 0.05, a.num_steps,
                        4.75, 0.02, unroll_its=unroll,
                        ls_method="normal")
        s = float(jnp.sum(r.red_coords))
        return s, int(r.total_gn_its)

    t0 = time.time()
    s, its = run(a.unroll)
    print(f"compile+first: {time.time() - t0:.1f}s (sum={s:.4g}, "
          f"its={its})", flush=True)
    ts = []
    for rep in range(3):
        t0 = time.time()
        run(a.unroll)
        ts.append(time.time() - t0)
    el = sorted(ts)[1]
    n_k = a.num_steps * a.unroll
    print(f"pallas_prom unroll={a.unroll}: {el:.3f}s / {a.num_steps} "
          f"steps = {a.num_steps / el:.1f} steps/s; "
          f"{1e3 * el / n_k:.3f} ms/kernel "
          f"({2 * vu_p.nbytes / (el / n_k) / 1e9:.0f} GB/s streamed)",
          flush=True)

    if a.dynamic:
        t0 = time.time()
        s, its = run(0)
        print(f"dynamic compile+first: {time.time() - t0:.1f}s "
              f"(its={its})", flush=True)
        ts = []
        for rep in range(3):
            t0 = time.time()
            _, its = run(0)
            ts.append(time.time() - t0)
        el = sorted(ts)[1]
        print(f"pallas_prom dynamic: {el:.3f}s, its={its} "
              f"({its / a.num_steps:.2f}/step), "
              f"{1e3 * el / max(its, 1):.3f} ms/kernel", flush=True)

    if not a.skip_xla:
        from finitedifference_tpu.rom import lspg_prom
        basis_d = jnp.asarray(basis, jnp.float32)
        w0_d = jnp.asarray(w0, jnp.float32)

        def run_xla():
            r = lspg_prom(grid, w0_d, 0.05, a.num_steps, 4.75, 0.02,
                          basis_d, ls_method="normal")
            return float(jnp.sum(r.red_coords)), int(r.total_gn_its)

        t0 = time.time()
        _, its = run_xla()
        print(f"lspg compile+first: {time.time() - t0:.1f}s "
              f"(its={its})", flush=True)
        ts = []
        for rep in range(3):
            t0 = time.time()
            run_xla()
            ts.append(time.time() - t0)
        el = sorted(ts)[1]
        print(f"lspg_prom (XLA): {el:.3f}s / {a.num_steps} steps "
              f"= {a.num_steps / el:.1f} steps/s", flush=True)


if __name__ == "__main__":
    main()
