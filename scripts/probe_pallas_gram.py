"""Pinpoint the streaming-PROM accuracy loss (VERDICT r4 #2).

At a mid-trajectory state of the coarse 250^2 PROM, compute the
Gauss-Newton system three ways and compare the resulting updates:

  kernel   gn_full_first_pallas (f32 MXU dots, f64-reduced partials)
  f32eval  A = [J V | r] evaluated in f32 XLA, Gram formed in f64
  f64eval  A evaluated in f64 XLA, Gram in f64 (ground truth)

dy(kernel) vs dy(f32eval) isolates the kernel's dot-accumulation error;
dy(f32eval) vs dy(f64eval) isolates the f32 evaluation floor (which the
standard engine shares and which measures 1.02-1.14% online).

Run on the TPU: python scripts/probe_pallas_gram.py
"""

import os
import sys

sys.path.insert(0, ".")
sys.path.insert(0, "runners")

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/fdtpu_jax_cache"))

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from common import default_config, get_or_build_basis, make_problem  # noqa: E402
from finitedifference_tpu.ops.pallas_gn_full import (  # noqa: E402
    _round_up,
    gn_full_first_pallas,
)
from finitedifference_tpu.ops.stencil import (  # noqa: E402
    burgers_residual_flat,
    inflow_bc_term,
    jacobian_times_basis,
    source_term,
)
from finitedifference_tpu.rom_factored import (  # noqa: E402
    pallas_prom,
    precompute_prom_pallas,
)


def main():
    cfg = default_config()
    grid, w0 = make_problem(cfg)
    k = 95
    basis = get_or_build_basis(cfg, grid, w0, k).astype(np.float32)
    mu = (5.19, 0.026)
    f32, f64 = jnp.float32, jnp.float64

    vu_p, vv_p, dmask, tr = precompute_prom_pallas(grid, basis)
    y0 = jnp.asarray(basis.T @ w0, f32)
    warm = pallas_prom(grid, vu_p, vv_p, dmask, y0, float(cfg.dt), 200,
                       mu[0], mu[1], unroll_its=3)
    yp = jnp.asarray(np.asarray(warm.red_coords)[:, -1], f32)

    # ---- kernel system at yp --------------------------------------
    from finitedifference_tpu.ops.pallas_gn_full import full_layout
    nxp, ny_pad, tile = full_layout(grid, tr)
    hdx = float(0.5 * cfg.dt / grid.dx)
    hdy = float(0.5 * cfg.dt / grid.dy)
    s2d = np.asarray(source_term(grid, mu[1], cfg.dt, f32)) \
        + np.asarray(inflow_bc_term(grid, mu[0], cfg.dt, f32))
    from finitedifference_tpu.ops.pallas_gn_full import pad_field_full
    slbc = jnp.asarray(pad_field_full(s2d, grid, tr)[:, None])
    gk, cp = gn_full_first_pallas(vu_p, vv_p, yp, slbc, dmask, k, nxp,
                                  tile, hdx, hdy)
    gk = np.asarray(gk)[: k + 1, : k + 1].astype(np.float64)

    # ---- f32-eval / f64-eval references ---------------------------
    def gram(dtype):
        b = jnp.asarray(basis, dtype)
        w = b @ yp.astype(dtype)
        r = burgers_residual_flat(w, w, mu[0], mu[1], cfg.dt, grid)
        jv = jacobian_times_basis(w, b, cfg.dt, grid)
        a = jnp.concatenate((jv, r[:, None]), axis=1).astype(f64)
        return np.asarray(a.T @ a)

    g32 = gram(f32)
    g64 = gram(f64)

    def dy_of(g):
        gg, b = g[:k, :k], -g[:k, k]
        return np.linalg.solve(gg, b)

    dyk, dy32, dy64 = dy_of(gk), dy_of(g32), dy_of(g64)
    rnk, rn32, rn64 = (np.sqrt(g[k, k]) for g in (gk, g32, g64))

    def rel(a, b):
        return np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-300)

    print(f"||dy|| = {np.linalg.norm(dy64):.6e}")
    print(f"dy kernel vs f32eval: {rel(dyk, dy32):.3e}")
    print(f"dy f32eval vs f64eval: {rel(dy32, dy64):.3e}")
    print(f"dy kernel vs f64eval: {rel(dyk, dy64):.3e}")
    print(f"rn kernel/f32/f64: {rnk:.8e} {rn32:.8e} {rn64:.8e}")
    print(f"G rel err kernel vs f32eval: {rel(gk, g32):.3e}")
    print(f"G rel err f32eval vs f64eval: {rel(g32, g64):.3e}")
    print(f"b col rel err kernel vs f32eval: "
          f"{rel(gk[:k, k], g32[:k, k]):.3e}")
    cond = np.linalg.cond(g64[:k, :k])
    print(f"cond(G) = {cond:.3e} (cond(JV) ~ {np.sqrt(cond):.1f})")


if __name__ == "__main__":
    main()
