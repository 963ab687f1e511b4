"""Full-grid streaming Pallas Gauss-Newton system
(ops/pallas_gn_full.py) — interpret-mode correctness on CPU: the kernel
Gram extension must match the brute-force [J V | r]^T [J V | r] from the
full stencil ops, and pallas_prom trajectories must match rom.lspg_prom
at f32. Shift/halo handling (west mask at the inflow column, south VMEM
row carry across tiles) is exactly what these parities exercise."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_rom import DT, MU, setup_problem


@pytest.fixture(scope="module")
def prom_problem():
    # nx=12 -> min_tile_rows=2, so tile_rows=4 gives multi-tile grids
    # (ny_pad=12 -> 3 tiles) with real south-carry traffic
    grid, ops, xc, w0, basis = setup_problem(nx=12, ny=10, num_steps=14,
                                             k=6)
    y0 = jnp.asarray(basis.T @ w0)
    return grid, w0, basis, y0


def test_gn_full_system_matches_stencil_ops(prom_problem):
    """First-variant kernel: gext and cp must equal the brute-force
    full-grid assembly (residual at the previous state + J V from
    jacobian_times_basis)."""
    from finitedifference_tpu.ops.pallas_gn_full import (
        full_layout,
        gn_full_first_pallas,
        gn_full_system_pallas,
        pad_basis_full,
        row_mask,
    )
    from finitedifference_tpu.ops.stencil import (
        burgers_residual_flat,
        inflow_bc_term,
        jacobian_times_basis,
        source_term,
    )

    grid, w0, basis, y0 = prom_problem
    f32 = jnp.float32
    k = int(y0.shape[0])
    vu_p, vv_p, tile_rows = pad_basis_full(basis, grid, tile_rows=4)
    dmask = row_mask(grid, tile_rows)
    nxp, ny_pad, tile = full_layout(grid, tile_rows)
    kp = vu_p.shape[1]
    hdx = float(0.5 * DT / grid.dx)
    hdy = float(0.5 * DT / grid.dy)

    rng = np.random.default_rng(3)
    yp = jnp.asarray(np.asarray(y0, np.float32))
    y = jnp.asarray(np.asarray(y0, np.float32)
                    + 0.01 * rng.normal(size=k).astype(np.float32))
    bf = jnp.asarray(basis, f32)
    w = bf @ y
    wp = bf @ yp

    # brute force (f32 stencil ops)
    r = burgers_residual_flat(w, wp, MU[0], MU[1], DT, grid)
    jv = jacobian_times_basis(w, bf, DT, grid)
    a = jnp.concatenate((jv, r[:, None]), axis=1)
    ref = np.zeros((kp, kp), np.float32)
    ref[: k + 1, : k + 1] = np.asarray(a.T @ a)

    # first kernel at yp: gext == system at yp; cp == CN step constant
    gext0, cp = gn_full_first_pallas(vu_p, vv_p, yp, _slbc(grid),
                                     dmask, k, nxp, tile, hdx, hdy,
                                     interpret=True)
    r0 = burgers_residual_flat(wp, wp, MU[0], MU[1], DT, grid)
    jv0 = jacobian_times_basis(wp, bf, DT, grid)
    a0 = jnp.concatenate((jv0, r0[:, None]), axis=1)
    ref0 = np.zeros((kp, kp), np.float32)
    ref0[: k + 1, : k + 1] = np.asarray(a0.T @ a0)
    np.testing.assert_allclose(np.asarray(gext0), ref0,
                               rtol=2e-4, atol=3e-4)
    # the ||r||^2 corner RELATIVELY (no atol): spurious dead-row flux
    # (the r4 accuracy bug — unmasked bottom pad rows with a real south
    # neighbor) inflates it by an absolute term the matrix-wide atol
    # above cannot see at toy scale
    np.testing.assert_allclose(float(gext0[k, k]), float(ref0[k, k]),
                               rtol=1e-4)

    # subsequent kernel at y with that cp == system at y
    gext = gn_full_system_pallas(vu_p, vv_p, y, cp, dmask, k, nxp,
                                 tile, hdx, hdy, interpret=True)
    np.testing.assert_allclose(np.asarray(gext), ref,
                               rtol=2e-4, atol=3e-4)

    # cp cross-check: residual(w, wp) == current-half(w) + cp
    n = grid.n_cells
    src = np.asarray(source_term(grid, MU[1], DT, f32)).ravel()
    lbc = np.asarray(inflow_bc_term(grid, MU[0], DT, f32)).ravel()
    rp = np.asarray(burgers_residual_flat(wp, wp, MU[0], MU[1], DT,
                                          grid))
    # cp rides in the padded dead-cell layout: gather the real cells
    cp_u = np.asarray(cp)[:, 0].reshape(ny_pad, nxp)[
        : grid.ny, : grid.nx].ravel()
    # at w == wp the residual is 2*half_flux - src - lbc and
    # cp = -u_p + half_flux(wp) - src - lbc, so r - cp - u_p must give
    # the same half-flux both ways
    up, vp_ = np.asarray(wp[:n]), np.asarray(wp[n:])
    half_u = rp[:n] - (up + cp_u)
    np.testing.assert_allclose(cp_u, -up + half_u - src - lbc,
                               rtol=1e-4, atol=1e-5)


def _slbc(grid):
    from finitedifference_tpu.ops.pallas_gn_full import pad_field_full
    from finitedifference_tpu.ops.stencil import (
        inflow_bc_term,
        source_term,
    )
    f32 = jnp.float32
    s2d = np.asarray(source_term(grid, MU[1], DT, f32)) \
        + np.asarray(inflow_bc_term(grid, MU[0], DT, f32))
    return jnp.asarray(pad_field_full(s2d, grid, 4)[:, None])


def test_pallas_prom_matches_lspg(prom_problem):
    """Full-trajectory parity vs rom.lspg_prom at f32 (interpret)."""
    from finitedifference_tpu.rom import lspg_prom
    from finitedifference_tpu.rom_factored import (
        pallas_prom,
        precompute_prom_pallas,
    )

    grid, w0, basis, y0 = prom_problem
    f32 = jnp.float32
    steps = 14
    ref = lspg_prom(grid, jnp.asarray(w0, f32), DT, steps, MU[0],
                    MU[1], jnp.asarray(basis, f32), ls_method="normal")

    vu_p, vv_p, wmask, _ = precompute_prom_pallas(grid, basis,
                                                  tile_rows=4)
    res = pallas_prom(grid, vu_p, vv_p, wmask, jnp.asarray(y0, f32),
                      DT, steps, MU[0], MU[1], interpret=True)
    # both paths now solve the reduced system in f64 (r5: the kernel's
    # per-tile partials reduce in f64, matching lspg_prom's ls_dtype
    # default), so the remaining gap is pure f32 evaluation drift of
    # the streamed residual/J V; iteration counts (the stopping-rule
    # semantics) must agree exactly. Toy-size tolerances can't see a
    # scale-dependent accumulation bug (VERDICT r4 #6) — that guard is
    # the record-time coordinate-space band check in
    # scripts/record_tpu_rows.py.
    np.testing.assert_allclose(np.asarray(res.red_coords),
                               np.asarray(ref.red_coords),
                               rtol=1e-4, atol=3e-4)
    assert int(res.total_gn_its) == int(ref.total_gn_its)


def test_pallas_prom_unrolled(prom_problem):
    """unroll_its budget >= dynamic loop -> same trajectory."""
    from finitedifference_tpu.rom_factored import (
        pallas_prom,
        precompute_prom_pallas,
    )

    grid, w0, basis, y0 = prom_problem
    f32 = jnp.float32
    steps = 10
    vu_p, vv_p, wmask, _ = precompute_prom_pallas(grid, basis,
                                                  tile_rows=4)
    y0f = jnp.asarray(y0, f32)
    a = pallas_prom(grid, vu_p, vv_p, wmask, y0f, DT, steps, MU[0],
                    MU[1], interpret=True)
    b = pallas_prom(grid, vu_p, vv_p, wmask, y0f, DT, steps, MU[0],
                    MU[1], unroll_its=20, interpret=True)
    np.testing.assert_allclose(np.asarray(b.red_coords),
                               np.asarray(a.red_coords),
                               rtol=1e-6, atol=1e-8)


def test_pad_basis_tile_rows():
    """Auto tile selection keeps T a sublane multiple and pads ny."""
    from finitedifference_tpu.grid import Grid2D
    from finitedifference_tpu.ops.pallas_gn_full import (
        full_layout,
        pad_basis_full,
        row_mask,
    )

    for nx, ny in ((750, 750), (250, 250), (12, 10), (16, 16)):
        grid = Grid2D(nx=nx, ny=ny, x_up=100.0, y_up=100.0)
        nxp, ny_pad, tile = full_layout(grid)
        assert nxp % 8 == 0 and nxp > nx and tile % 8 == 0
        basis = np.zeros((2 * nx * ny, 5), np.float32)
        vu_p, vv_p, tr = pad_basis_full(basis, grid)
        assert vu_p.shape[0] == ny_pad * nxp
        assert vu_p.shape[0] % tile == 0
        m = np.asarray(row_mask(grid, tr))
        assert m.shape == (vu_p.shape[0], 1)
        m2 = m.reshape(ny_pad, nxp)
        assert m2[:ny, :nx].all()
        assert not m2[:, nx:].any()
        # r5: the dead BOTTOM rows must mask too (their south neighbor
        # is the real last grid row — unmasked they leak flux into the
        # Gram, the r4 accuracy bug)
        assert not m2[ny:, :].any()
