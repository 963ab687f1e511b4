"""Skewed-coordinate engine + Pallas wavefront kernel (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import oracle
from finitedifference_tpu.fom import (
    inviscid_burgers_implicit2d,
    inviscid_burgers_implicit2d_skewed,
)
from finitedifference_tpu.grid import Grid2D
from finitedifference_tpu.ops import skewed as sk
from finitedifference_tpu.ops.pallas_wavefront import (
    solve_jacobian_wavefront_pallas,
    solve_skewed_pallas,
)
from finitedifference_tpu.ops.stencil import (
    burgers_residual_flat,
    inflow_bc_term,
    source_term,
)
from finitedifference_tpu.ops.wavefront import solve_jacobian_wavefront

MU = [4.75, 0.02]
DT = 0.05


class TestSkewedOps:
    def test_roundtrip(self):
        grid = Grid2D(nx=13, ny=9, x_up=100.0, y_up=100.0)
        lay = sk.make_layout(grid, block=8)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(9, 13)))
        s = sk.to_skewed(x, lay)
        assert s.shape == (lay.nd_pad, lay.ny_pad)
        np.testing.assert_array_equal(np.asarray(sk.from_skewed(s, lay)),
                                      np.asarray(x))

    def test_skewed_residual_matches_natural(self):
        grid = Grid2D(nx=12, ny=10, x_up=100.0, y_up=100.0)
        lay = sk.make_layout(grid, block=8)
        rng = np.random.default_rng(1)
        w = 1 + rng.uniform(size=grid.state_dim)
        wp = 1 + rng.uniform(size=grid.state_dim)

        want = burgers_residual_flat(jnp.asarray(w), jnp.asarray(wp),
                                     MU[0], MU[1], DT, grid)
        ru_w, rv_w = grid.split_fields(want)

        u, v = grid.split_fields(jnp.asarray(w))
        up, vp = grid.split_fields(jnp.asarray(wp))
        valid = sk.valid_mask(lay, jnp.float64)
        src_sk = sk.skewed_source(lay, grid, MU[1], DT, jnp.float64)
        lbc_sk = sk.skewed_inflow_bc(lay, grid, MU[0], DT, jnp.float64)
        ru, rv = sk.skewed_residual(
            sk.to_skewed(u, lay), sk.to_skewed(v, lay),
            sk.to_skewed(up, lay), sk.to_skewed(vp, lay),
            DT, grid, lay, src_sk, lbc_sk, valid)
        np.testing.assert_allclose(np.asarray(sk.from_skewed(ru, lay)),
                                   np.asarray(ru_w), atol=1e-13)
        np.testing.assert_allclose(np.asarray(sk.from_skewed(rv, lay)),
                                   np.asarray(rv_w), atol=1e-13)

    def test_step_constant_split_matches_residual(self):
        """r(u, v) = half(u, v) + cp(up, vp) and r0 from the fused
        constant pass equal skewed_residual exactly (the r5 Newton
        loop's per-iteration residual path)."""
        grid = Grid2D(nx=12, ny=10, x_up=100.0, y_up=100.0)
        lay = sk.make_layout(grid, block=8)
        rng = np.random.default_rng(5)
        u = sk.to_skewed(jnp.asarray(
            1 + rng.uniform(size=(grid.ny, grid.nx))), lay)
        v = sk.to_skewed(jnp.asarray(
            1 + rng.uniform(size=(grid.ny, grid.nx))), lay)
        up = sk.to_skewed(jnp.asarray(
            1 + rng.uniform(size=(grid.ny, grid.nx))), lay)
        vp = sk.to_skewed(jnp.asarray(
            1 + rng.uniform(size=(grid.ny, grid.nx))), lay)
        valid = sk.valid_mask(lay, jnp.float64)
        src_sk = sk.skewed_source(lay, grid, MU[1], DT, jnp.float64)
        lbc_sk = sk.skewed_inflow_bc(lay, grid, MU[0], DT, jnp.float64)

        cp_u, cp_v, r0u, r0v = sk.skewed_step_constant(
            up, vp, DT, grid, src_sk, lbc_sk, valid)
        ru, rv = sk.skewed_residual_iter(u, v, cp_u, cp_v, DT, grid,
                                         valid)
        ru_ref, rv_ref = sk.skewed_residual(u, v, up, vp, DT, grid,
                                            lay, src_sk, lbc_sk, valid)
        np.testing.assert_allclose(np.asarray(ru), np.asarray(ru_ref),
                                   atol=1e-13)
        np.testing.assert_allclose(np.asarray(rv), np.asarray(rv_ref),
                                   atol=1e-13)
        r0u_ref, r0v_ref = sk.skewed_residual(up, vp, up, vp, DT, grid,
                                              lay, src_sk, lbc_sk,
                                              valid)
        np.testing.assert_allclose(np.asarray(r0u),
                                   np.asarray(r0u_ref), atol=1e-13)
        np.testing.assert_allclose(np.asarray(r0v),
                                   np.asarray(r0v_ref), atol=1e-13)

    def test_solve_skewed_lax_matches_wavefront(self):
        grid = Grid2D(nx=11, ny=7, x_up=100.0, y_up=100.0)
        lay = sk.make_layout(grid, block=8)
        rng = np.random.default_rng(2)
        u = jnp.asarray(1 + rng.uniform(size=(7, 11)))
        v = jnp.asarray(1 + rng.uniform(size=(7, 11)))
        fu = jnp.asarray(rng.normal(size=(7, 11)))
        fv = jnp.asarray(rng.normal(size=(7, 11)))
        du0, dv0 = solve_jacobian_wavefront(u, v, fu, fv, DT, grid)
        sdu, sdv = sk.solve_skewed_lax(
            sk.to_skewed(u, lay), sk.to_skewed(v, lay),
            sk.to_skewed(fu, lay), sk.to_skewed(fv, lay), DT, grid, lay)
        np.testing.assert_allclose(
            np.asarray(sk.from_skewed(sdu, lay)), np.asarray(du0),
            atol=1e-12)
        np.testing.assert_allclose(
            np.asarray(sk.from_skewed(sdv, lay)), np.asarray(dv0),
            atol=1e-12)


class TestPallasKernel:
    @pytest.mark.parametrize("shape", [(8, 6), (6, 8), (13, 5)])
    def test_interpret_matches_oracle(self, shape):
        nx, ny = shape
        grid = Grid2D(nx=nx, ny=ny, x_up=100.0, y_up=100.0)
        ops, xc = oracle.make_problem(nx=nx, ny=ny)
        rng = np.random.default_rng(0)
        w = 1 + rng.uniform(size=grid.state_dim)
        f = rng.normal(size=grid.state_dim)
        u, v = grid.split_fields(jnp.asarray(w))
        fu, fv = grid.split_fields(jnp.asarray(f))
        du, dv = solve_jacobian_wavefront_pallas(u, v, fu, fv, 0.07, grid,
                                                 block=8, interpret=True)
        got = np.concatenate([np.asarray(du).ravel(),
                              np.asarray(dv).ravel()])
        want = oracle.spla.spsolve(oracle.jacobian(w, 0.07, ops), f)
        rel = np.linalg.norm(got - want) / np.linalg.norm(want)
        assert rel < 5e-7   # f32 kernel

    def test_skewed_entry_matches_lax(self):
        grid = Grid2D(nx=9, ny=9, x_up=100.0, y_up=100.0)
        lay = sk.make_layout(grid, block=8)
        rng = np.random.default_rng(3)
        arrs = [sk.to_skewed(jnp.asarray(
            1 + rng.uniform(size=(9, 9)), jnp.float32), lay)
            for _ in range(4)]
        sdu, sdv = solve_skewed_pallas(*arrs, DT, grid, lay, block=8,
                                       interpret=True)
        sdu0, sdv0 = sk.solve_skewed_lax(*arrs, DT, grid, lay)
        np.testing.assert_allclose(np.asarray(sdu), np.asarray(sdu0),
                                   rtol=2e-6, atol=1e-6)


class TestSegmentedSolve:
    """Overlapping-segment wavefront chain (r5, VERDICT r4 #5): unit
    coverage beyond bench.py's final-state guard."""

    def test_pack_unpack_roundtrip(self):
        from finitedifference_tpu.ops.pallas_wavefront import (
            pack_segments,
            unpack_segments,
        )

        grid = Grid2D(nx=19, ny=11, x_up=100.0, y_up=100.0)
        lay = sk.make_layout(grid, block=8)
        rng = np.random.default_rng(7)
        s = jnp.asarray(rng.normal(size=(lay.nd_pad, lay.ny_pad)),
                        jnp.float32)
        for n_seg, overlap in [(4, 8), (3, 16)]:
            s2 = pack_segments(s, lay, n_seg, overlap)
            back = unpack_segments(s2, lay, n_seg, overlap)
            np.testing.assert_array_equal(np.asarray(back),
                                          np.asarray(s))

    def test_seg_solve_matches_exact_chain(self):
        """Truncation ~rho^overlap sits below the f32 kernel roundoff
        at the default-style overlap; segment 0 is exact."""
        from finitedifference_tpu.ops.pallas_wavefront import (
            solve_skewed_pallas_seg,
        )

        grid = Grid2D(nx=24, ny=16, x_up=100.0, y_up=100.0)
        lay = sk.make_layout(grid, block=8)
        rng = np.random.default_rng(8)
        arrs = [sk.to_skewed(jnp.asarray(
            1 + rng.uniform(size=(grid.ny, grid.nx)), jnp.float32), lay)
            for _ in range(4)]
        want_u, want_v = sk.solve_skewed_lax(*arrs, DT, grid, lay)
        got_u, got_v = solve_skewed_pallas_seg(
            *arrs, DT, grid, lay, n_seg=4, overlap=16, interpret=True)
        np.testing.assert_allclose(np.asarray(got_u),
                                   np.asarray(want_u),
                                   rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(got_v),
                                   np.asarray(want_v),
                                   rtol=2e-5, atol=2e-5)

    def test_fom_seg_engine_matches_exact_engine(self):
        """The seg= FOM path (fom.py) reproduces the exact-chain
        trajectory within the inexact-Newton tolerance it feeds."""
        grid = Grid2D(nx=16, ny=16, x_up=100.0, y_up=100.0)
        w0 = jnp.ones(grid.state_dim)
        exact = inviscid_burgers_implicit2d_skewed(
            grid, w0, DT, 10, 5.19, 0.026, use_pallas=False)
        segd = inviscid_burgers_implicit2d_skewed(
            grid, w0, DT, 10, 5.19, 0.026, use_pallas=True,
            pallas_interpret=True, seg=4, seg_overlap=16)
        rel = np.linalg.norm(np.asarray(segd.snaps)
                             - np.asarray(exact.snaps)) / \
            np.linalg.norm(np.asarray(exact.snaps))
        assert rel < 1e-5


class TestSkewedEngine:
    def test_matches_standard_engine(self):
        grid = Grid2D(nx=13, ny=9, x_up=100.0, y_up=100.0)
        w0 = jnp.ones(grid.state_dim)
        r1 = inviscid_burgers_implicit2d(grid, w0, DT, 10, MU[0], MU[1])
        r2 = inviscid_burgers_implicit2d_skewed(grid, w0, DT, 10,
                                                MU[0], MU[1],
                                                use_pallas=False)
        np.testing.assert_allclose(np.asarray(r2.snaps),
                                   np.asarray(r1.snaps), rtol=1e-12,
                                   atol=1e-13)
        assert int(r1.total_newton_its) == int(r2.total_newton_its)

    def test_mixed_precision_trajectory(self):
        """f32 inner solves + f64 Newton converge to the same f64
        trajectory (inexact Newton)."""
        grid = Grid2D(nx=16, ny=16, x_up=100.0, y_up=100.0)
        w0 = jnp.ones(grid.state_dim)
        exact = inviscid_burgers_implicit2d(grid, w0, DT, 20, 5.19, 0.026)
        mixed = inviscid_burgers_implicit2d_skewed(
            grid, w0, DT, 20, 5.19, 0.026, use_pallas=False,
            solve_dtype=jnp.float32)
        rel = np.linalg.norm(np.asarray(mixed.snaps)
                             - np.asarray(exact.snaps)) / \
            np.linalg.norm(np.asarray(exact.snaps))
        assert rel < 1e-12

    def test_vmap_over_mu(self):
        grid = Grid2D(nx=8, ny=8, x_up=100.0, y_up=100.0)
        w0 = jnp.ones(grid.state_dim)
        mus = jnp.asarray([[4.3, 0.016], [5.2, 0.028]])
        out = jax.vmap(lambda m: inviscid_burgers_implicit2d_skewed(
            grid, w0, DT, 4, m[0], m[1], use_pallas=False).snaps)(mus)
        ref = jax.vmap(lambda m: inviscid_burgers_implicit2d(
            grid, w0, DT, 4, m[0], m[1]).snaps)(mus)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-12, atol=1e-13)


class TestSweepSkewedEngine:
    def test_sweep_engine_matches(self):
        from finitedifference_tpu.parallel.sweep import sweep_fom

        grid = Grid2D(nx=8, ny=8, x_up=100.0, y_up=100.0)
        w0 = jnp.ones(grid.state_dim)
        mus = jnp.asarray([[4.4, 0.017], [5.1, 0.027]])
        std = sweep_fom(grid, w0, DT, 4, mus)
        fast = sweep_fom(grid, w0, DT, 4, mus, engine="skewed",
                         use_pallas=False)
        np.testing.assert_allclose(np.asarray(fast), np.asarray(std),
                                   rtol=1e-12, atol=1e-13)


class TestExtrapolatedGuess:
    def test_same_trajectory_fewer_newton_its(self):
        """The linear predictor 2 w_n - w_{n-1} changes only the Newton
        START point; init_norm and the relative cutoff stay defined at
        the step-start state, so the converged trajectory is unchanged
        while the O(dt^2) initial residual saves iterations."""
        grid = Grid2D(nx=32, ny=32, x_up=100.0, y_up=100.0)
        w0 = jnp.ones(grid.state_dim)
        base = inviscid_burgers_implicit2d_skewed(
            grid, w0, DT, 60, MU[0], MU[1], use_pallas=False)
        extr = inviscid_burgers_implicit2d_skewed(
            grid, w0, DT, 60, MU[0], MU[1], use_pallas=False,
            extrapolate_guess=True)
        rel = np.linalg.norm(np.asarray(extr.snaps)
                             - np.asarray(base.snaps)) / \
            np.linalg.norm(np.asarray(base.snaps))
        assert rel < 1e-12
        assert int(extr.total_newton_its) < int(base.total_newton_its)
