"""Validate stencil ops, wavefront solve, Newton and FOM trajectories
against the independent scipy sparse oracle (tests/oracle.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import oracle
from finitedifference_tpu.fom import (
    inviscid_burgers_explicit2d,
    inviscid_burgers_implicit2d,
    newton_step,
)
from finitedifference_tpu.grid import Grid2D
from finitedifference_tpu.ops.stencil import (
    apply_jacobian_flat,
    burgers_residual_flat,
    jacobian_times_basis,
)
from finitedifference_tpu.ops.wavefront import (
    skew,
    solve_jacobian_flat,
    solve_jacobian_sweeps,
    unskew,
)

MU = [4.75, 0.02]
DT = 0.07


def make_grid(nx=8, ny=6):
    # non-square on purpose: catches x/y-axis mixups
    grid = Grid2D(nx=nx, ny=ny, x_up=100.0, y_up=100.0)
    ops, xc = oracle.make_problem(nx=nx, ny=ny)
    return grid, ops, xc


def rand_state(rng, n):
    return 1.0 + rng.uniform(size=2 * n)


class TestResidual:
    def test_matches_oracle(self):
        grid, ops, xc = make_grid()
        rng = np.random.default_rng(0)
        w = rand_state(rng, grid.n_cells)
        wp = rand_state(rng, grid.n_cells)
        got = burgers_residual_flat(
            jnp.asarray(w), jnp.asarray(wp), MU[0], MU[1], DT, grid
        )
        want = oracle.residual(w, wp, MU, DT, ops, xc)
        np.testing.assert_allclose(np.asarray(got), want, rtol=0, atol=1e-13)

    def test_zero_when_steady(self):
        # with no source/BC drive, w == wp == const is a fixed point only
        # for the interior part; just check residual is finite and the
        # time-derivative part vanishes: r(w, w) has no (w - wp) term.
        grid, ops, xc = make_grid()
        w = np.ones(grid.state_dim)
        r_jax = np.asarray(
            burgers_residual_flat(jnp.asarray(w), jnp.asarray(w),
                                  MU[0], MU[1], DT, grid)
        )
        r_orc = oracle.residual(w, w, MU, DT, ops, xc)
        np.testing.assert_allclose(r_jax, r_orc, atol=1e-14)


class TestJacobian:
    def test_matvec_matches_oracle(self):
        grid, ops, xc = make_grid()
        rng = np.random.default_rng(1)
        w = rand_state(rng, grid.n_cells)
        dw = rng.normal(size=grid.state_dim)
        got = apply_jacobian_flat(jnp.asarray(w), jnp.asarray(dw), DT, grid)
        want = oracle.jacobian(w, DT, ops) @ dw
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-13)

    def test_matches_jvp_of_residual(self):
        """The hand-written linearization equals jax.jvp of the residual."""
        grid, _, _ = make_grid()
        rng = np.random.default_rng(2)
        w = jnp.asarray(rand_state(rng, grid.n_cells))
        wp = jnp.asarray(rand_state(rng, grid.n_cells))
        dw = jnp.asarray(rng.normal(size=grid.state_dim))
        f = lambda x: burgers_residual_flat(x, wp, MU[0], MU[1], DT, grid)
        _, jvp = jax.jvp(f, (w,), (dw,))
        got = apply_jacobian_flat(w, dw, DT, grid)
        np.testing.assert_allclose(np.asarray(got), np.asarray(jvp),
                                   atol=1e-13)

    def test_times_basis(self):
        grid, ops, _ = make_grid()
        rng = np.random.default_rng(3)
        w = rand_state(rng, grid.n_cells)
        V = rng.normal(size=(grid.state_dim, 7))
        got = jacobian_times_basis(jnp.asarray(w), jnp.asarray(V), DT, grid)
        want = oracle.jacobian(w, DT, ops) @ V
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-13)


class TestWavefront:
    def test_skew_roundtrip(self):
        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.normal(size=(6, 8)))
        s = skew(x, 6, 8)
        assert s.shape == (13, 6)
        np.testing.assert_array_equal(np.asarray(unskew(s, 6, 8)),
                                      np.asarray(x))

    @pytest.mark.parametrize("shape", [(8, 6), (6, 8), (5, 5), (1, 7), (7, 1)])
    def test_exact_solve(self, shape):
        nx, ny = shape
        grid, ops, xc = make_grid(nx=nx, ny=ny)
        rng = np.random.default_rng(5)
        w = rand_state(rng, grid.n_cells)
        f = rng.normal(size=grid.state_dim)
        got = solve_jacobian_flat(jnp.asarray(w), jnp.asarray(f), DT, grid)
        J = oracle.jacobian(w, DT, ops)
        want = oracle.spla.spsolve(J, f)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-12,
                                   atol=1e-13)

    def test_sweeps_solve(self):
        grid, ops, xc = make_grid()
        rng = np.random.default_rng(6)
        w = rand_state(rng, grid.n_cells)
        f = rng.normal(size=grid.state_dim)
        u, v = grid.split_fields(jnp.asarray(w))
        fu, fv = grid.split_fields(jnp.asarray(f))
        du, dv = solve_jacobian_sweeps(u, v, fu, fv, DT, grid)
        got = np.asarray(grid.merge_fields(du, dv))
        want = oracle.spla.spsolve(oracle.jacobian(w, DT, ops), f)
        np.testing.assert_allclose(got, want, rtol=1e-11, atol=1e-12)


class TestNewton:
    def test_single_step_matches_oracle(self):
        grid, ops, xc = make_grid()
        wp = np.ones(grid.state_dim)
        out = newton_step(jnp.asarray(wp), MU[0], MU[1], DT, grid)
        want, its = oracle.newton(wp, MU, DT, ops, xc)
        np.testing.assert_allclose(np.asarray(out.w), want, rtol=1e-11,
                                   atol=1e-12)
        assert int(out.num_its) == its

    def test_converges_to_tiny_residual(self):
        grid, _, _ = make_grid()
        wp = jnp.ones(grid.state_dim)
        out = newton_step(wp, MU[0], MU[1], DT, grid)
        assert float(out.resnorm / out.init_norm) < 1e-12


class TestTrajectories:
    def test_implicit_matches_oracle(self):
        grid, ops, xc = make_grid(nx=8, ny=6)
        w0 = np.ones(grid.state_dim)
        steps = 12
        res = inviscid_burgers_implicit2d(grid, jnp.asarray(w0), DT, steps,
                                          MU[0], MU[1])
        want = oracle.implicit_trajectory(w0, MU, DT, steps, ops, xc)
        rel = np.linalg.norm(np.asarray(res.snaps) - want) / \
            np.linalg.norm(want)
        assert rel < 1e-10
        # converged runs surface a sub-cutoff worst relative residual
        assert float(res.max_final_relnorm) < 1e-12

    def test_unconverged_newton_is_surfaced(self):
        # starve Newton of iterations: the final relative residual must
        # be reported above the cutoff instead of silently accepted
        grid, _, _ = make_grid(nx=8, ny=6)
        w0 = jnp.ones(grid.state_dim)
        res = inviscid_burgers_implicit2d(grid, w0, DT, 3, MU[0], MU[1],
                                          max_its=1)
        assert float(res.max_final_relnorm) > 1e-12

    def test_implicit_sweeps_solver(self):
        grid, ops, xc = make_grid(nx=6, ny=6)
        w0 = np.ones(grid.state_dim)
        res = inviscid_burgers_implicit2d(grid, jnp.asarray(w0), DT, 5,
                                          MU[0], MU[1],
                                          linear_solver="sweeps")
        want = oracle.implicit_trajectory(w0, MU, DT, 5, ops, xc)
        rel = np.linalg.norm(np.asarray(res.snaps) - want) / \
            np.linalg.norm(want)
        assert rel < 1e-10

    def test_explicit_matches_oracle(self):
        grid, ops, xc = make_grid(nx=8, ny=6)
        w0 = np.ones(grid.state_dim)
        dt_small = 0.01  # explicit needs small CFL
        got = inviscid_burgers_explicit2d(grid, jnp.asarray(w0), dt_small,
                                          20, MU[0], MU[1])
        want = oracle.explicit_trajectory(w0, MU, dt_small, 20, ops, xc)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-12,
                                   atol=1e-12)

    def test_vmap_over_mu(self):
        """The whole implicit stepper vmaps over the parameter vector."""
        grid, ops, xc = make_grid(nx=6, ny=5)
        w0 = jnp.ones(grid.state_dim)
        mus = np.array([[4.25, 0.015], [5.5, 0.03], [4.75, 0.02]])

        def run(mu):
            return inviscid_burgers_implicit2d(grid, w0, DT, 4,
                                               mu[0], mu[1]).snaps

        batched = jax.vmap(run)(jnp.asarray(mus))
        for i, mu in enumerate(mus):
            want = oracle.implicit_trajectory(
                np.ones(grid.state_dim), list(mu), DT, 4, ops, xc)
            rel = np.linalg.norm(np.asarray(batched[i]) - want) / \
                np.linalg.norm(want)
            assert rel < 1e-10
