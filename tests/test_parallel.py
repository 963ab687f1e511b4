"""Sharding tests on the 8-device virtual CPU mesh: sharded sweeps match
single-device results; sharded spatial residual/step match dense ones."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P, NamedSharding

import oracle
from finitedifference_tpu.fom import newton_step
from finitedifference_tpu.grid import Grid2D
from finitedifference_tpu.ops.stencil import (
    burgers_residual_flat,
    inflow_bc_term,
    source_term,
)
from finitedifference_tpu.parallel.spatial import (
    make_sharded_residual,
    sharded_fom_step,
)
from finitedifference_tpu.parallel.sweep import (
    make_sweep_mesh,
    pad_to_multiple,
    sweep_fom,
    sweep_hprom,
    sweep_lspg,
    sweep_manifold,
)
from finitedifference_tpu.pod import pod

DT = 0.05


@pytest.fixture(scope="module")
def eight_devices():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return devs


class TestSweep:
    def test_sharded_fom_sweep_matches_unsharded(self, eight_devices):
        grid = Grid2D(nx=8, ny=8, x_up=100.0, y_up=100.0)
        w0 = jnp.ones(grid.state_dim)
        mus, b = pad_to_multiple(
            np.array([[4.25, 0.015], [5.5, 0.03], [4.75, 0.02]]), 8)
        mesh = make_sweep_mesh(eight_devices)
        out_sharded = sweep_fom(grid, w0, DT, 5, mus, mesh=mesh)
        out_plain = sweep_fom(grid, w0, DT, 5, mus)
        np.testing.assert_allclose(np.asarray(out_sharded)[:b],
                                   np.asarray(out_plain)[:b],
                                   rtol=1e-12, atol=1e-13)

    def test_sharded_lspg_sweep(self, eight_devices):
        grid = Grid2D(nx=8, ny=8, x_up=100.0, y_up=100.0)
        ops, xc = oracle.make_problem(nx=8, ny=8)
        w0 = np.ones(grid.state_dim)
        s = oracle.implicit_trajectory(w0, [4.25, 0.0225], DT, 10, ops, xc)
        basis = np.asarray(pod(s, num_modes=6, method="svd")[0])
        mus, b = pad_to_multiple(np.array([[4.5, 0.02], [5.0, 0.028]]), 8)
        mesh = make_sweep_mesh(eight_devices)
        red_sh = sweep_lspg(grid, jnp.asarray(w0), DT, 5, mus, basis,
                            mesh=mesh)
        red_pl = sweep_lspg(grid, jnp.asarray(w0), DT, 5, mus, basis)
        np.testing.assert_allclose(np.asarray(red_sh)[:b],
                                   np.asarray(red_pl)[:b],
                                   rtol=1e-11, atol=1e-12)

    def test_sharded_hprom_sweep(self, eight_devices):
        """Vmapped + sharded HPROM over mu matches serial ecsw_hprom."""
        from finitedifference_tpu.ecsw import (
            compute_ecsw_weights,
            ecsw_training_matrix,
        )
        from finitedifference_tpu.rom import ecsw_hprom, prepare_hprom

        grid = Grid2D(nx=10, ny=8, x_up=100.0, y_up=100.0)
        ops, xc = oracle.make_problem(nx=10, ny=8)
        w0 = np.ones(grid.state_dim)
        s = oracle.implicit_trajectory(w0, [4.25, 0.0225], DT, 15, ops, xc)
        basis = np.asarray(pod(s, num_modes=6, method="svd")[0])
        c = np.asarray(ecsw_training_matrix(
            grid, jnp.asarray(s[:, 1:15:3]), jnp.asarray(s[:, 0:14:3]),
            jnp.asarray(basis), 4.25, 0.0225, DT))
        weights = compute_ecsw_weights(c, grid, bc_w=5.0, method="nnls",
                                       rel_err_thresh=1e-4)
        smesh, sw, basis_aug = prepare_hprom(grid, weights, basis)
        y0 = jnp.asarray(basis.T @ w0)

        mus, b = pad_to_multiple(np.array([[4.5, 0.02], [5.0, 0.028],
                                           [5.19, 0.026]]), 8)
        mesh = make_sweep_mesh(eight_devices)
        red_sh = sweep_hprom(grid, smesh, sw, y0, basis_aug, DT, 8, mus,
                             mesh=mesh)
        assert red_sh.shape == (8, basis.shape[1], 9)
        for i in range(b):
            serial = ecsw_hprom(grid, smesh, sw, y0, basis_aug, DT, 8,
                                mus[i, 0], mus[i, 1]).red_coords
            np.testing.assert_allclose(np.asarray(red_sh[i]),
                                       np.asarray(serial),
                                       rtol=1e-11, atol=1e-12)

        # factored engine under the same sharded vmap (ls_method=normal
        # on both sides: identical math -> near-identical trajectories)
        red_f = sweep_hprom(grid, smesh, sw, y0, basis_aug, DT, 8, mus,
                            mesh=mesh, engine="factored",
                            ls_method="normal")
        ref_n = sweep_hprom(grid, smesh, sw, y0, basis_aug, DT, 8, mus,
                            mesh=mesh, ls_method="normal")
        np.testing.assert_allclose(np.asarray(red_f), np.asarray(ref_n),
                                   rtol=1e-8, atol=1e-10)

    def test_manifold_sweep(self, eight_devices):
        """Vmapped manifold-ROM sweep (linear decoder degenerate case)
        matches lspg_prom point-by-point."""
        from finitedifference_tpu.closures.common import manifold_decoder
        from finitedifference_tpu.rom import lspg_prom
        from finitedifference_tpu.parallel.sweep import sweep_manifold

        grid = Grid2D(nx=8, ny=8, x_up=100.0, y_up=100.0)
        ops, xc = oracle.make_problem(nx=8, ny=8)
        w0 = np.ones(grid.state_dim)
        s = oracle.implicit_trajectory(w0, [4.25, 0.0225], DT, 10, ops, xc)
        basis = np.asarray(pod(s, num_modes=5, method="svd")[0])
        decode, dec_jac = manifold_decoder(basis, None, None)
        y0 = jnp.asarray(basis.T @ w0)
        mus = np.array([[4.5, 0.02], [5.0, 0.028]])
        red = sweep_manifold(grid, y0, decode, dec_jac, DT, 6, mus)
        for i in range(2):
            want = lspg_prom(grid, jnp.asarray(w0), DT, 6, mus[i, 0],
                             mus[i, 1], jnp.asarray(basis)).red_coords
            np.testing.assert_allclose(np.asarray(red[i]),
                                       np.asarray(want),
                                       rtol=1e-10, atol=1e-11)

    def test_pad_to_multiple(self):
        mus, b = pad_to_multiple(np.ones((3, 2)), 8)
        assert mus.shape == (8, 2) and b == 3
        mus, b = pad_to_multiple(np.ones((8, 2)), 8)
        assert mus.shape == (8, 2)


class TestSpatial:
    def test_sharded_residual_matches_dense(self, eight_devices):
        grid = Grid2D(nx=12, ny=16, x_up=100.0, y_up=100.0)
        mesh = Mesh(np.asarray(eight_devices), ("sp",))
        mu1, mu2 = 4.75, 0.02
        rng = np.random.default_rng(0)
        u = 1 + rng.uniform(size=(16, 12))
        v = 1 + rng.uniform(size=(16, 12))
        up = 1 + rng.uniform(size=(16, 12))
        vp = 1 + rng.uniform(size=(16, 12))
        src = source_term(grid, mu2, DT, dtype=jnp.float64)
        lbc = inflow_bc_term(grid, mu1, DT, dtype=jnp.float64)

        f = make_sharded_residual(mesh, grid, DT)
        ru, rv = f(jnp.asarray(u), jnp.asarray(v), jnp.asarray(up),
                   jnp.asarray(vp), src, lbc)
        w = np.concatenate([u.ravel(), v.ravel()])
        wp = np.concatenate([up.ravel(), vp.ravel()])
        want = burgers_residual_flat(jnp.asarray(w), jnp.asarray(wp),
                                     mu1, mu2, DT, grid)
        got = np.concatenate([np.asarray(ru).ravel(),
                              np.asarray(rv).ravel()])
        np.testing.assert_allclose(got, np.asarray(want), atol=1e-13)

    def test_sharded_step_matches_dense_newton(self, eight_devices):
        grid = Grid2D(nx=8, ny=16, x_up=100.0, y_up=100.0)
        mesh = Mesh(np.asarray(eight_devices), ("sp",))
        mu1, mu2 = 4.75, 0.02
        wp = jnp.ones(grid.state_dim)
        dense = newton_step(wp, mu1, mu2, DT, grid)

        step = sharded_fom_step(mesh, grid, DT, num_sweeps=24)
        src = source_term(grid, mu2, DT, dtype=jnp.float64)
        lbc = inflow_bc_term(grid, mu1, DT, dtype=jnp.float64)
        up, vp = grid.split_fields(wp)
        u, v = step(up, vp, src, lbc)
        got = np.asarray(grid.merge_fields(u, v))
        np.testing.assert_allclose(got, np.asarray(dense.w), rtol=1e-10,
                                   atol=1e-11)

    def test_multi_step_trajectory(self, eight_devices):
        """March several sharded steps; compare against the oracle."""
        grid = Grid2D(nx=8, ny=8, x_up=100.0, y_up=100.0)
        ops, xc = oracle.make_problem(nx=8, ny=8)
        mesh = Mesh(np.asarray(eight_devices), ("sp",))
        mu1, mu2 = 5.19, 0.026
        step = sharded_fom_step(mesh, grid, DT, num_sweeps=16)
        src = source_term(grid, mu2, DT, dtype=jnp.float64)
        lbc = inflow_bc_term(grid, mu1, DT, dtype=jnp.float64)
        u = jnp.ones((8, 8), jnp.float64)
        v = jnp.ones((8, 8), jnp.float64)
        for _ in range(5):
            u, v = step(u, v, src, lbc)
        got = np.asarray(grid.merge_fields(u, v))
        want = oracle.implicit_trajectory(
            np.ones(grid.state_dim), [mu1, mu2], DT, 5, ops, xc)[:, -1]
        np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-10)


class TestShardedSkewed:
    def test_matches_single_chip_skewed(self, eight_devices):
        """Row-sharded skewed trajectory == the single-chip skewed
        engine BITWISE-adjacent (same layout, same recurrence, same
        stopping rules; only the residual-norm reduction order
        differs)."""
        from finitedifference_tpu.fom import (
            inviscid_burgers_implicit2d_skewed,
        )
        from finitedifference_tpu.parallel.spatial import (
            sharded_skewed_fom,
        )

        grid = Grid2D(nx=24, ny=16, x_up=100.0, y_up=100.0)
        w0 = jnp.ones(grid.state_dim, jnp.float64)
        mesh = Mesh(np.asarray(eight_devices), ("sp",))
        snaps, its = sharded_skewed_fom(mesh, grid, w0, DT, 20,
                                        4.75, 0.02)
        ref = inviscid_burgers_implicit2d_skewed(
            grid, w0, DT, 20, 4.75, 0.02, use_pallas=False)
        np.testing.assert_allclose(np.asarray(snaps),
                                   np.asarray(ref.snaps),
                                   rtol=1e-12, atol=1e-13)
        assert int(its) == int(ref.total_newton_its)

    def test_matches_oracle(self, eight_devices):
        """Sharded skewed trajectory vs the independent scipy oracle."""
        from finitedifference_tpu.parallel.spatial import (
            sharded_skewed_fom,
        )

        grid = Grid2D(nx=16, ny=16, x_up=100.0, y_up=100.0)
        ops, xc = oracle.make_problem(nx=16, ny=16)
        w0 = np.ones(grid.state_dim)
        mesh = Mesh(np.asarray(eight_devices), ("sp",))
        snaps, _ = sharded_skewed_fom(mesh, grid,
                                      jnp.asarray(w0), DT, 10,
                                      5.19, 0.026)
        want = oracle.implicit_trajectory(w0, [5.19, 0.026], DT, 10,
                                          ops, xc)
        np.testing.assert_allclose(np.asarray(snaps), want,
                                   rtol=1e-9, atol=1e-10)

    @pytest.mark.skipif(
        os.environ.get("FDTPU_SLOW", "") != "1",
        reason="canonical 250^2 x 500-step sharded run (~minutes); "
               "set FDTPU_SLOW=1 (VERDICT r3 #3a)")
    def test_canonical_250_trajectory(self, eight_devices):
        """The canonical 250^2, 500-step trajectory, spatially sharded,
        vs the dense single-device skewed engine."""
        from finitedifference_tpu.fom import (
            inviscid_burgers_implicit2d_skewed,
        )
        from finitedifference_tpu.parallel.spatial import (
            sharded_skewed_fom,
        )

        grid = Grid2D(nx=250, ny=250, x_up=100.0, y_up=100.0)
        w0 = jnp.ones(grid.state_dim, jnp.float64)
        mesh = Mesh(np.asarray(eight_devices), ("sp",))
        snaps, its = sharded_skewed_fom(mesh, grid, w0, DT, 500,
                                        4.75, 0.02,
                                        snaps_dtype=jnp.float32)
        ref = inviscid_burgers_implicit2d_skewed(
            grid, w0, DT, 500, 4.75, 0.02, use_pallas=False,
            snaps_dtype=jnp.float32)
        rel = (np.linalg.norm(np.asarray(snaps)
                              - np.asarray(ref.snaps))
               / np.linalg.norm(np.asarray(ref.snaps)))
        assert rel < 1e-10
        assert int(its) == int(ref.total_newton_its)


class TestShardedFactoredHPROM:
    def test_matches_unsharded(self, eight_devices):
        """Sample-axis-sharded factored HPROM (one solve over 8
        devices, psum-assembled Gram) == the unsharded engine."""
        from finitedifference_tpu.ecsw import (
            compute_ecsw_weights,
            ecsw_training_matrix,
        )
        from finitedifference_tpu.parallel.sweep import (
            make_sweep_mesh,
            sharded_factored_hprom,
        )
        from finitedifference_tpu.rom import prepare_hprom
        from finitedifference_tpu.rom_factored import (
            factored_hprom,
            precompute_factored_blocks,
        )

        grid = Grid2D(nx=10, ny=8, x_up=100.0, y_up=100.0)
        ops, xc = oracle.make_problem(nx=10, ny=8)
        w0 = np.ones(grid.state_dim)
        s = oracle.implicit_trajectory(w0, [4.25, 0.0225], DT, 15, ops,
                                       xc)
        basis = np.asarray(pod(s, num_modes=6, method="svd")[0])
        c = np.asarray(ecsw_training_matrix(
            grid, jnp.asarray(s[:, 1:15:3]), jnp.asarray(s[:, 0:14:3]),
            jnp.asarray(basis), 4.25, 0.0225, DT))
        weights = compute_ecsw_weights(c, grid, bc_w=5.0, method="nnls",
                                       rel_err_thresh=1e-4)
        smesh, sw, basis_aug = prepare_hprom(grid, weights, basis)
        y0 = jnp.asarray(basis.T @ w0)

        blocks = precompute_factored_blocks(smesh, basis_aug)
        ref = factored_hprom(grid, smesh, sw, y0, blocks, DT, 12,
                             5.0, 0.024, ls_method="normal")
        mesh = make_sweep_mesh(eight_devices, axis_name="sp")
        got = sharded_factored_hprom(
            grid, smesh, sw, y0, basis_aug, DT, 12, 5.0, 0.024,
            mesh=mesh, ls_method="normal")
        np.testing.assert_allclose(np.asarray(got.red_coords),
                                   np.asarray(ref.red_coords),
                                   rtol=1e-9, atol=1e-11)
        assert int(got.total_gn_its) == int(ref.total_gn_its)

    def test_full_mesh_unit_weights_is_sharded_prom(self, eight_devices):
        """Unit weights on ALL cells turn the sharded factored engine
        into a row-sharded LSPG PROM (multi-chip PROM for the fine-grid
        memory wall): must match lspg_prom."""
        from finitedifference_tpu.parallel.sweep import (
            make_sweep_mesh,
            sharded_factored_hprom,
        )
        from finitedifference_tpu.rom import lspg_prom, prepare_hprom

        grid = Grid2D(nx=10, ny=8, x_up=100.0, y_up=100.0)
        ops, xc = oracle.make_problem(nx=10, ny=8)
        w0 = np.ones(grid.state_dim)
        s = oracle.implicit_trajectory(w0, [4.25, 0.0225], DT, 15, ops,
                                       xc)
        basis = np.asarray(pod(s, num_modes=6, method="svd")[0])
        weights = np.ones(grid.n_cells)
        smesh, sw, basis_aug = prepare_hprom(grid, weights, basis)
        y0 = jnp.asarray(basis.T @ w0)

        ref = lspg_prom(grid, jnp.asarray(w0), DT, 10, 5.0, 0.024,
                        jnp.asarray(basis),
                        ls_method="normal").red_coords
        mesh = make_sweep_mesh(eight_devices, axis_name="sp")
        got = sharded_factored_hprom(
            grid, smesh, sw, y0, basis_aug, DT, 10, 5.0, 0.024,
            mesh=mesh, ls_method="normal")
        np.testing.assert_allclose(np.asarray(got.red_coords),
                                   np.asarray(ref),
                                   rtol=1e-9, atol=1e-11)
