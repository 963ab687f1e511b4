"""Fused Pallas Gauss-Newton system (ops/pallas_gn.py) — interpret-mode
correctness on CPU: the kernel's (k+1, k+1) Gram extension must match an
independently assembled [W.JV | W.r]^T [W.JV | W.r] from the sampled-op
reference path, and the pallas_hprom trajectory must match the generic
ecsw_hprom at f32."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_rom import DT, MU, setup_problem


@pytest.fixture(scope="module")
def mesh_problem():
    from finitedifference_tpu.rom import prepare_hprom

    grid, ops, xc, w0, basis = setup_problem(num_steps=12)
    rng = np.random.default_rng(7)
    weights = np.zeros(grid.n_cells)
    chosen = rng.choice(grid.n_cells, size=40, replace=False)
    weights[chosen] = 1.0 + rng.uniform(size=40)
    mesh, sw, basis_aug = prepare_hprom(grid, weights, basis)
    y0 = jnp.asarray(basis.T @ w0)
    return grid, mesh, sw, y0, basis_aug


def test_gn_system_matches_sampled_ops(mesh_problem):
    """gext from the kernel == the brute-force normal-equations build
    from sampled_residual / sampled_jacobian_times_basis."""
    from finitedifference_tpu.ops.pallas_gn import (
        KP,
        gn_system_pallas,
        pad_factored_inputs,
    )
    from finitedifference_tpu.ops.sampled import (
        sampled_inflow_bc,
        sampled_jacobian_times_basis,
        sampled_residual,
        sampled_source,
    )
    from finitedifference_tpu.rom_factored import (
        precompute_factored_blocks,
    )

    grid, mesh, sw, y0, basis_aug = mesh_problem
    f32 = jnp.float32
    ba = jnp.asarray(basis_aug, f32)
    blocks = precompute_factored_blocks(mesh, ba)
    p6p, wgt_p = pad_factored_inputs(blocks.p6, sw, tile=8)
    n_s, k = mesh.n_sample, int(y0.shape[0])
    n_p = p6p.shape[1]
    hdx = float(0.5 * DT / grid.dx)
    hdy = float(0.5 * DT / grid.dy)

    rng = np.random.default_rng(3)
    y = jnp.asarray(np.asarray(y0, np.float32)
                    + 0.01 * rng.normal(size=k).astype(np.float32))
    yp = jnp.asarray(np.asarray(y0, np.float32))

    # reference assembly from the sampled ops (f32)
    w_aug = (ba @ y).astype(f32)
    wp_aug = (ba @ yp).astype(f32)
    r = sampled_residual(w_aug, wp_aug, MU[0], MU[1], DT, grid, mesh)
    jv = sampled_jacobian_times_basis(w_aug, ba, DT, grid, mesh)
    w2 = jnp.concatenate((sw, sw)).astype(f32)
    a = jnp.concatenate((w2[:, None] * jv, (w2 * r)[:, None]), axis=1)
    ref = np.zeros((KP, KP), np.float32)
    ref[: k + 1, : k + 1] = np.asarray(a.T @ a)

    # per-step constants exactly as pallas_hprom builds them
    p_flat = np.asarray(p6p).reshape(6 * n_p, KP)
    sp = (p_flat @ np.pad(np.asarray(yp), (0, KP - k))).reshape(6, n_p)
    qdx, qdy = 0.5 * hdx, 0.5 * hdy
    src = np.pad(np.asarray(
        sampled_source(mesh, grid, MU[1], DT, f32)), (0, n_p - n_s))
    lbc = np.pad(np.asarray(
        sampled_inflow_bc(mesh, grid, MU[0], DT, f32)), (0, n_p - n_s))
    fuv = sp[0] * sp[3]
    ru_f = qdx * (sp[0] ** 2 - sp[1] ** 2) + qdy * (fuv - sp[2] * sp[5])
    rv_f = qdy * (sp[3] ** 2 - sp[5] ** 2) + qdx * (fuv - sp[1] * sp[4])
    cp = np.stack((-sp[0] + ru_f - src - lbc, -sp[3] + rv_f), axis=1)

    gext = gn_system_pallas(p6p, y, jnp.asarray(cp, f32), wgt_p, k,
                            hdx, hdy, tile=8, interpret=True)
    np.testing.assert_allclose(np.asarray(gext), ref,
                               rtol=2e-4, atol=2e-5)


def test_pallas_hprom_matches_generic(mesh_problem):
    """Full trajectory parity vs rom.ecsw_hprom at f32 (interpret)."""
    from finitedifference_tpu.rom import ecsw_hprom
    from finitedifference_tpu.rom_factored import (
        pallas_hprom,
        precompute_factored_blocks,
        precompute_pallas_system,
    )

    grid, mesh, sw, y0, basis_aug = mesh_problem
    f32 = jnp.float32
    steps = 12
    ba = jnp.asarray(basis_aug, f32)
    y0f = jnp.asarray(y0, f32)
    swf = sw.astype(f32)

    ref = ecsw_hprom(grid, mesh, swf, y0f, ba, DT, steps, MU[0], MU[1],
                     ls_method="normal")

    blocks = precompute_factored_blocks(mesh, ba)
    p6p, wgt_p = precompute_pallas_system(blocks, swf, tile=8)
    res = pallas_hprom(grid, mesh, p6p, wgt_p, y0f, DT, steps,
                       MU[0], MU[1], tile=8, interpret=True)
    np.testing.assert_allclose(np.asarray(res.red_coords),
                               np.asarray(ref.red_coords),
                               rtol=5e-4, atol=5e-6)


def test_pallas_hprom_unrolled(mesh_problem):
    """unroll_its budget >= dynamic loop -> same trajectory."""
    from finitedifference_tpu.rom_factored import (
        pallas_hprom,
        precompute_factored_blocks,
        precompute_pallas_system,
    )

    grid, mesh, sw, y0, basis_aug = mesh_problem
    f32 = jnp.float32
    steps = 8
    ba = jnp.asarray(basis_aug, f32)
    y0f = jnp.asarray(y0, f32)
    swf = sw.astype(f32)
    blocks = precompute_factored_blocks(mesh, ba)
    p6p, wgt_p = precompute_pallas_system(blocks, swf, tile=8)
    a = pallas_hprom(grid, mesh, p6p, wgt_p, y0f, DT, steps,
                     MU[0], MU[1], tile=8, interpret=True)
    b = pallas_hprom(grid, mesh, p6p, wgt_p, y0f, DT, steps,
                     MU[0], MU[1], unroll_its=20, tile=8,
                     interpret=True)
    np.testing.assert_allclose(np.asarray(b.red_coords),
                               np.asarray(a.red_coords),
                               rtol=1e-6, atol=1e-8)
    assert int(b.total_gn_its) == int(a.total_gn_its)


def test_gn_step_fused_matches_system_plus_cholesky(mesh_problem):
    """One fused step (in-VMEM CG epilogue) == system kernel + host
    Cholesky, at CG-convergence accuracy: the tight correctness anchor
    for ls_method='fused'."""
    from jax.scipy.linalg import cho_factor, cho_solve

    from finitedifference_tpu.ops.pallas_gn import (
        gn_step_pallas,
        gn_system_pallas,
    )
    from finitedifference_tpu.rom_factored import (
        precompute_factored_blocks,
        precompute_pallas_system,
    )

    grid, mesh, sw, y0, basis_aug = mesh_problem
    f32 = jnp.float32
    ba = jnp.asarray(basis_aug, f32)
    y0f = jnp.asarray(y0, f32)
    blocks = precompute_factored_blocks(mesh, ba)
    p6p, wgt_p = precompute_pallas_system(blocks, sw.astype(f32),
                                          tile=8)
    k = int(y0f.shape[0])
    n_p = p6p.shape[1]
    hdx = float(0.5 * DT / grid.dx)
    hdy = float(0.5 * DT / grid.dy)
    rng = np.random.default_rng(5)
    cp = jnp.asarray(0.01 * rng.normal(size=(n_p, 2)), f32)
    y = y0f + 0.01 * jnp.asarray(rng.normal(size=k), f32)

    gext = np.asarray(gn_system_pallas(p6p, y, cp, wgt_p, k, hdx, hdy,
                                       tile=8, interpret=True))
    dy_ref = np.asarray(cho_solve(cho_factor(gext[:k, :k]),
                                  -gext[:k, k]))
    rn_ref = float(np.sqrt(gext[k, k]))
    dy, rn = gn_step_pallas(p6p, y, cp, wgt_p, k, hdx, hdy, tile=8,
                            interpret=True)
    assert abs(float(rn) - rn_ref) <= 1e-5 * rn_ref
    scale = np.abs(dy_ref).max()
    np.testing.assert_allclose(np.asarray(dy), dy_ref,
                               rtol=1e-3, atol=1e-4 * scale)


def test_pallas_hprom_fused_solve(mesh_problem):
    """ls_method='fused' trajectory stays close to the two-kernel
    pallas path. Loose tolerance: the fused path solves by CG and the
    reference by Cholesky — a borderline stagnation-stop decision can
    legitimately flip, so only trajectory-level agreement is required
    (the tight per-step anchor is the test above)."""
    from finitedifference_tpu.rom_factored import (
        pallas_hprom,
        precompute_factored_blocks,
        precompute_pallas_system,
    )

    grid, mesh, sw, y0, basis_aug = mesh_problem
    f32 = jnp.float32
    steps = 8
    ba = jnp.asarray(basis_aug, f32)
    y0f = jnp.asarray(y0, f32)
    swf = sw.astype(f32)
    blocks = precompute_factored_blocks(mesh, ba)
    p6p, wgt_p = precompute_pallas_system(blocks, swf, tile=8)
    a = pallas_hprom(grid, mesh, p6p, wgt_p, y0f, DT, steps,
                     MU[0], MU[1], tile=8, interpret=True)
    b = pallas_hprom(grid, mesh, p6p, wgt_p, y0f, DT, steps,
                     MU[0], MU[1], ls_method="fused", tile=8,
                     interpret=True)
    rel = np.linalg.norm(np.asarray(b.red_coords)
                         - np.asarray(a.red_coords)) / \
        np.linalg.norm(np.asarray(a.red_coords))
    assert rel < 5e-3


def test_pallas_traj_matches_factored_unrolled(mesh_problem):
    """Whole-trajectory kernel (ONE dispatch for all steps) == the
    factored engine with the same unrolled-GN/CG configuration."""
    from finitedifference_tpu.rom_factored import (
        factored_hprom,
        pallas_traj_hprom,
        precompute_factored_blocks,
        precompute_pallas_system,
    )

    grid, mesh, sw, y0, basis_aug = mesh_problem
    f32 = jnp.float32
    steps = 12
    ba = jnp.asarray(basis_aug, f32)
    y0f = jnp.asarray(y0, f32)
    swf = sw.astype(f32)
    blocks = precompute_factored_blocks(mesh, ba)
    ref = factored_hprom(grid, mesh, swf, y0f, blocks, DT, steps,
                         MU[0], MU[1], unroll_its=3, ls_method="cg")
    p6p, wgt_p = precompute_pallas_system(blocks, swf, tile=8)
    res = pallas_traj_hprom(grid, mesh, p6p, wgt_p, y0f, DT, steps,
                            MU[0], MU[1], unroll_its=3, interpret=True)
    rel = np.linalg.norm(np.asarray(res.red_coords)
                         - np.asarray(ref.red_coords)) / \
        np.linalg.norm(np.asarray(ref.red_coords))
    assert rel < 1e-5
    assert int(res.total_gn_its) == int(ref.total_gn_its)


def test_pallas_traj_sweep_matches_per_point(mesh_problem):
    """engine='pallas_traj' in sweep_hprom: the vmapped whole-trajectory
    kernel equals per-point runs (mu enters only via the source/BC
    input, so vmap batches into the kernel grid)."""
    from finitedifference_tpu.parallel.sweep import sweep_hprom
    from finitedifference_tpu.rom_factored import (
        pallas_traj_hprom,
        precompute_factored_blocks,
        precompute_pallas_system,
    )

    grid, mesh, sw, y0, basis_aug = mesh_problem
    f32 = jnp.float32
    steps = 8
    ba = jnp.asarray(basis_aug, f32)
    y0f = jnp.asarray(y0, f32)
    swf = sw.astype(f32)
    mus = jnp.asarray([[4.5, 0.018], [5.0, 0.025]], f32)
    out = sweep_hprom(grid, mesh, swf, y0f, ba, DT, steps, mus,
                      engine="pallas_traj", unroll_its=3,
                      interpret=True)
    blocks = precompute_factored_blocks(mesh, ba)
    p6p, wgt_p = precompute_pallas_system(blocks, swf)
    for i in range(2):
        ref = pallas_traj_hprom(grid, mesh, p6p, wgt_p, y0f, DT, steps,
                                float(mus[i, 0]), float(mus[i, 1]),
                                unroll_its=3, interpret=True)
        np.testing.assert_allclose(np.asarray(out[i]),
                                   np.asarray(ref.red_coords),
                                   rtol=1e-6, atol=1e-8)


def test_multitile_lane_axis_k150():
    """k=150 pads the mode axis to 256 lanes (two lane tiles): the
    fused system kernel and the whole-trajectory kernel must match the
    generic ecsw_hprom on a 150-column basis — the 150-mode fine-grid
    campaign's configuration, which the old hard KP=128 cap rejected.

    Needs its own grid: the sampled Gauss-Newton is well-posed only
    when 2 * n_sample > k + 1 (the fixture's 40-cell mesh gives a rank-
    deficient Gram at k=150 and every solver disagrees on the null
    space)."""
    from finitedifference_tpu.grid import Grid2D
    from finitedifference_tpu.rom import ecsw_hprom, prepare_hprom
    from finitedifference_tpu.rom_factored import (
        pallas_hprom,
        pallas_traj_hprom,
        precompute_factored_blocks,
        precompute_pallas_system,
    )

    grid = Grid2D(nx=24, ny=24, x_up=100.0, y_up=100.0)
    k, steps = 150, 6
    rng = np.random.default_rng(11)
    # random orthonormal 150-mode basis over the (2 * n_cells) state
    q, _ = np.linalg.qr(rng.normal(size=(grid.state_dim, k)))
    weights = np.zeros(grid.n_cells)
    chosen = rng.choice(grid.n_cells, size=220, replace=False)
    weights[chosen] = 1.0 + rng.uniform(size=220)
    mesh, sw, basis_aug = prepare_hprom(grid, weights, q)

    f32 = jnp.float32
    ba = jnp.asarray(basis_aug, f32)
    w0 = np.ones(grid.state_dim)
    y0f = jnp.asarray(q.T @ w0, f32)
    swf = sw.astype(f32)

    ref = ecsw_hprom(grid, mesh, swf, y0f, ba, DT, steps, MU[0], MU[1],
                     ls_method="normal")

    blocks = precompute_factored_blocks(mesh, ba)
    p6p, wgt_p = precompute_pallas_system(blocks, swf, tile=8)
    assert p6p.shape[2] == 256  # two lane tiles

    res = pallas_hprom(grid, mesh, p6p, wgt_p, y0f, DT, steps,
                       MU[0], MU[1], tile=8, interpret=True)
    np.testing.assert_allclose(np.asarray(res.red_coords),
                               np.asarray(ref.red_coords),
                               rtol=5e-4, atol=5e-6)

    traj = pallas_traj_hprom(grid, mesh, p6p, wgt_p, y0f, DT, steps,
                             MU[0], MU[1], unroll_its=3, interpret=True)
    rel = np.linalg.norm(np.asarray(traj.red_coords)
                         - np.asarray(ref.red_coords)) / \
        np.linalg.norm(np.asarray(ref.red_coords))
    assert rel < 1e-4
