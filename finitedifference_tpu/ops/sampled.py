"""Sampled-mesh (hyper-reduced) stencil operators.

The reference restricts its sparse operators to ECSW-selected rows and an
"augmented" column set (each sampled cell plus its west and south
neighbors — the upwind stencil's support), via scipy fancy indexing
(inviscid_burgers_res2D_ecsw / _exact_jac2D_ecsw, hypernet2D.py:2572-2668,
generate_augmented_mesh :2446-2466).

Here the restriction is a set of precomputed integer gather maps: for
each sampled cell, the positions of itself and its west/south neighbors
inside the augmented array. The sampled residual / J@V are then pure
gathers + elementwise ops on vectors of length n_sampled — tiny, static
shapes, jit/vmap-friendly.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from finitedifference_tpu.grid import Grid2D


class SampledMesh(NamedTuple):
    """Static gather maps for a hyper-reduced mesh (device arrays)."""
    sample_cells: jnp.ndarray   # (n_s,) int32, sorted cell indices
    aug_cells: jnp.ndarray      # (n_z,) int32, sorted augmented cell indices
    pos_self: jnp.ndarray       # (n_s,) index of each sample in aug_cells
    pos_west: jnp.ndarray       # (n_s,) index of west neighbor (0 if none)
    pos_south: jnp.ndarray      # (n_s,) index of south neighbor (0 if none)
    has_west: jnp.ndarray       # (n_s,) bool — False on the x=0 column
    has_south: jnp.ndarray      # (n_s,) bool — False on the y=0 row
    col_x: jnp.ndarray          # (n_s,) x-column of each sample (source term)
    is_left: jnp.ndarray        # (n_s,) bool — sample on the inflow column

    @property
    def n_sample(self) -> int:
        return self.sample_cells.shape[0]

    @property
    def n_aug(self) -> int:
        return self.aug_cells.shape[0]


def generate_augmented_mesh(grid: Grid2D, sample_inds) -> np.ndarray:
    """Sampled cells plus their in-bounds west/south neighbors, sorted
    (semantics of reference generate_augmented_mesh, hypernet2D.py:2446)."""
    sample_inds = np.asarray(sample_inds)
    r, c = np.unravel_index(sample_inds, (grid.ny, grid.nx))
    aug = set(sample_inds.tolist())
    aug.update(((r - 1) * grid.nx + c)[r - 1 >= 0].tolist())   # south
    aug.update((r * grid.nx + (c - 1))[c - 1 >= 0].tolist())   # west
    return np.sort(np.fromiter(aug, dtype=np.int64))


def build_sampled_mesh(grid: Grid2D, sample_inds) -> SampledMesh:
    """Precompute gather maps for `sample_inds` (sorted cell indices)."""
    sample_inds = np.sort(np.asarray(sample_inds))
    aug = generate_augmented_mesh(grid, sample_inds)
    lookup = {int(cell): i for i, cell in enumerate(aug)}

    r, c = np.unravel_index(sample_inds, (grid.ny, grid.nx))
    pos_self = np.array([lookup[int(i)] for i in sample_inds])
    has_west = c - 1 >= 0
    has_south = r - 1 >= 0
    west_cells = r * grid.nx + np.maximum(c - 1, 0)
    south_cells = np.maximum(r - 1, 0) * grid.nx + c
    pos_west = np.array([lookup.get(int(i), 0) for i in west_cells])
    pos_south = np.array([lookup.get(int(i), 0) for i in south_cells])

    i32 = np.int32
    return SampledMesh(
        sample_cells=jnp.asarray(sample_inds, i32),
        aug_cells=jnp.asarray(aug, i32),
        pos_self=jnp.asarray(pos_self, i32),
        pos_west=jnp.asarray(pos_west, i32),
        pos_south=jnp.asarray(pos_south, i32),
        has_west=jnp.asarray(has_west),
        has_south=jnp.asarray(has_south),
        col_x=jnp.asarray(c, i32),
        is_left=jnp.asarray(c == 0),
    )


def augmented_state_indices(mesh: SampledMesh, n_cells: int) -> jnp.ndarray:
    """Indices into a flat state (2n,) selecting augmented u then v rows —
    the reference's `idx = [augmented; n + augmented]`
    (hypernet2D.py:247)."""
    # int32 suffices: 2 * n_cells <= 1.125M at the fine grid, far below
    # the int32 range — and an int64 request warns under f32-only configs
    aug = mesh.aug_cells
    return jnp.concatenate((aug, n_cells + aug))


def _gather_stencil(f_aug, mesh: SampledMesh, axis: str):
    """Upwind difference of an augmented-array field at the sample cells.

    f_aug: (..., n_z). Returns (f_self - f_neighbor) with f_neighbor = 0
    outside the domain (zero ghost, matching the full-grid stencil).
    """
    f_self = f_aug[..., mesh.pos_self]
    if axis == "x":
        f_nb = jnp.where(mesh.has_west, f_aug[..., mesh.pos_west], 0.0)
    else:
        f_nb = jnp.where(mesh.has_south, f_aug[..., mesh.pos_south], 0.0)
    return f_self - f_nb


def sampled_source(mesh: SampledMesh, grid: Grid2D, mu2, dt, dtype):
    xc = grid.xc(dtype=dtype)[mesh.col_x]
    mu2 = jnp.asarray(mu2, dtype)
    return jnp.asarray(dt, dtype) * 0.02 * jnp.exp(mu2 * xc)


def sampled_inflow_bc(mesh: SampledMesh, grid: Grid2D, mu1, dt, dtype):
    mu1 = jnp.asarray(mu1, dtype)
    val = (0.5 * jnp.asarray(dt, dtype) * mu1 * mu1 / grid.dx).astype(dtype)
    return jnp.where(mesh.is_left, val, jnp.zeros((), dtype))


def sampled_residual(w_aug, wp_aug, mu1, mu2, dt, grid: Grid2D,
                     mesh: SampledMesh, src=None, lbc=None):
    """CN residual at the sampled cells.

    w_aug, wp_aug: (2*n_z,) states on the augmented mesh (u rows then v).
    Returns (2*n_s,) residual at the sampled cells. Equals the full
    residual gathered at `sample_cells` (tested in test_ecsw.py).
    """
    n_z = mesh.n_aug
    u, v = w_aug[:n_z], w_aug[n_z:]
    up, vp = wp_aug[:n_z], wp_aug[n_z:]
    if src is None:
        src = sampled_source(mesh, grid, mu2, dt, u.dtype)
    if lbc is None:
        lbc = sampled_inflow_bc(mesh, grid, mu1, dt, u.dtype)

    fu = 0.5 * (u * u + up * up)
    fv = 0.5 * (v * v + vp * vp)
    fuv = 0.5 * (u * v + up * vp)

    half_dt = 0.5 * dt
    du_t = u[mesh.pos_self] - up[mesh.pos_self]
    dv_t = v[mesh.pos_self] - vp[mesh.pos_self]
    ru = du_t + half_dt * (_gather_stencil(fu, mesh, "x") / grid.dx
                           + _gather_stencil(fuv, mesh, "y") / grid.dy) \
        - src - lbc
    rv = dv_t + half_dt * (_gather_stencil(fv, mesh, "y") / grid.dy
                           + _gather_stencil(fuv, mesh, "x") / grid.dx)
    return jnp.concatenate((ru, rv))


def sampled_jacobian_times_basis(w_aug, basis_aug, dt, grid: Grid2D,
                                 mesh: SampledMesh):
    """(J restricted to sample rows x augmented cols) @ basis_aug.

    basis_aug: (2*n_z, k) — the basis gathered at augmented rows.
    Returns (2*n_s, k). Linearization identical to
    ops.stencil.apply_jacobian, restricted by gathers.
    """
    n_z = mesh.n_aug
    u, v = w_aug[:n_z], w_aug[n_z:]
    bu = basis_aug[:n_z, :]     # (n_z, k)
    bv = basis_aug[n_z:, :]

    half_dt = 0.5 * dt
    quarter_dt = 0.25 * dt
    uu = u[:, None] * bu
    vv = v[:, None] * bv
    cross = v[:, None] * bu + u[:, None] * bv

    def gx(f):
        f_self = f[mesh.pos_self, :]
        f_nb = jnp.where(mesh.has_west[:, None], f[mesh.pos_west, :], 0.0)
        return (f_self - f_nb) / grid.dx

    def gy(f):
        f_self = f[mesh.pos_self, :]
        f_nb = jnp.where(mesh.has_south[:, None], f[mesh.pos_south, :], 0.0)
        return (f_self - f_nb) / grid.dy

    ju = bu[mesh.pos_self, :] + half_dt * gx(uu) + quarter_dt * gy(cross)
    jv = bv[mesh.pos_self, :] + half_dt * gy(vv) + quarter_dt * gx(cross)
    return jnp.concatenate((ju, jv), axis=0)
