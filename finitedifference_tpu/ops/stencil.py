"""Matrix-free upwind stencils for the 2D inviscid Burgers HDM.

The reference assembles sparse first-order upwind difference operators
(D = spdiags([-1/dx, 1/dx], [-1, 0]), hypernet2D.py:2410-2416) and
Kronecker-expands them (get_ops, hypernet2D.py:2433-2444). Here the same
operators are pure shifts:

    (D_x f)[r, c] = (f[r, c] - f[r, c-1]) / dx,   f[r, -1] := 0
    (D_y f)[r, c] = (f[r, c] - f[r-1, c]) / dy,   f[-1, c] := 0

Everything below is elementwise + shift — XLA fuses the whole residual
into a couple of HBM passes; no gather, no sparse formats, no dynamic
shapes. All functions operate on fields shaped (..., ny, nx) with x as
the fastest (last) axis, matching the reference's x-major flattening.

Crank-Nicolson residual (reference inviscid_burgers_res2D_alt,
hypernet2D.py:2512-2570):

    ru = u - up + 0.5*dt*Dx(Fu + Fpu) + 0.5*dt*Dy(Fuv + Fpuv) - src - lbc
    rv = v - vp + 0.5*dt*Dy(Fv + Fpv) + 0.5*dt*Dx(Fuv + Fpuv)

with fluxes Fu = 0.5 u^2, Fv = 0.5 v^2, Fuv = 0.5 u v, source
src = dt * 0.02 * exp(mu2 * xc) and inflow BC lbc[:, 0] = 0.5*dt*mu1^2/dx.
"""

from __future__ import annotations

import jax.numpy as jnp

from finitedifference_tpu.grid import Grid2D


# --------------------------------------------------------------------------
# primitive shifts / differences
# --------------------------------------------------------------------------

def shift_west(f: jnp.ndarray) -> jnp.ndarray:
    """f[..., r, c] -> f[..., r, c-1], zero at the x=0 column."""
    pad = [(0, 0)] * (f.ndim - 1) + [(1, 0)]
    return jnp.pad(f, pad)[..., :-1]


def shift_south(f: jnp.ndarray) -> jnp.ndarray:
    """f[..., r, c] -> f[..., r-1, c], zero at the y=0 row."""
    pad = [(0, 0)] * (f.ndim - 2) + [(1, 0), (0, 0)]
    return jnp.pad(f, pad)[..., :-1, :]


def ddx_upwind(f: jnp.ndarray, dx) -> jnp.ndarray:
    """First-order upwind x-difference with zero ghost at x<0."""
    return (f - shift_west(f)) / dx


def ddy_upwind(f: jnp.ndarray, dy) -> jnp.ndarray:
    """First-order upwind y-difference with zero ghost at y<0."""
    return (f - shift_south(f)) / dy


# --------------------------------------------------------------------------
# constant per-(mu, dt) terms
# --------------------------------------------------------------------------

def source_term(grid: Grid2D, mu2, dt, dtype=None) -> jnp.ndarray:
    """dt * 0.02 * exp(mu2 * xc), tiled over rows -> (ny, nx)."""
    dtype = dtype if dtype is not None else jnp.result_type(mu2)
    xc = grid.xc(dtype=dtype)
    mu2 = jnp.asarray(mu2, dtype)   # mu may arrive in a wider dtype
    row = jnp.asarray(dt, dtype) * 0.02 * jnp.exp(mu2 * xc)
    return jnp.broadcast_to(row[None, :], (grid.ny, grid.nx))


def inflow_bc_term(grid: Grid2D, mu1, dt, dtype=None) -> jnp.ndarray:
    """Inflow Dirichlet BC: lbc[:, 0] = 0.5*dt*mu1^2/dx, else 0 -> (ny, nx)."""
    dtype = dtype if dtype is not None else jnp.result_type(mu1)
    mu1 = jnp.asarray(mu1, dtype)
    col = jnp.zeros((grid.ny, grid.nx), dtype=dtype)
    return col.at[:, 0].set(
        (0.5 * jnp.asarray(dt, dtype) * mu1 * mu1 / grid.dx).astype(dtype))


# --------------------------------------------------------------------------
# residual
# --------------------------------------------------------------------------

def burgers_residual(u, v, up, vp, mu1, mu2, dt, grid: Grid2D,
                     src=None, lbc=None):
    """Crank-Nicolson residual on (..., ny, nx) fields -> (ru, rv).

    `src`/`lbc` may be precomputed (they depend only on (mu, dt, grid)).
    """
    if src is None:
        src = source_term(grid, mu2, dt, dtype=u.dtype)
    if lbc is None:
        lbc = inflow_bc_term(grid, mu1, dt, dtype=u.dtype)

    half_dt = 0.5 * dt
    fu = 0.5 * (u * u + up * up)        # Fu + Fpu
    fv = 0.5 * (v * v + vp * vp)        # Fv + Fpv
    fuv = 0.5 * (u * v + up * vp)       # Fuv + Fpuv

    dxfu = ddx_upwind(fu, grid.dx)
    dyfuv = ddy_upwind(fuv, grid.dy)
    dyfv = ddy_upwind(fv, grid.dy)
    dxfuv = ddx_upwind(fuv, grid.dx)

    ru = u - up + half_dt * (dxfu + dyfuv) - src - lbc
    rv = v - vp + half_dt * (dyfv + dxfuv)
    return ru, rv


def burgers_residual_flat(w, wp, mu1, mu2, dt, grid: Grid2D,
                          src=None, lbc=None):
    """Flat-state wrapper: (..., 2*n) -> (..., 2*n)."""
    u, v = grid.split_fields(w)
    up, vp = grid.split_fields(wp)
    ru, rv = burgers_residual(u, v, up, vp, mu1, mu2, dt, grid, src, lbc)
    return grid.merge_fields(ru, rv)


# --------------------------------------------------------------------------
# exact Jacobian as an operator
# --------------------------------------------------------------------------

def apply_jacobian(u, v, du, dv, dt, grid: Grid2D):
    """Exact Jacobian-vector product of the CN residual at state (u, v).

    Equals the reference's assembled sparse Jacobian
    (inviscid_burgers_exact_jac2D, hypernet2D.py:2627-2656) applied to
    (du, dv), but evaluated as fused stencils:

        Ju = du + 0.5*dt*Dx(u*du) + 0.25*dt*Dy(v*du + u*dv)
        Jv = dv + 0.5*dt*Dy(v*dv) + 0.25*dt*Dx(v*du + u*dv)

    (u, v) are (ny, nx); (du, dv) may carry leading batch axes
    (..., ny, nx) — e.g. a whole POD basis at once for the MXU.
    """
    half_dt = 0.5 * dt
    quarter_dt = 0.25 * dt
    cross = v * du + u * dv
    ju = du + half_dt * ddx_upwind(u * du, grid.dx) \
        + quarter_dt * ddy_upwind(cross, grid.dy)
    jv = dv + half_dt * ddy_upwind(v * dv, grid.dy) \
        + quarter_dt * ddx_upwind(cross, grid.dx)
    return ju, jv


def apply_jacobian_flat(w, dw, dt, grid: Grid2D):
    """Flat wrapper of apply_jacobian: (2n,), (..., 2n) -> (..., 2n)."""
    u, v = grid.split_fields(w)
    du, dv = grid.split_fields(dw)
    ju, jv = apply_jacobian(u, v, du, dv, dt, grid)
    return grid.merge_fields(ju, jv)


def jacobian_times_basis(w, basis, dt, grid: Grid2D):
    """J(w) @ V for a dense basis V of shape (2n, k) -> (2n, k).

    The reference forms this as sparse-times-dense (hypernet2D.py:1917);
    here it is a batched stencil: reshape V to (k, 2, ny, nx), apply the
    linearized operator to all k columns at once, reshape back.
    """
    n = grid.n_cells
    k = basis.shape[1]
    cols = basis.T  # (k, 2n)
    du = cols[:, :n].reshape(k, grid.ny, grid.nx)
    dv = cols[:, n:].reshape(k, grid.ny, grid.nx)
    u, v = grid.split_fields(w)
    ju, jv = apply_jacobian(u, v, du, dv, dt, grid)
    out = jnp.concatenate(
        (ju.reshape(k, n), jv.reshape(k, n)), axis=1
    )  # (k, 2n)
    return out.T
