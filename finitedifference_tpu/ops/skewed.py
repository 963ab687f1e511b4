"""Skewed-coordinate representation of the Burgers HDM.

The wavefront solve wants fields in anti-diagonal (skewed) layout
S[d, r] = X[r, d - r]. Converting per solve costs a large gather (~25x
the solve kernel itself at 750^2), so this module keeps the ENTIRE time
integration in skewed coordinates: the upwind stencil maps to cheap
contiguous shifts there —

    west  (r, c-1)  ->  S[d-1, r]      (shift along the diagonal axis)
    south (r-1, c)  ->  S[d-1, r-1]    (shift along both axes)

— and the zero ghost cells fall out naturally from the zero padding
outside the valid anti-diagonal band. Skew/unskew happens once per
trajectory, not once per Newton iteration.

Arrays are padded to (nd_pad, ny_pad) (multiples of `block` and 128) so
the Pallas solver consumes them with no per-call reshaping; slots outside
the valid band hold zeros and every residual is masked back to the band.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from finitedifference_tpu.grid import Grid2D
from finitedifference_tpu.ops.wavefront import skew, unskew


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class SkewedLayout(NamedTuple):
    """Static geometry of the padded skewed representation."""
    nx: int
    ny: int
    nd_pad: int
    ny_pad: int

    @property
    def ndiag(self) -> int:
        return self.ny + self.nx - 1


def make_layout(grid: Grid2D, block: int = 128) -> SkewedLayout:
    ndiag = grid.ny + grid.nx - 1
    return SkewedLayout(
        nx=grid.nx, ny=grid.ny,
        nd_pad=_round_up(ndiag, block),
        ny_pad=_round_up(grid.ny, 128),
    )


def valid_mask(lay: SkewedLayout, dtype=jnp.float32) -> jnp.ndarray:
    d = jnp.arange(lay.nd_pad)[:, None]
    r = jnp.arange(lay.ny_pad)[None, :]
    ok = (r < lay.ny) & (d - r >= 0) & (d - r < lay.nx)
    return ok.astype(dtype)


def valid_mask_expr(lay: SkewedLayout, dtype):
    """Band mask as an IOTA expression (not a materialized operand).

    Inside a jitted residual XLA fuses the iota+compares into the
    elementwise kernel, so masking costs zero HBM traffic — the
    materialized `valid_mask` array is ~9.4 MB of pure mask reads per
    750^2 f64 residual eval (round-5 FOM tuning)."""
    d = jax.lax.broadcasted_iota(jnp.int32, (lay.nd_pad, lay.ny_pad), 0)
    r = jax.lax.broadcasted_iota(jnp.int32, (lay.nd_pad, lay.ny_pad), 1)
    ok = (r < lay.ny) & (d - r >= 0) & (d - r < lay.nx)
    return ok.astype(dtype)


def to_skewed(x, lay: SkewedLayout) -> jnp.ndarray:
    """(ny, nx) -> padded (nd_pad, ny_pad)."""
    s = skew(x, lay.ny, lay.nx)
    return jnp.pad(s, ((0, lay.nd_pad - lay.ndiag),
                       (0, lay.ny_pad - lay.ny)))


def from_skewed(s, lay: SkewedLayout) -> jnp.ndarray:
    """padded (..., nd_pad, ny_pad) -> (..., ny, nx)."""
    return unskew(s[..., :lay.ndiag, :lay.ny], lay.ny, lay.nx)


def shift_prev_diag(s) -> jnp.ndarray:
    """S[d, r] -> S[d-1, r]: the WEST neighbor in skewed space."""
    return jnp.pad(s, ((1, 0), (0, 0)))[:-1, :]


def shift_prev_diag_row(s) -> jnp.ndarray:
    """S[d, r] -> S[d-1, r-1]: the SOUTH neighbor in skewed space."""
    return jnp.pad(s, ((1, 0), (1, 0)))[:-1, :-1]


def skewed_source(lay: SkewedLayout, grid: Grid2D, mu2, dt, dtype):
    """dt * 0.02 * exp(mu2 * xc[c]) at c = d - r, zero off-band."""
    d = jnp.arange(lay.nd_pad)[:, None]
    r = jnp.arange(lay.ny_pad)[None, :]
    c = jnp.clip(d - r, 0, lay.nx - 1)
    xc = grid.xc(dtype=dtype)[c]
    mu2 = jnp.asarray(mu2, dtype)
    return jnp.asarray(dt, dtype) * 0.02 * jnp.exp(mu2 * xc) \
        * valid_mask(lay, dtype)


def skewed_inflow_bc(lay: SkewedLayout, grid: Grid2D, mu1, dt, dtype):
    """0.5*dt*mu1^2/dx on the c=0 cells, i.e. the d == r diagonal."""
    d = jnp.arange(lay.nd_pad)[:, None]
    r = jnp.arange(lay.ny_pad)[None, :]
    mask = ((d == r) & (r < lay.ny)).astype(dtype)
    mu1 = jnp.asarray(mu1, dtype)
    return (0.5 * jnp.asarray(dt, dtype) * mu1 * mu1
            / grid.dx).astype(dtype) * mask


def skewed_residual(u, v, up, vp, dt, grid: Grid2D, lay: SkewedLayout,
                    src_sk, lbc_sk, valid):
    """CN residual entirely in skewed space -> (ru, rv), masked to the
    band. Equals skew(burgers_residual(...)) (tested)."""
    half_dt = 0.5 * dt
    fu = 0.5 * (u * u + up * up)
    fv = 0.5 * (v * v + vp * vp)
    fuv = 0.5 * (u * v + up * vp)

    ddx = lambda f: (f - shift_prev_diag(f)) / grid.dx
    ddy = lambda f: (f - shift_prev_diag_row(f)) / grid.dy

    ru = u - up + half_dt * (ddx(fu) + ddy(fuv)) - src_sk - lbc_sk
    rv = v - vp + half_dt * (ddy(fv) + ddx(fuv))
    return ru * valid, rv * valid


def _half_flux(u, v, dt, grid: Grid2D):
    """Current-state half of the CN residual: u + 0.5*dt*(ddx(0.5 u^2)
    + ddy(0.5 u v)) and the v analogue (no mask, no constants)."""
    half_dt = 0.5 * dt
    fu = 0.5 * u * u
    fv = 0.5 * v * v
    fuv = 0.5 * u * v
    ddx = lambda f: (f - shift_prev_diag(f)) / grid.dx
    ddy = lambda f: (f - shift_prev_diag_row(f)) / grid.dy
    au = u + half_dt * (ddx(fu) + ddy(fuv))
    av = v + half_dt * (ddy(fv) + ddx(fuv))
    return au, av


def skewed_step_constant(up, vp, dt, grid: Grid2D, src_sk, lbc_sk,
                         valid):
    """Per-STEP constant of the CN residual + the residual at the
    previous state, in one fused pass.

    The residual splits as r(u, v) = half(u, v) + cp(up, vp) where the
    cp half (previous-state fluxes, source, inflow BC) is constant
    across a step's Newton iterations — recomputing it every iteration
    re-reads 4 extra arrays per eval for values that cannot change
    (round 5, VERDICT r4 #5). Returns (cp_u, cp_v, r0_u, r0_v) with cp
    pre-masked and r0 = r(up, vp) (the Newton init_norm residual):
    r0 = 2*half_flux(prev) - up - src - lbc on the band.
    """
    au, av = _half_flux(up, vp, dt, grid)
    # -up + 0.5*dt*(prev fluxes) = (au - up) - up = au - 2*up
    cp_u = (au - 2.0 * up - src_sk - lbc_sk) * valid
    cp_v = (av - 2.0 * vp) * valid
    r0_u = au * valid + cp_u
    r0_v = av * valid + cp_v
    return cp_u, cp_v, r0_u, r0_v


def skewed_residual_iter(u, v, cp_u, cp_v, dt, grid: Grid2D, valid):
    """Per-iteration CN residual from the step constant: reads
    (u, v, cp_u, cp_v, valid) instead of skewed_residual's
    (u, v, up, vp, src, lbc, valid). Identical values (tested)."""
    au, av = _half_flux(u, v, dt, grid)
    return au * valid + cp_u, av * valid + cp_v


def solve_skewed_lax(su, sv, sfu, sfv, dt, grid: Grid2D,
                     lay: SkewedLayout, unroll: int = 8):
    """Triangular solve on padded skewed inputs via lax.scan (any dtype;
    the non-Pallas path). Zeros outside the band in, zeros out."""
    kx = 0.5 * dt / grid.dx
    ky = 0.5 * dt / grid.dy
    d_idx = jnp.arange(lay.nd_pad)[:, None]
    r_idx = jnp.arange(lay.ny_pad)[None, :]
    valid = (r_idx < lay.ny) & (d_idx - r_idx >= 0) & \
        (d_idx - r_idx < lay.nx)

    def shift_down(x):
        return jnp.pad(x, ((1, 0),))[:-1]

    def step(carry, xs):
        du_p, dv_p, u_p, v_p = carry
        u_d, v_d, fu_d, fv_d, valid_d = xs
        u_s, v_s = shift_down(u_p), shift_down(v_p)
        du_s, dv_s = shift_down(du_p), shift_down(dv_p)
        rhs_u = fu_d + kx * u_p * du_p + 0.5 * ky * (v_s * du_s
                                                     + u_s * dv_s)
        rhs_v = fv_d + 0.5 * kx * (v_p * du_p + u_p * dv_p) \
            + ky * v_s * dv_s
        b11 = 1.0 + kx * u_d + 0.5 * ky * v_d
        b12 = 0.5 * ky * u_d
        b21 = 0.5 * kx * v_d
        b22 = 1.0 + ky * v_d + 0.5 * kx * u_d
        det = b11 * b22 - b12 * b21
        du_d = jnp.where(valid_d, (b22 * rhs_u - b12 * rhs_v) / det, 0.0)
        dv_d = jnp.where(valid_d, (b11 * rhs_v - b21 * rhs_u) / det, 0.0)
        return (du_d, dv_d, u_d, v_d), (du_d, dv_d)

    z = jnp.zeros((lay.ny_pad,), su.dtype)
    _, (sdu, sdv) = jax.lax.scan(
        step, (z, z, z, z), (su, sv, sfu, sfv, valid), unroll=unroll)
    return sdu, sdv
