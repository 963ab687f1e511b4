"""Spatial domain decomposition: grid rows sharded over a mesh axis with
halo exchange over ICI.

This is the TPU-native answer to the reference's scaling wall: the fine
750^2 FOM OOMs a single node (BurgersFD_CleanFine/slurm-55470585.out) and
the reference's only mitigations are hyper-reduction and subdomain-split
NNLS. Here the state itself shards: fields (ny, nx) split along y across
the 'sp' mesh axis. The upwind stencil needs exactly one south halo row
(the dependency set of generate_augmented_mesh, hypernet2D.py:2446-2466),
exchanged with one `ppermute` per residual evaluation; x-direction
stencils are shard-local.

The implicit solve uses block-Jacobi forward sweeps
(ops.wavefront.solve_jacobian_sweeps): each sweep is a full-grid stencil
+ one halo exchange, converging geometrically (exact after ny+nx-1
sweeps by nilpotency). The anti-diagonal wavefront stays the single-chip
fast path; sweeps are the shardable one.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from finitedifference_tpu.grid import Grid2D
from finitedifference_tpu.ops.stencil import shift_west


def _shift_south_halo(f, axis_name: str):
    """shift_south across shards: row r-1, receiving the neighbor's last
    row through ppermute; global row 0 gets the zero ghost."""
    num = jax.lax.axis_size(axis_name)
    perm = [(i, i + 1) for i in range(num - 1)]
    halo = jax.lax.ppermute(f[-1:, :], axis_name, perm)  # zeros on shard 0
    return jnp.concatenate([halo, f[:-1, :]], axis=0)


def _sharded_residual_local(u, v, up, vp, src, lbc, dt, dx, dy, axis_name):
    """CN residual on one shard (ny_local, nx) with halo exchange."""
    half_dt = 0.5 * dt
    fu = 0.5 * (u * u + up * up)
    fv = 0.5 * (v * v + vp * vp)
    fuv = 0.5 * (u * v + up * vp)

    ddx = lambda f: (f - shift_west(f)) / dx
    ddy = lambda f: (f - _shift_south_halo(f, axis_name)) / dy

    ru = u - up + half_dt * (ddx(fu) + ddy(fuv)) - src - lbc
    rv = v - vp + half_dt * (ddy(fv) + ddx(fuv))
    return ru, rv


def _solve_sweeps_local(u, v, fu_rhs, fv_rhs, dt, dx, dy, num_sweeps,
                        axis_name):
    """Block-Jacobi triangular sweeps with a cross-shard south halo."""
    k = 0.5 * dt
    kx, ky = k / dx, k / dy
    b11 = 1.0 + kx * u + 0.5 * ky * v
    b12 = 0.5 * ky * u
    b21 = 0.5 * kx * v
    b22 = 1.0 + ky * v + 0.5 * kx * u
    det = b11 * b22 - b12 * b21
    u_w, v_w = shift_west(u), shift_west(v)
    u_s = _shift_south_halo(u, axis_name)
    v_s = _shift_south_halo(v, axis_name)

    def binv(ru, rv):
        return (b22 * ru - b12 * rv) / det, (b11 * rv - b21 * ru) / det

    def sweep(_, duv):
        du, dv = duv
        du_w, dv_w = shift_west(du), shift_west(dv)
        du_s = _shift_south_halo(du, axis_name)
        dv_s = _shift_south_halo(dv, axis_name)
        rhs_u = fu_rhs + kx * u_w * du_w \
            + 0.5 * ky * (v_s * du_s + u_s * dv_s)
        rhs_v = fv_rhs + 0.5 * kx * (v_w * du_w + u_w * dv_w) \
            + ky * v_s * dv_s
        return binv(rhs_u, rhs_v)

    return jax.lax.fori_loop(0, num_sweeps, sweep, binv(fu_rhs, fv_rhs))


def make_sharded_residual(mesh: Mesh, grid: Grid2D, dt,
                          axis_name: str = "sp"):
    spec = P(axis_name, None)

    @jax.jit
    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(spec, spec, spec, spec, spec, spec),
        out_specs=(spec, spec))
    def f(u, v, up, vp, src, lbc):
        return _sharded_residual_local(u, v, up, vp, src, lbc,
                                       dt, grid.dx, grid.dy, axis_name)

    return f


def _local_newton_step(up, vp, src, lbc, dt, dx, dy, num_sweeps, max_its,
                       relnorm_cutoff, axis_name):
    """One implicit CN Newton step on a local shard (collectives over
    `axis_name` for halos and the global residual norm)."""
    def res(u, v):
        return _sharded_residual_local(u, v, up, vp, src, lbc,
                                       dt, dx, dy, axis_name)

    def global_norm(ru, rv):
        ss = jnp.sum(ru * ru) + jnp.sum(rv * rv)
        return jnp.sqrt(jax.lax.psum(ss, axis_name))

    r0u, r0v = res(up, vp)
    init_norm = global_norm(r0u, r0v)

    def cond(carry):
        u, v, it, done, rn, prev = carry
        return jnp.logical_and(~done, it < max_its)

    def body(carry):
        u, v, it, done, _, prev = carry
        ru, rv = res(u, v)
        rn = global_norm(ru, rv)
        conv = rn / init_norm < relnorm_cutoff
        stag = jnp.logical_and(it > 0, rn > 0.99 * prev)
        stop = jnp.logical_or(conv, stag)
        du, dv = _solve_sweeps_local(u, v, ru, rv, dt, dx, dy,
                                     num_sweeps, axis_name)
        u_new = jnp.where(stop, u, u - du)
        v_new = jnp.where(stop, v, v - dv)
        return (u_new, v_new, it + 1, stop, rn, rn)

    # derive the carry scalars from init_norm so they inherit its varying
    # manual axes under shard_map (vmapped dp blocks)
    done0 = jnp.isnan(init_norm)              # False, data-derived
    big = jnp.full_like(init_norm, jnp.inf)
    u, v, it, done, rn, _ = jax.lax.while_loop(
        cond, body, (up, vp, jnp.int32(0), done0, init_norm, big))
    return u, v


def sharded_fom_step(mesh: Mesh, grid: Grid2D, dt, *,
                     axis_name: str = "sp", num_sweeps: int = 64,
                     max_its: int = 50, relnorm_cutoff: float = 1e-12):
    """Build a jitted implicit CN step over spatially-sharded fields.

    Returns step(u_p, v_p, src, lbc) -> (u, v): one Newton solve where
    every residual evaluation and every triangular sweep exchanges one
    halo row over ICI. src/lbc are the precomputed per-(mu, dt) fields
    (ops.stencil.source_term / inflow_bc_term).
    """
    spec = P(axis_name, None)

    def local_step(up, vp, src, lbc):
        return _local_newton_step(up, vp, src, lbc, dt, grid.dx, grid.dy,
                                  num_sweeps, max_its, relnorm_cutoff,
                                  axis_name)

    return jax.jit(
        shard_map(local_step, mesh=mesh,
                  in_specs=(spec, spec, spec, spec),
                  out_specs=(spec, spec)))


def sharded_sweep_fom_step(mesh: Mesh, grid: Grid2D, dt, *,
                           dp_axis: str = "dp", sp_axis: str = "sp",
                           num_sweeps: int = 32, max_its: int = 50,
                           relnorm_cutoff: float = 1e-10):
    """Implicit CN step batched over (mu1, mu2) AND spatially sharded.

    Fields are (B, ny, nx) with the batch axis sharded over `dp_axis`
    (pure data parallelism over the parameter sweep — zero communication)
    and rows over `sp_axis` (halo exchange over ICI). The per-sample
    Newton/sweep logic is vmapped inside the shard, so the 'sp'
    collectives batch over the local mu block. This is the 2D-mesh
    "training step" the multichip dryrun compiles.
    """
    spec = P(dp_axis, sp_axis, None)

    def local_step(up, vp, src, lbc):   # (B_loc, ny_loc, nx)
        one = lambda a, b, c, d: _local_newton_step(
            a, b, c, d, dt, grid.dx, grid.dy, num_sweeps, max_its,
            relnorm_cutoff, sp_axis)
        return jax.vmap(one)(up, vp, src, lbc)

    return jax.jit(
        shard_map(local_step, mesh=mesh,
                  in_specs=(spec, spec, spec, spec),
                  out_specs=(spec, spec)))
