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


def sharded_skewed_fom(mesh: Mesh, grid: Grid2D, w0, dt, num_steps,
                       mu1, mu2, *, axis_name: str = "sp",
                       max_its: int = 100,
                       relnorm_cutoff: float | None = None,
                       snaps_dtype=None):
    """FULL-TRAJECTORY implicit FOM on the skewed (anti-diagonal)
    layout, sharded along the grid-row axis of the skewed plane — the
    single-chip fast path's layout (ops/skewed.py,
    fom.inviscid_burgers_implicit2d_skewed) made SPMD (VERDICT r3 #3c).

    Sharding: skewed fields are (nd_pad, ny_pad) with axis 0 the
    anti-diagonal index and axis 1 the grid row r; axis 1 shards over
    `axis_name`. In skewed space the upwind stencil needs S[d-1, r]
    (local shift) and S[d-1, r-1] (one-slot halo along the sharded
    axis, a single `ppermute` column per residual). The EXACT wavefront
    substitution stays a lax.scan over diagonals; its per-diagonal
    carry shift r-1 becomes one ppermute of a packed (4, 1) halo per
    scan step — correct-by-construction SPMD of the same recurrence,
    validated against the dense single-device engine
    (tests/test_parallel.py). On real ICI this path is
    latency-dominated at the scan tail (one hop per diagonal); the
    row-sharded block-Jacobi engine (sharded_fom_step) remains the
    throughput alternative, but this one unifies the performance
    layout and the sharded layout.

    Same Newton stopping rules as the single-chip skewed stepper
    (relative 1e-12 cutoff for f64, 0.99 stagnation guard); residual
    norms are global psums. Returns FOMResult-compatible
    (snaps (2n, num_steps+1), total_newton_its).
    """
    from finitedifference_tpu.ops import skewed as sk

    w0 = jnp.asarray(w0)
    dtype = w0.dtype
    if relnorm_cutoff is None:
        relnorm_cutoff = 1e-12 if dtype == jnp.float64 else 1e-6
    sd = snaps_dtype or dtype
    num = mesh.shape[axis_name]
    lay = sk.make_layout(grid)
    if lay.ny_pad % num:
        raise ValueError(f"ny_pad={lay.ny_pad} not divisible by "
                         f"{axis_name}={num}")

    valid = sk.valid_mask(lay, dtype)
    src_sk = sk.skewed_source(lay, grid, mu2, dt, dtype)
    lbc_sk = sk.skewed_inflow_bc(lay, grid, mu1, dt, dtype)
    u0, v0 = grid.split_fields(w0)
    su0 = sk.to_skewed(u0, lay)
    sv0 = sk.to_skewed(v0, lay)

    kx = 0.5 * dt / grid.dx
    ky = 0.5 * dt / grid.dy
    half_dt = 0.5 * dt
    perm_fwd = [(i, i + 1) for i in range(num - 1)]

    def shift_r(x):
        """S[..., r] -> S[..., r-1] across shards (zero ghost at r=0)."""
        halo = jax.lax.ppermute(x[..., -1:], axis_name, perm_fwd)
        return jnp.concatenate([halo, x[..., :-1]], axis=-1)

    def local_traj(su, sv, src, lbc, vmask):
        def res_half(u, v):
            """Current-state half of the CN residual (r5 split, mirrors
            ops/skewed.py::_half_flux with sharded-row halos)."""
            fu = 0.5 * u * u
            fv = 0.5 * v * v
            fuv = 0.5 * u * v
            ddx = lambda f: (f - sk.shift_prev_diag(f)) / grid.dx
            ddy = lambda f: \
                (f - shift_r(sk.shift_prev_diag(f))) / grid.dy
            au = u + half_dt * (ddx(fu) + ddy(fuv))
            av = v + half_dt * (ddy(fv) + ddx(fuv))
            return au, av

        def solve(u, v, ru, rv):
            """Exact wavefront substitution, r-axis sharded: scan over
            diagonals with one packed halo ppermute per step."""
            def dstep(carry, xs):
                packed_p = carry                   # (4, ny_loc)
                u_d, v_d, fu_d, fv_d, valid_d = xs
                sh = shift_r(packed_p)
                u_p, v_p, du_p, dv_p = packed_p
                u_s, v_s, du_s, dv_s = sh
                rhs_u = fu_d + kx * u_p * du_p \
                    + 0.5 * ky * (v_s * du_s + u_s * dv_s)
                rhs_v = fv_d + 0.5 * kx * (v_p * du_p + u_p * dv_p) \
                    + ky * v_s * dv_s
                b11 = 1.0 + kx * u_d + 0.5 * ky * v_d
                b12 = 0.5 * ky * u_d
                b21 = 0.5 * kx * v_d
                b22 = 1.0 + ky * v_d + 0.5 * kx * u_d
                det = b11 * b22 - b12 * b21
                du_d = jnp.where(valid_d > 0,
                                 (b22 * rhs_u - b12 * rhs_v) / det, 0.0)
                dv_d = jnp.where(valid_d > 0,
                                 (b11 * rhs_v - b21 * rhs_u) / det, 0.0)
                return jnp.stack([u_d, v_d, du_d, dv_d]), (du_d, dv_d)

            # derive the zero carry from the data so it inherits the
            # shard_map varying manual axes (scan requires carry-type
            # equality including vma)
            z = 0.0 * jnp.stack([u[0], v[0], u[0], v[0]])
            _, (sdu, sdv) = jax.lax.scan(
                dstep, z, (u, v, ru, rv, vmask))
            return sdu, sdv

        def norm2(ru, rv):
            ss = jnp.sum(ru * ru) + jnp.sum(rv * rv)
            return jnp.sqrt(jax.lax.psum(ss, axis_name))

        def newton(up, vp):
            # r5 restructure, mirroring the single-chip engine
            # (fom.inviscid_burgers_implicit2d_skewed): one fused pass
            # yields the step constant cp AND the init residual; the
            # body solves first and evaluates the residual at the
            # updated state. Same evaluated states, same stopping
            # decisions, identical iteration counts (tested vs the
            # single-chip engine in test_parallel.py).
            au, av = res_half(up, vp)
            cp_u = (au - 2.0 * up - src - lbc) * vmask
            cp_v = (av - 2.0 * vp) * vmask
            r0u = au * vmask + cp_u
            r0v = av * vmask + cp_v
            init_norm = norm2(r0u, r0v)

            def cond(c):
                _, _, _, _, _, it, done = c
                return jnp.logical_and(~done, it < max_its)

            def body(c):
                u, v, ru, rv, rn_prev, it, done = c
                du, dv = solve(u, v, ru, rv)
                u1 = u - du
                v1 = v - dv
                au, av = res_half(u1, v1)
                ru1 = au * vmask + cp_u
                rv1 = av * vmask + cp_v
                rn = norm2(ru1, rv1)
                conv = rn / init_norm < relnorm_cutoff
                stag = rn > 0.99 * rn_prev
                return (u1, v1, ru1, rv1, rn, it + 1,
                        jnp.logical_or(conv, stag))

            done0 = jnp.isnan(init_norm)      # False, axes-consistent
            u, v, _, _, _, it, _ = jax.lax.while_loop(
                cond, body,
                (up, vp, r0u, r0v, init_norm, jnp.int32(0), done0))
            return u, v, it

        def step(carry, _):
            up, vp, its = carry
            u, v, nits = newton(up, vp)
            return (u, v, its + nits), (u.astype(sd), v.astype(sd))

        (_, _, its), (us, vs) = jax.lax.scan(
            step, (su, sv, jnp.int32(0)), None, length=num_steps)
        return us, vs, its

    spec = P(None, axis_name)
    traj = jax.jit(shard_map(
        local_traj, mesh=mesh,
        in_specs=(spec, spec, spec, spec, spec),
        out_specs=(P(None, None, axis_name), P(None, None, axis_name),
                   P())))
    us, vs, its = traj(su0, sv0, src_sk, lbc_sk, valid)

    us = jnp.concatenate((su0.astype(sd)[None], us), axis=0)
    vs = jnp.concatenate((sv0.astype(sd)[None], vs), axis=0)
    u_t = sk.from_skewed(us, lay).reshape(num_steps + 1, -1)
    v_t = sk.from_skewed(vs, lay).reshape(num_steps + 1, -1)
    snaps = jnp.concatenate((u_t, v_t), axis=1).T
    return snaps, its


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
