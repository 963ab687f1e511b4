"""Full-order model (HDM) time steppers.

TPU-native replacements for the reference's
inviscid_burgers_implicit2D (hypernet2D.py:72-131, Newton + spsolve per
step) and inviscid_burgers_explicit2D (hypernet2D.py:30-70). The time
loop is a `lax.scan`; the Newton loop is a `lax.while_loop` with the
reference's stopping rule (relative residual < 1e-12, max 100 its); the
linear solve is the exact wavefront forward substitution
(ops/wavefront.py) instead of sparse LU.

Everything is jit-able and vmap-able over (mu1, mu2) — a whole parameter
sweep runs as one compiled program (parallel/sweep.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from finitedifference_tpu.grid import Grid2D
from finitedifference_tpu.ops.stencil import (
    burgers_residual_flat,
    ddx_upwind,
    ddy_upwind,
    inflow_bc_term,
    source_term,
)
from finitedifference_tpu.ops.wavefront import (
    solve_jacobian_flat,
    solve_jacobian_sweeps,
)


class NewtonResult(NamedTuple):
    w: jnp.ndarray          # solution state (2n,)
    num_its: jnp.ndarray    # Newton iterations taken
    resnorm: jnp.ndarray    # final residual norm
    init_norm: jnp.ndarray  # residual norm at the initial guess


def newton_step(wp, mu1, mu2, dt, grid: Grid2D, *,
                max_its: int = 100, relnorm_cutoff: float | None = None,
                linear_solver: str = "wavefront",
                num_sweeps: int | None = None) -> NewtonResult:
    """One implicit CN step: solve r(w; wp) = 0 by Newton-Raphson.

    Stopping logic mirrors the reference newton_raphson
    (hypernet2D.py:1811-1857): check ||r||/||r(x0)|| < cutoff *before*
    each update, break without updating once converged. The default
    cutoff is dtype-aware: 1e-12 in f64 (the reference value), 1e-6 in
    f32 (1e-12 is unreachable there and would burn max_its every step).
    """
    if relnorm_cutoff is None:
        relnorm_cutoff = 1e-12 if wp.dtype == jnp.float64 else 1e-6
    src = source_term(grid, mu2, dt, dtype=wp.dtype)
    lbc = inflow_bc_term(grid, mu1, dt, dtype=wp.dtype)

    def res(w):
        return burgers_residual_flat(w, wp, mu1, mu2, dt, grid, src, lbc)

    def solve(w, f):
        if linear_solver == "wavefront":
            return solve_jacobian_flat(w, f, dt, grid)
        elif linear_solver == "sweeps":
            u, v = grid.split_fields(w)
            fu, fv = grid.split_fields(f)
            du, dv = solve_jacobian_sweeps(u, v, fu, fv, dt, grid,
                                           num_sweeps=num_sweeps)
            return grid.merge_fields(du, dv)
        raise ValueError(f"unknown linear_solver: {linear_solver}")

    init_norm = jnp.linalg.norm(res(wp))

    def cond(carry):
        w, it, done, rn, prev_rn = carry
        return jnp.logical_and(~done, it < max_its)

    def body(carry):
        w, it, done, _, prev_rn = carry
        f = res(w)
        rn = jnp.linalg.norm(f)
        conv = rn / init_norm < relnorm_cutoff
        # stagnation escape: once Newton hits its roundoff floor the
        # residual stops improving — stop instead of burning max_its.
        # Never fires during healthy (quadratic) convergence, so f64
        # behavior is identical to the reference's plain loop.
        stag = jnp.logical_and(it > 0, rn > 0.99 * prev_rn)
        stop = jnp.logical_or(conv, stag)
        dw = solve(w, f)
        w_new = jnp.where(stop, w, w - dw)
        return (w_new, it + 1, stop, rn, rn)

    big = jnp.asarray(jnp.inf, wp.dtype)
    w, it, done, rn, _ = jax.lax.while_loop(
        cond, body, (wp, jnp.int32(0), jnp.bool_(False), init_norm, big)
    )
    # `it` counts loop entries; converged entries do not update w, matching
    # the reference's break-before-update. Iterations-with-update = it - done.
    return NewtonResult(w=w, num_its=it - done.astype(jnp.int32),
                        resnorm=rn, init_norm=init_norm)


class FOMResult(NamedTuple):
    snaps: jnp.ndarray       # (2n, num_steps+1) trajectory, columns = time
    total_newton_its: jnp.ndarray
    # worst final relative residual over all steps (rn/||r(x0)||): > the
    # Newton cutoff means some step exited on stagnation/max_its without
    # converging — the silent-acceptance case ADVICE.md flags. None only
    # for legacy constructors.
    max_final_relnorm: jnp.ndarray | None = None


@functools.partial(
    jax.jit,
    static_argnames=(
        "grid", "num_steps", "max_its", "linear_solver", "num_sweeps",
        "snaps_dtype",
    ),
)
def inviscid_burgers_implicit2d(grid: Grid2D, w0, dt, num_steps, mu1, mu2,
                                *, max_its: int = 100,
                                relnorm_cutoff: float | None = None,
                                linear_solver: str = "wavefront",
                                num_sweeps: int | None = None,
                                snaps_dtype=None) -> FOMResult:
    """Implicit FOM trajectory: `num_steps` CN steps from w0.

    Returns all num_steps+1 snapshots, column-major in time, identical
    layout to the reference (hypernet2D.py:89-129). `snaps_dtype` lets the
    caller store the trajectory in a narrower dtype (e.g. f32) while
    solving in f64.
    """
    w0 = jnp.asarray(w0)
    sd = snaps_dtype or w0.dtype

    def step(carry, _):
        wp, its, worst = carry
        out = newton_step(wp, mu1, mu2, dt, grid,
                          max_its=max_its, relnorm_cutoff=relnorm_cutoff,
                          linear_solver=linear_solver, num_sweeps=num_sweeps)
        worst = jnp.maximum(worst, out.resnorm / out.init_norm)
        return (out.w, its + out.num_its, worst), out.w.astype(sd)

    (wT, total_its, worst), traj = jax.lax.scan(
        step, (w0, jnp.int32(0), jnp.zeros((), w0.dtype)), None,
        length=num_steps
    )
    snaps = jnp.concatenate((w0.astype(sd)[None, :], traj), axis=0).T
    return FOMResult(snaps=snaps, total_newton_its=total_its,
                     max_final_relnorm=worst)


@functools.partial(
    jax.jit,
    static_argnames=("dt", "grid", "num_steps", "max_its", "use_pallas",
                     "solve_dtype", "snaps_dtype", "block",
                     "extrapolate_guess", "seg", "seg_overlap",
                     "pallas_interpret"),
)
def inviscid_burgers_implicit2d_skewed(
        grid: Grid2D, w0, dt, num_steps, mu1, mu2, *,
        max_its: int = 100, relnorm_cutoff: float | None = None,
        use_pallas: bool | None = None, solve_dtype=None,
        snaps_dtype=None, block: int = 128,
        extrapolate_guess: bool = False, seg: int = 0,
        seg_overlap: int = 64,
        pallas_interpret: bool = False) -> FOMResult:
    """Fast implicit FOM: the whole integration in skewed coordinates.

    The triangular solve consumes the state directly (no per-iteration
    skew gathers — those cost ~25x the solve kernel); on TPU the solve is
    the single-kernel Pallas wavefront. `solve_dtype=float32` with an f64
    state gives mixed-precision inexact Newton: f64 residuals/updates,
    f32 solves — reference-grade trajectories at f32-solve speed.

    Semantics match inviscid_burgers_implicit2d (same stopping rules);
    returns unskewed snapshots.

    extrapolate_guess=True starts Newton from the linear predictor
    2 w_n - w_{n-1} instead of the reference's w_n (hypernet2D.py's
    Newton always starts at the previous state). The converged solution
    is unchanged — init_norm and the relnorm cutoff stay defined at the
    step-start state — but the predictor's O(dt^2) initial residual
    saves roughly one Newton iteration per step.
    """
    from finitedifference_tpu.ops import skewed as sk
    from finitedifference_tpu.ops.pallas_wavefront import (
        solve_skewed_pallas,
    )

    w0 = jnp.asarray(w0)
    dtype = w0.dtype
    if relnorm_cutoff is None:
        relnorm_cutoff = 1e-12 if dtype == jnp.float64 else 1e-6
    if use_pallas is None:
        use_pallas = jax.default_backend() != "cpu"
    sd = snaps_dtype or dtype

    lay = sk.make_layout(grid, block=block)
    # iota-expression mask: fuses into the residual elementwise kernels
    # instead of streaming a 9.4 MB f64 operand per eval (r5)
    valid = sk.valid_mask_expr(lay, dtype)
    src_sk = sk.skewed_source(lay, grid, mu2, dt, dtype)
    lbc_sk = sk.skewed_inflow_bc(lay, grid, mu1, dt, dtype)

    u0, v0 = grid.split_fields(w0)
    su0 = sk.to_skewed(u0, lay)
    sv0 = sk.to_skewed(v0, lay)

    def res_iter(u, v, cp_u, cp_v):
        return sk.skewed_residual_iter(u, v, cp_u, cp_v, dt, grid,
                                       valid)

    def solve(u, v, ru, rv):
        if use_pallas and seg > 0:
            # overlapping-segment chain: ~(seg_len+overlap)/(2N-1) of
            # the exact substitution's sequential latency with
            # full-sublane slabs; truncation ~rho^overlap, below the
            # f32 kernel's own roundoff at the default overlap — the
            # f64 Newton absorbs it like any inexact solve
            from finitedifference_tpu.ops.pallas_wavefront import (
                solve_skewed_pallas_seg,
            )
            du, dv = solve_skewed_pallas_seg(
                u, v, ru, rv, dt, grid, lay, n_seg=seg,
                overlap=seg_overlap, interpret=pallas_interpret)
        elif use_pallas:
            # the Pallas kernel is f32 by construction (Mosaic has no
            # f64); solve_dtype only selects the precision of the lax
            # fallback path
            du, dv = solve_skewed_pallas(u, v, ru, rv, dt, grid, lay,
                                         block=block,
                                         interpret=pallas_interpret)
        else:
            ud = u if solve_dtype is None else u.astype(solve_dtype)
            du, dv = sk.solve_skewed_lax(
                ud, v.astype(ud.dtype), ru.astype(ud.dtype),
                rv.astype(ud.dtype), dt, grid, lay)
        return du.astype(dtype), dv.astype(dtype)

    def norm2(ru, rv):
        return jnp.sqrt(jnp.sum(ru * ru) + jnp.sum(rv * rv))

    def newton(up, vp, ug, vg):
        # Round-5 restructure (VERDICT r4 #5): one fused pass computes
        # the step's CN constant cp AND the init residual r0 = r(up, vp)
        # (the r4 loop re-evaluated r0 as body-0's residual, and solved
        # once more after the stopping residual — one wasted residual
        # pass + one wasted wavefront solve per time step). The body
        # solves first, THEN evaluates the residual at the updated
        # state; the sequence of evaluated states, stopping decisions
        # and iteration counts is bit-identical to the reference
        # contract (newton_raphson, hypernet2D.py:1811-1857).
        cp_u, cp_v, r0u, r0v = sk.skewed_step_constant(
            up, vp, dt, grid, src_sk, lbc_sk, valid)
        init_norm = norm2(r0u, r0v)
        if extrapolate_guess:
            rgu, rgv = res_iter(ug, vg, cp_u, cp_v)
            rng = norm2(rgu, rgv)
            done0 = rng / init_norm < relnorm_cutoff
        else:
            rgu, rgv, rng = r0u, r0v, init_norm
            done0 = jnp.bool_(False)   # rn/init == 1 never < cutoff

        def cond(c):
            u, v, ru, rv, rn, it, done = c
            return jnp.logical_and(~done, it < max_its)

        def body(c):
            u, v, ru, rv, rn_prev, it, done = c
            du, dv = solve(u, v, ru, rv)
            u1 = u - du
            v1 = v - dv
            ru1, rv1 = res_iter(u1, v1, cp_u, cp_v)
            rn = norm2(ru1, rv1)
            conv = rn / init_norm < relnorm_cutoff
            stag = rn > 0.99 * rn_prev
            return (u1, v1, ru1, rv1, rn, it + 1,
                    jnp.logical_or(conv, stag))

        u, v, _, _, rn, it, _ = jax.lax.while_loop(
            cond, body,
            (ug, vg, rgu, rgv, rng, jnp.int32(0), done0))
        return u, v, it, rn / init_norm

    def step(carry, _):
        up, vp, um, vm, its, worst = carry
        if extrapolate_guess:
            # predictor 2 w_n - w_{n-1}, masked to the physical cells
            ug = valid * (2.0 * up - um)
            vg = valid * (2.0 * vp - vm)
        else:
            ug, vg = up, vp
        u, v, nits, rel = newton(up, vp, ug, vg)
        return (u, v, up, vp, its + nits, jnp.maximum(worst, rel)), \
            (u.astype(sd), v.astype(sd))

    (_, _, _, _, total_its, worst), (us, vs) = jax.lax.scan(
        step, (su0, sv0, su0, sv0, jnp.int32(0), jnp.zeros((), dtype)),
        None, length=num_steps)

    # unskew the whole trajectory in one vectorized gather
    us = jnp.concatenate((su0.astype(sd)[None], us), axis=0)
    vs = jnp.concatenate((sv0.astype(sd)[None], vs), axis=0)
    u_t = sk.from_skewed(us, lay).reshape(num_steps + 1, -1)
    v_t = sk.from_skewed(vs, lay).reshape(num_steps + 1, -1)
    snaps = jnp.concatenate((u_t, v_t), axis=1).T
    return FOMResult(snaps=snaps, total_newton_its=total_its,
                     max_final_relnorm=worst)


@functools.partial(jax.jit, static_argnames=("grid", "num_steps"))
def inviscid_burgers_explicit2d(grid: Grid2D, w0, dt, num_steps, mu1, mu2):
    """Forward-Euler explicit stepper (reference hypernet2D.py:30-70).

    The reference version is a demo that only records every 500th step and
    plots inline; here the full trajectory is returned (2n, num_steps+1).
    """
    w0 = jnp.asarray(w0)
    src = source_term(grid, mu2, 1.0, dtype=w0.dtype)  # 0.02*exp(mu2 xc)
    lbc = inflow_bc_term(grid, mu1, 1.0, dtype=w0.dtype)  # 0.5*mu1^2/dx col 0
    # note: built with dt=1 so they are the *rates*; scaled by dt below.

    def step(wp, _):
        up, vp = grid.split_fields(wp)
        fu = 0.5 * up * up
        fv = 0.5 * vp * vp
        fuv = 0.5 * up * vp
        u = up - dt * (ddx_upwind(fu, grid.dx) - lbc) + dt * src \
            - dt * ddy_upwind(fuv, grid.dy)
        v = vp - dt * ddy_upwind(fv, grid.dy) - dt * ddx_upwind(fuv, grid.dx)
        w = grid.merge_fields(u, v)
        return w, w

    _, traj = jax.lax.scan(step, w0, None, length=num_steps)
    return jnp.concatenate((w0[None, :], traj), axis=0).T
