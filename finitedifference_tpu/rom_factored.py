"""Factored-block ECSW HPROM: the single-run latency engine.

The generic sampled HPROM (rom.ecsw_hprom) spends its time on ~40
gather/elementwise kernel dispatches per Gauss-Newton iteration; the
tensorized engine (rom_tensor) cuts that to ~10 dense kernels but pays
for streaming the (2*n_s, k, k) flux tensor H — 145 MB per iteration on
the 250^2 NNLS mesh, ~180 us at full HBM bandwidth, which bounds it away
from the FOM's 0.17 s / 500 steps.

This engine removes both costs. The upwind stencil at a sampled cell
touches exactly three positions (self, west, south) of u and v, so the
whole online iteration factors through SIX precomputed basis blocks
B_p = V rows gathered at those positions, each (n_s, k):

    scalars   u_s, u_w, u_so, v_s, v_w, v_so = (stacked B) @ y   [1 GEMV]
    residual  r(y)  = elementwise in the 6 scalars + per-step constant
    J V       = sum_p diag(c_p(scalars)) B_p      [row-scaled block sums]
    Gram/rhs/|r|^2 = [W.J V | W.r]^T [W.J V | W.r]   [ONE MXU matmul]

Per iteration that is ~8 kernels and ~12 MB of HBM traffic (the blocks,
twice) instead of 145 MB — the same math, stopping rules, and
trajectories as rom.ecsw_hprom (tested in tests/test_rom.py).

The per-step residual constant (Crank-Nicolson's previous-state flux
half) is elementwise in the previous step's scalars, which the time loop
carries — no decode of the previous state at all.

Reference semantics: inviscid_burgers_ecsw_fixed + gauss_newton_ECSW_2D
(hypernet2D.py:202-273, 1859-1930); the factorization itself has no
reference counterpart (it is the TPU-native design; VERDICT r2 #4).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from finitedifference_tpu.grid import Grid2D
from finitedifference_tpu.ops.sampled import (
    SampledMesh,
    sampled_inflow_bc,
    sampled_source,
)
from finitedifference_tpu.rom import ROMResult


class FactoredBlocks(NamedTuple):
    """Precomputed stencil-position basis blocks (device arrays).

    p6: (6, n_s, k) — V rows at [u_self, u_west, u_south, v_self,
        v_west, v_south]; west/south rows are pre-zeroed where the
        sample sits on the domain boundary (matching the zero-ghost
        stencil), so the gathered scalars need no masking online.
    """
    p6: jnp.ndarray


def precompute_factored_blocks(mesh: SampledMesh,
                               basis_aug) -> FactoredBlocks:
    """Gather the six (n_s, k) stencil-position blocks once per mesh."""
    basis_aug = jnp.asarray(basis_aug)
    n_z = mesh.n_aug
    bu, bv = basis_aug[:n_z, :], basis_aug[n_z:, :]

    def blocks(b):
        b_self = b[mesh.pos_self, :]
        b_west = jnp.where(mesh.has_west[:, None], b[mesh.pos_west, :],
                           0.0)
        b_south = jnp.where(mesh.has_south[:, None],
                            b[mesh.pos_south, :], 0.0)
        return b_self, b_west, b_south

    p6 = jnp.stack(blocks(bu) + blocks(bv))        # (6, n_s, k)
    return FactoredBlocks(p6=p6)


@functools.partial(
    jax.jit,
    static_argnames=("grid", "num_steps", "max_its", "unroll_its",
                     "ls_method", "axis_name"),
)
def factored_hprom(grid: Grid2D, mesh, sample_weights, y0,
                   blocks: FactoredBlocks, dt, num_steps, mu1, mu2, *,
                   max_its: int = 20, relnorm_cutoff: float = 1e-5,
                   min_delta: float = 0.1, unroll_its: int = 0,
                   ls_method: str = "normal",
                   axis_name: str | None = None) -> ROMResult:
    """HPROM time loop on the factored stencil blocks.

    unroll_its > 0 replaces the Gauss-Newton `lax.while_loop` with that
    many UNROLLED masked iterations; iterations past the reference's
    stopping rules freeze y, so the trajectory is identical whenever the
    dynamic loop would have stopped within the budget (the reference
    observes 2-3 GN its/step on these ROMs, BASELINE.md).

    axis_name: when set, the engine runs SPMD inside `shard_map` with
    the sampled-cell axis sharded across devices: every Gram extension
    and residual norm is an `lax.psum` over the axis, y stays
    replicated, and the reduced solve is redundantly replicated (it is
    k x k — cheaper than communicating it). See
    parallel.sweep.sharded_factored_hprom.
    """
    y0 = jnp.asarray(y0)
    dtype = y0.dtype
    p6 = blocks.p6.astype(dtype)
    _, n_s, k = p6.shape
    p_flat = p6.reshape(6 * n_s, k)

    hdx = jnp.asarray(0.5 * dt / grid.dx, dtype)
    hdy = jnp.asarray(0.5 * dt / grid.dy, dtype)
    qdx = 0.5 * hdx
    qdy = 0.5 * hdy
    one = jnp.asarray(1.0, dtype)

    src = sampled_source(mesh, grid, mu2, dt, dtype)
    lbc = sampled_inflow_bc(mesh, grid, mu1, dt, dtype)
    src_lbc = src + lbc
    wgt = sample_weights.astype(dtype)
    hi = jax.lax.Precision.HIGHEST

    def scalars(y):
        """One GEMV: the 6 stencil values at every sampled cell."""
        return jnp.matmul(p_flat, y, precision=hi).reshape(6, n_s)

    def half_flux(s):
        """Half the CN flux terms (the current- OR previous-state half
        of the 0.5*(f(w) + f(wp)) divergences), elementwise in scalars."""
        u_s, u_w, u_so, v_s, v_w, v_so = s
        fuv_s = u_s * v_s
        ru = qdx * (u_s * u_s - u_w * u_w) \
            + qdy * (fuv_s - u_so * v_so)
        rv = qdy * (v_s * v_s - v_so * v_so) \
            + qdx * (fuv_s - u_w * v_w)
        return ru, rv

    def residual(s, cp_u, cp_v):
        u_s, v_s = s[0], s[3]
        ru_f, rv_f = half_flux(s)
        ru = u_s + ru_f + cp_u
        rv = v_s + rv_f + cp_v
        return ru, rv

    def step_const(sp):
        """Per-step residual constant from the previous-state scalars:
        -u_p + (previous half of the CN flux) - src - lbc."""
        ru_f, rv_f = half_flux(sp)
        cp_u = -sp[0] + ru_f - src_lbc
        cp_v = -sp[3] + rv_f
        return cp_u, cp_v

    def gn_system(s, ru, rv):
        """Weighted [J V | r] and its Gram extension (one MXU matmul)."""
        u_s, u_w, u_so, v_s, v_w, v_so = s
        cu = jnp.stack([
            one + hdx * u_s + qdy * v_s,     # u_self
            -hdx * u_w,                      # u_west
            -qdy * v_so,                     # u_south
            qdy * u_s,                       # v_self
            jnp.zeros_like(u_s),             # v_west
            -qdy * u_so,                     # v_south
        ])
        cv = jnp.stack([
            qdx * v_s,                       # u_self
            -qdx * v_w,                      # u_west
            jnp.zeros_like(u_s),             # u_south
            one + hdy * v_s + qdx * u_s,     # v_self
            -qdx * u_w,                      # v_west
            -hdy * v_so,                     # v_south
        ])
        ju = jnp.einsum("pn,pnk->nk", cu * wgt, p6, precision=hi)
        jv = jnp.einsum("pn,pnk->nk", cv * wgt, p6, precision=hi)
        a = jnp.concatenate((
            jnp.concatenate((ju, (wgt * ru)[:, None]), axis=1),
            jnp.concatenate((jv, (wgt * rv)[:, None]), axis=1),
        ), axis=0)                                   # (2*n_s, k+1)
        gext = jnp.matmul(a.T, a, precision=hi)      # (k+1, k+1)
        if axis_name is not None:
            gext = jax.lax.psum(gext, axis_name)
        return gext

    def solve_ls(g, b):
        if ls_method == "normal":
            from jax.scipy.linalg import cho_factor, cho_solve
            return cho_solve(cho_factor(g), b)
        # unrolled CG on the (already-formed) normal equations
        x = jnp.zeros_like(b)
        r = b
        p = r
        rs = jnp.vdot(r, r)
        tiny = jnp.asarray(jnp.finfo(dtype).tiny, dtype)
        for _ in range(24):
            gp = jnp.matmul(g, p, precision=hi)
            denom = jnp.vdot(p, gp)
            live = jnp.logical_and(rs > tiny, denom > tiny)
            alpha = jnp.where(live, rs / jnp.where(live, denom, 1.0),
                              0.0)
            x = x + alpha * p
            r = r - alpha * gp
            rs_new = jnp.vdot(r, r)
            beta = jnp.where(live, rs_new / jnp.where(live, rs, 1.0),
                             0.0)
            p = r + beta * p
            rs = rs_new
        return x

    def gn_body(carry):
        y, it, done, rn_prev, init_norm, cp_u, cp_v = carry
        s = scalars(y)
        ru, rv = residual(s, cp_u, cp_v)
        gext = gn_system(s, ru, rv)
        rn = jnp.sqrt(gext[k, k])
        conv = rn / init_norm < relnorm_cutoff
        stag = jnp.logical_and(
            it > 0, jnp.abs(rn_prev - rn) / rn_prev < min_delta)
        stop = jnp.logical_or(jnp.logical_or(conv, stag), done)

        dy = solve_ls(gext[:k, :k], -gext[:k, k])
        y_new = jnp.where(stop, y, y + dy)
        return (y_new, it + (~stop).astype(jnp.int32), stop,
                jnp.where(done, rn_prev, rn), init_norm, cp_u, cp_v)

    def gn_cond(carry):
        _, it, done, _, _, _, _ = carry
        return jnp.logical_and(~done, it < max_its)

    def step(carry, _):
        yp, sp, its = carry
        cp_u, cp_v = step_const(sp)
        ru0, rv0 = residual(sp, cp_u, cp_v)
        sq = jnp.sum((wgt * ru0) ** 2) + jnp.sum((wgt * rv0) ** 2)
        if axis_name is not None:
            sq = jax.lax.psum(sq, axis_name)
        init_norm = jnp.sqrt(sq)

        carry0 = (yp, jnp.int32(0), jnp.bool_(False), init_norm,
                  init_norm, cp_u, cp_v)
        if unroll_its > 0:
            c = carry0
            for _ in range(unroll_its):
                c = gn_body(c)
            y, it = c[0], c[1]
        else:
            y, it = jax.lax.while_loop(gn_cond, gn_body, carry0)[:2]
        return (y, scalars(y), its + it), y

    (_, _, its), ys = jax.lax.scan(
        step, (y0, scalars(y0), jnp.int32(0)), None, length=num_steps)
    red = jnp.concatenate((y0[None, :], ys), axis=0).T
    return ROMResult(red_coords=red, total_gn_its=its)


def precompute_pallas_system(blocks: FactoredBlocks, sample_weights,
                             tile: int = 256):
    """Padded (p6p, wgt_p) device arrays for the fused Pallas system
    (ops/pallas_gn.py). f32 only."""
    from finitedifference_tpu.ops.pallas_gn import pad_factored_inputs

    return pad_factored_inputs(blocks.p6, sample_weights, tile=tile)


@functools.partial(
    jax.jit,
    static_argnames=("grid", "dt", "num_steps", "max_its", "unroll_its",
                     "ls_method", "tile", "interpret"),
)
def pallas_hprom(grid: Grid2D, mesh, p6p, wgt_p, y0, dt, num_steps,
                 mu1, mu2, *, max_its: int = 20,
                 relnorm_cutoff: float = 1e-5, min_delta: float = 0.1,
                 unroll_its: int = 0, ls_method: str = "normal",
                 tile: int = 256, interpret: bool = False) -> ROMResult:
    """factored_hprom with the whole Gauss-Newton system fused into ONE
    Pallas kernel per iteration (ops/pallas_gn.py) — the lowest-latency
    single-run HPROM path. f32 only (Mosaic); `dt` is static (it fixes
    the kernel's stencil constants).

    Identical math and stopping rules to rom.ecsw_hprom; trajectory
    parity is tested in tests/test_pallas_gn.py (interpret mode on CPU).

    ls_method="fused" folds the reduced solve into the system kernel as
    an in-VMEM conjugate-gradient epilogue (ops/pallas_gn.py
    gn_step_pallas): one kernel dispatch per Gauss-Newton iteration.
    """
    from finitedifference_tpu.ops.pallas_gn import (
        gn_step_pallas,
        gn_system_pallas,
    )

    f32 = jnp.float32
    y0 = jnp.asarray(y0, f32)
    n_p, kp = p6p.shape[1], p6p.shape[2]
    n_s = mesh.n_sample
    k = y0.shape[0]
    p_flat = p6p.reshape(6 * n_p, kp)

    hdx = float(0.5 * dt / grid.dx)
    hdy = float(0.5 * dt / grid.dy)
    qdx = jnp.asarray(0.5 * hdx, f32)
    qdy = jnp.asarray(0.5 * hdy, f32)

    pad = (0, n_p - n_s)
    src = jnp.pad(sampled_source(mesh, grid, mu2, dt, f32), pad)
    lbc = jnp.pad(sampled_inflow_bc(mesh, grid, mu1, dt, f32), pad)
    src_lbc = src + lbc
    wgt = wgt_p[:, 0]

    def scalars(y):
        y_pad = jnp.zeros((kp,), f32).at[:k].set(y)
        hi = jax.lax.Precision.HIGHEST
        return jnp.matmul(p_flat, y_pad, precision=hi).reshape(6, n_p)

    def half_flux(s):
        u_s, u_w, u_so, v_s, v_w, v_so = s
        fuv_s = u_s * v_s
        ru = qdx * (u_s * u_s - u_w * u_w) + qdy * (fuv_s - u_so * v_so)
        rv = qdy * (v_s * v_s - v_so * v_so) + qdx * (fuv_s - u_w * v_w)
        return ru, rv

    def step_const(sp):
        ru_f, rv_f = half_flux(sp)
        return jnp.stack((-sp[0] + ru_f - src_lbc, -sp[3] + rv_f),
                         axis=1)                          # (n_p, 2)

    def solve_ls(g, b):
        if ls_method == "normal":
            from jax.scipy.linalg import cho_factor, cho_solve
            return cho_solve(cho_factor(g), b)
        hi = jax.lax.Precision.HIGHEST
        x = jnp.zeros_like(b)
        r = b
        p = r
        rs = jnp.vdot(r, r)
        tiny = jnp.asarray(jnp.finfo(f32).tiny, f32)
        for _ in range(24):
            gp = jnp.matmul(g, p, precision=hi)
            denom = jnp.vdot(p, gp)
            live = jnp.logical_and(rs > tiny, denom > tiny)
            alpha = jnp.where(live, rs / jnp.where(live, denom, 1.0),
                              0.0)
            x = x + alpha * p
            r = r - alpha * gp
            rs_new = jnp.vdot(r, r)
            beta = jnp.where(live, rs_new / jnp.where(live, rs, 1.0),
                             0.0)
            p = r + beta * p
            rs = rs_new
        return x

    def gn_body(carry):
        y, it, done, rn_prev, init_norm, cp = carry
        if ls_method == "fused":
            dy, rn = gn_step_pallas(p6p, y, cp, wgt_p, k, hdx, hdy,
                                    tile=tile, interpret=interpret)
        else:
            gext = gn_system_pallas(p6p, y, cp, wgt_p, k, hdx, hdy,
                                    tile=tile, interpret=interpret)
            rn = jnp.sqrt(gext[k, k])
            dy = solve_ls(gext[:k, :k], -gext[:k, k])
        conv = rn / init_norm < relnorm_cutoff
        stag = jnp.logical_and(
            it > 0, jnp.abs(rn_prev - rn) / rn_prev < min_delta)
        stop = jnp.logical_or(jnp.logical_or(conv, stag), done)
        y_new = jnp.where(stop, y, y + dy)
        return (y_new, it + (~stop).astype(jnp.int32), stop,
                jnp.where(done, rn_prev, rn), init_norm, cp)

    def gn_cond(carry):
        _, it, done, _, _, _ = carry
        return jnp.logical_and(~done, it < max_its)

    def step(carry, _):
        yp, sp, its = carry
        cp = step_const(sp)
        ru0, rv0 = half_flux(sp)
        ru0 = sp[0] + ru0 + cp[:, 0]
        rv0 = sp[3] + rv0 + cp[:, 1]
        init_norm = jnp.sqrt(jnp.sum((wgt * ru0) ** 2)
                             + jnp.sum((wgt * rv0) ** 2))

        carry0 = (yp, jnp.int32(0), jnp.bool_(False), init_norm,
                  init_norm, cp)
        if unroll_its > 0:
            c = carry0
            for _ in range(unroll_its):
                c = gn_body(c)
            y, it = c[0], c[1]
        else:
            y, it = jax.lax.while_loop(gn_cond, gn_body, carry0)[:2]
        return (y, scalars(y), its + it), y

    (_, _, its), ys = jax.lax.scan(
        step, (y0, scalars(y0), jnp.int32(0)), None, length=num_steps)
    red = jnp.concatenate((y0[None, :], ys), axis=0).T
    return ROMResult(red_coords=red, total_gn_its=its)


def precompute_prom_pallas(grid: Grid2D, basis, tile_rows=None):
    """Padded (vu_p, vv_p, dmask, tile_rows) for pallas_prom
    (ops/pallas_gn_full.pad_basis_full + row_mask)."""
    from finitedifference_tpu.ops.pallas_gn_full import (
        pad_basis_full,
        row_mask,
    )

    vu_p, vv_p, tr = pad_basis_full(basis, grid, tile_rows)
    return vu_p, vv_p, row_mask(grid, tr), tr


@functools.partial(
    jax.jit,
    static_argnames=("grid", "dt", "num_steps", "max_its", "unroll_its",
                     "ls_method", "interpret", "tile_rows", "ls_dtype"),
)
def pallas_prom(grid: Grid2D, vu_p, vv_p, dmask, y0, dt, num_steps,
                mu1, mu2, *, max_its: int = 20,
                relnorm_cutoff: float = 1e-5, min_delta: float = 0.1,
                unroll_its: int = 0, ls_method: str = "normal",
                interpret: bool = False,
                tile_rows: int = 4, ls_dtype=None) -> ROMResult:
    """FULL-GRID LSPG PROM with the streaming Pallas Gauss-Newton
    system (ops/pallas_gn_full.py) — the fast engine for the unsampled
    path (VERDICT r3 #2).

    Per Gauss-Newton iteration: ONE kernel streaming the padded basis
    once from HBM (scalars, residual, J V row contributions and the
    (k+1, k+1) Gram extension fused; west shift in-tile, south halo via
    VMEM row carry) + the tiny reduced solve. The first iteration of
    each step runs the `first` kernel variant which also derives and
    emits the CN step constant, so a time step costs exactly `its`
    basis reads. Same math and stopping rules as rom.lspg_prom
    (reference gauss_newton_LSPG, hypernet2D.py:1859-1929); trajectory
    parity is tested in tests/test_pallas_gn_full.py.

    f32 only (Mosaic); `dt` is static. unroll_its > 0 replaces the
    dynamic while_loop with that many total masked iterations
    (including the mandatory first), as in factored_hprom.
    """
    from finitedifference_tpu.ops.pallas_gn_full import (
        _round_up,
        gn_full_first_pallas,
        gn_full_system_pallas,
    )
    from finitedifference_tpu.ops.stencil import (
        inflow_bc_term,
        source_term,
    )

    f32 = jnp.float32
    y0 = jnp.asarray(y0, f32)
    k = y0.shape[0]
    n_pad = vu_p.shape[0]
    nxp = _round_up(grid.nx + 1, 8)      # dead-cell row layout
    ny_pad = n_pad // nxp
    # dmask is full-length (n_pad, 1) since r5 (dead-ROW masking), so
    # the processing tile comes from the layout's tile_rows
    tile = tile_rows * nxp
    sdt = jnp.float32 if ls_dtype is None else ls_dtype
    hdx = float(0.5 * dt / grid.dx)
    hdy = float(0.5 * dt / grid.dy)

    slbc2d = source_term(grid, mu2, dt, f32) \
        + inflow_bc_term(grid, mu1, dt, f32)
    slbc = jnp.zeros((ny_pad, nxp), f32).at[
        : grid.ny, : grid.nx].set(slbc2d).reshape(n_pad, 1)

    def solve_ls(gext):
        # The r4 accuracy loss (VERDICT r4 #2) was root-caused to
        # unmasked dead-row flux in the Gram (ops/pallas_gn_full.py
        # row_mask, scripts/probe_pallas_gram.py), NOT precision: the
        # system is near-perfectly conditioned (cond(G) ~ 1.5 at the
        # shock), so the default f32 reduced solve is accurate and
        # ~15x cheaper than emulated f64 on this backend. ls_dtype=f64
        # remains available. Cholesky, not LU: axon has no f64 LU.
        g, b = gext[:k, :k], -gext[:k, k]
        if ls_method == "normal":
            from jax.scipy.linalg import cho_factor, cho_solve
            return cho_solve(cho_factor(g), b)
        x = jnp.zeros_like(b)
        r = b
        p = r
        rs = jnp.vdot(r, r)
        tiny = jnp.asarray(jnp.finfo(f32).tiny, b.dtype)
        hi = jax.lax.Precision.HIGHEST
        for _ in range(24):
            gp = jnp.matmul(g, p, precision=hi)
            denom = jnp.vdot(p, gp)
            live = jnp.logical_and(rs > tiny, denom > tiny)
            alpha = jnp.where(live, rs / jnp.where(live, denom, 1.0),
                              0.0)
            x = x + alpha * p
            r = r - alpha * gp
            rs_new = jnp.vdot(r, r)
            beta = jnp.where(live, rs_new / jnp.where(live, rs, 1.0),
                             0.0)
            p = r + beta * p
            rs = rs_new
        return x

    def gn_body(carry):
        y, it, done, rn_prev, init_norm, cp = carry
        gext = gn_full_system_pallas(vu_p, vv_p, y, cp, dmask, k,
                                     nxp, tile, hdx, hdy,
                                     interpret=interpret).astype(sdt)
        rn = jnp.sqrt(gext[k, k])
        conv = rn / init_norm < relnorm_cutoff
        stag = jnp.logical_and(
            it > 0, jnp.abs(rn_prev - rn) / rn_prev < min_delta)
        stop = jnp.logical_or(jnp.logical_or(conv, stag), done)
        dy = solve_ls(gext)
        # update in the solve dtype, round once back to the f32 stream
        y_new = jnp.where(stop, y,
                          (y.astype(dy.dtype) + dy).astype(f32))
        return (y_new, it + (~stop).astype(jnp.int32), stop,
                jnp.where(done, rn_prev, rn), init_norm, cp)

    def gn_cond(carry):
        _, it, done, _, _, _ = carry
        return jnp.logical_and(~done, it < max_its)

    def step(carry, _):
        yp, its = carry
        gext0, cp = gn_full_first_pallas(vu_p, vv_p, yp, slbc, dmask,
                                         k, nxp, tile, hdx, hdy,
                                         interpret=interpret)
        gext0 = gext0.astype(sdt)
        init_norm = jnp.sqrt(gext0[k, k])
        dy0 = solve_ls(gext0)
        y1 = (yp.astype(dy0.dtype) + dy0).astype(f32)
        carry1 = (y1, jnp.int32(1), jnp.bool_(False), init_norm,
                  init_norm, cp)
        if unroll_its > 0:
            c = carry1
            for _ in range(unroll_its - 1):
                c = gn_body(c)
            y, it = c[0], c[1]
        else:
            y, it = jax.lax.while_loop(gn_cond, gn_body, carry1)[:2]
        return (y, its + it), y

    (_, its), ys = jax.lax.scan(step, (y0, jnp.int32(0)), None,
                                length=num_steps)
    red = jnp.concatenate((y0[None, :], ys), axis=0).T
    return ROMResult(red_coords=red, total_gn_its=its)


def pallas_traj_hprom(grid: Grid2D, mesh, p6p, wgt_p, y0, dt, num_steps,
                      mu1, mu2, *, unroll_its: int = 3,
                      solve_iters: int = 24,
                      relnorm_cutoff: float = 1e-5,
                      min_delta: float = 0.1,
                      interpret: bool = False) -> ROMResult:
    """The whole HPROM time integration in ONE Pallas kernel dispatch.

    Where pallas_hprom (above) pays one kernel per Gauss-Newton
    iteration (~1000 dispatches on the canonical 500-step runs, each
    ~100 us of launch latency on this backend), this engine runs the
    full lax.fori_loop over time steps INSIDE the kernel with every
    operand VMEM-resident (ops/pallas_gn.py::_make_traj_kernel): one
    dispatch, one HBM read of the stencil blocks, ~6 MB total traffic
    for the entire run. Gauss-Newton is `unroll_its` masked iterations
    (the reference observes 2-3 its/step; iterations past the stopping
    rules freeze y, so trajectories match the dynamic loop whenever it
    stops within budget) and the reduced solve is the in-VMEM CG.

    f32 only (Mosaic); `dt`, mu1, mu2 are static (they fix the kernel's
    stencil constants). Same math/stopping rules as rom.ecsw_hprom
    (tested in tests/test_pallas_gn.py, interpret mode).
    """
    from finitedifference_tpu.ops.pallas_gn import (
        trajectory_hprom_pallas,
    )

    f32 = jnp.float32
    y0 = jnp.asarray(y0, f32)
    k = y0.shape[0]
    n_p = p6p.shape[1]
    n_s = mesh.n_sample
    hdx = float(0.5 * dt / grid.dx)
    hdy = float(0.5 * dt / grid.dy)

    pad = (0, n_p - n_s)
    src = jnp.pad(sampled_source(mesh, grid, mu2, dt, f32), pad)
    lbc = jnp.pad(sampled_inflow_bc(mesh, grid, mu1, dt, f32), pad)
    slbc_p = (src + lbc)[:, None]

    ys, its = trajectory_hprom_pallas(
        p6p, y0, slbc_p, wgt_p, k, hdx, hdy, int(num_steps),
        unroll_its=unroll_its, solve_iters=solve_iters,
        relnorm_cutoff=relnorm_cutoff, min_delta=min_delta,
        interpret=interpret)
    red = jnp.concatenate((y0[None, :], ys), axis=0).T
    return ROMResult(red_coords=red, total_gn_its=its)
