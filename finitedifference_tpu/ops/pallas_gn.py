"""Pallas TPU kernel for the factored HPROM Gauss-Newton system.

One pallas_call evaluates the ENTIRE sampled Gauss-Newton system
(rom_factored.py): per grid tile of sampled cells it contracts the six
stencil basis blocks with y (MXU), forms the residual and the Jacobian
row coefficients elementwise (VPU), assembles the weighted rows of
[J V | r] in registers, and accumulates the (k+1, k+1) Gram extension in
a VMEM scratch — so one Gauss-Newton iteration costs ONE kernel dispatch
plus the tiny reduced solve, instead of the ~8 XLA kernels of the pure
factored path. HBM traffic per iteration is exactly one pass over the
padded blocks (~6 MB on the 250^2 NNLS mesh).

float32 only (Mosaic has no f64), traced under jax.enable_x64(False)
like ops/pallas_wavefront.py (i64 grid machinery fails to lower on this
backend). Zero-padding conventions: sampled cells are padded to a tile
multiple with weight 0 (their rows vanish from the Gram); the mode axis
is padded to 128 lanes with zero basis columns, and the weighted
residual occupies lane `k` of the extension — so gext[:k, :k] is the
Gram, gext[:k, k] is J^T W^2 r, and gext[k, k] is ||W r||^2.

Stencil scalars live as (tile, 1) column vectors inside the kernel: that
is exactly the broadcast shape the Jacobian row assembly needs against
the (tile, KP) blocks, so no transposes occur anywhere.

No reference counterpart (the reference's gauss_newton_ECSW_2D,
hypernet2D.py:1859-1930, builds the same normal equations from scipy
sparse products); this is the TPU-native fusion of it (VERDICT r2 #4).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

KP = 128          # lane tile: the mode axis pads to a multiple of this.
# k + 1 <= 128 fits one lane tile (the canonical 95-mode runs); larger
# bases (the 150-mode fine campaign) pad to 256 lanes — Mosaic handles
# multi-tile lane axes natively, the dots just span two MXU passes.
# f32 dots must force HIGHEST precision: the MXU's DEFAULT f32 path
# multiplies in single-pass bf16 (8-bit mantissa), which wrecked the
# hardware trajectories at 6-11% error while interpret-mode parity
# tests (true f32) passed — the in-kernel twin of the round-2 closure
# root cause (precision.py::hi_matmul).
HI = jax.lax.Precision.HIGHEST


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _make_kernel(k: int, tile: int, hdx: float, hdy: float,
                 kp: int = KP):
    hdx = np.float32(hdx)
    hdy = np.float32(hdy)
    qdx = np.float32(0.5 * hdx)
    qdy = np.float32(0.5 * hdy)
    one = np.float32(1.0)
    f32 = jnp.float32

    def kernel(p6_ref, y_ref, cp_ref, wgt_ref, gext_ref, acc_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        y = y_ref[...]                       # (KP, 1)

        def dot_y(p):
            return jax.lax.dot_general(
                p6_ref[p], y, (((1,), (0,)), ((), ())),
                preferred_element_type=f32, precision=HI)  # (tile, 1)

        u_s, u_w, u_so = dot_y(0), dot_y(1), dot_y(2)
        v_s, v_w, v_so = dot_y(3), dot_y(4), dot_y(5)

        cp_u = cp_ref[:, 0:1]                # (tile, 1)
        cp_v = cp_ref[:, 1:2]
        wgt = wgt_ref[...]                   # (tile, 1)

        fuv = u_s * v_s
        ru = u_s + qdx * (u_s * u_s - u_w * u_w) \
            + qdy * (fuv - u_so * v_so) + cp_u
        rv = v_s + qdy * (v_s * v_s - v_so * v_so) \
            + qdx * (fuv - u_w * v_w) + cp_v

        # Jacobian row coefficients (rom_factored.gn_system), pre-scaled
        # by the ECSW weight so the assembled rows are the weighted ones
        cu0 = (one + hdx * u_s + qdy * v_s) * wgt
        cu1 = (-hdx * u_w) * wgt
        cu2 = (-qdy * v_so) * wgt
        cu3 = (qdy * u_s) * wgt
        cu5 = (-qdy * u_so) * wgt
        cv0 = (qdx * v_s) * wgt
        cv1 = (-qdx * v_w) * wgt
        cv3 = (one + hdy * v_s + qdx * u_s) * wgt
        cv4 = (-qdx * u_w) * wgt
        cv5 = (-hdy * v_so) * wgt

        ju = cu0 * p6_ref[0] + cu1 * p6_ref[1] + cu2 * p6_ref[2] \
            + cu3 * p6_ref[3] + cu5 * p6_ref[5]
        jv = cv0 * p6_ref[0] + cv1 * p6_ref[1] + cv3 * p6_ref[3] \
            + cv4 * p6_ref[4] + cv5 * p6_ref[5]

        # weighted residual into lane k (basis lanes >= k are zero)
        lane = jax.lax.broadcasted_iota(jnp.int32, (tile, kp), 1)
        au = jnp.where(lane == k, ru * wgt, ju)
        av = jnp.where(lane == k, rv * wgt, jv)

        acc_ref[...] += (
            jax.lax.dot_general(au, au, (((0,), (0,)), ((), ())),
                                preferred_element_type=f32, precision=HI)
            + jax.lax.dot_general(av, av, (((0,), (0,)), ((), ())),
                                  preferred_element_type=f32, precision=HI))

        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            gext_ref[...] = acc_ref[...]

    return kernel


def _make_step_kernel(k: int, tile: int, hdx: float, hdy: float,
                      solve_iters: int, kp: int = KP):
    """System kernel + in-VMEM CG epilogue, so one Gauss-Newton
    iteration is ONE kernel dispatch total.

    The CG runs in ROW-vector form ((1, KP) lanes — G is symmetric, so
    p @ G == (G @ p^T)^T) and the result lands in a single (8, KP)
    output block (row 0 = dy, row 1 lane 0 = ||Wr||): Mosaic lowers
    full-lane row blocks reliably where (KP, 1) / (1, 1) outputs are
    fragile."""
    base = _make_kernel(k, tile, hdx, hdy, kp)
    f32 = jnp.float32

    def kernel(p6_ref, y_ref, cp_ref, wgt_ref, out_ref, acc_ref):
        # accumulate the Gram extension exactly as the base kernel does,
        # writing the final copy into the scratch itself
        base(p6_ref, y_ref, cp_ref, wgt_ref, acc_ref, acc_ref)

        @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
        def _():
            g = acc_ref[...]
            row = jax.lax.broadcasted_iota(jnp.int32, (kp, kp), 0)
            col = jax.lax.broadcasted_iota(jnp.int32, (kp, kp), 1)
            # mask the residual row/col out of the solve: rows/cols > k
            # are zero already (zero basis lanes), row/col k carries
            # [J^T W^2 r | ||Wr||^2]
            g_s = jnp.where(jnp.logical_or(row == k, col == k),
                            f32(0.0), g)
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, kp), 1)
            b = jnp.where(lane == k, f32(0.0), -g[k:k + 1, :])

            x = jnp.zeros((1, kp), f32)
            r = b
            p = r
            rs = jnp.sum(r * r)
            tiny = f32(np.finfo(np.float32).tiny)
            for _ in range(solve_iters):
                gp = jax.lax.dot_general(
                    p, g_s, (((1,), (0,)), ((), ())),
                    preferred_element_type=f32, precision=HI)
                denom = jnp.sum(p * gp)
                live = jnp.logical_and(rs > tiny, denom > tiny)
                alpha = jnp.where(live,
                                  rs / jnp.where(live, denom, f32(1.0)),
                                  f32(0.0))
                x = x + alpha * p
                r = r - alpha * gp
                rs_new = jnp.sum(r * r)
                beta = jnp.where(live,
                                 rs_new / jnp.where(live, rs, f32(1.0)),
                                 f32(0.0))
                p = r + beta * p
                rs = rs_new
            rn_row = jnp.where(lane == 0,
                               jnp.sqrt(g[k:k + 1, k:k + 1]), f32(0.0))
            out_ref[0:1, :] = x
            out_ref[1:2, :] = rn_row
            out_ref[2:8, :] = jnp.zeros((6, kp), f32)

    return kernel


def gn_step_pallas(p6p, y, cp, wgt_p, k: int, hdx: float, hdy: float,
                   *, tile: int = 256, solve_iters: int = 24,
                   interpret: bool = False):
    """One FULLY fused Gauss-Newton iteration: system build + masked
    in-VMEM CG solve in a single kernel. Returns (dy (k,), rn scalar)."""
    with jax.enable_x64(False):
        out = _gn_step_pallas(p6p, y, cp, wgt_p, k, hdx, hdy,
                              tile=tile, solve_iters=solve_iters,
                              interpret=interpret)
    return out[0, :k], out[1, 0]


@functools.partial(jax.jit,
                   static_argnames=("k", "hdx", "hdy", "tile",
                                    "solve_iters", "interpret"))
def _gn_step_pallas(p6p, y, cp, wgt_p, k, hdx, hdy, *, tile,
                    solve_iters, interpret):
    f32 = jnp.float32
    n_p, kp = p6p.shape[1], p6p.shape[2]
    y_pad = jnp.zeros((kp, 1), f32).at[:k, 0].set(y.astype(f32))
    kernel = _make_step_kernel(k, tile, hdx, hdy, solve_iters, kp)
    return pl.pallas_call(
        kernel,
        grid=(n_p // tile,),
        in_specs=[
            pl.BlockSpec((6, tile, kp), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kp, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, kp), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, kp), f32),
        scratch_shapes=[pltpu.VMEM((kp, kp), f32)],
        interpret=interpret,
    )(p6p.astype(f32), y_pad, cp.astype(f32), wgt_p.astype(f32))


def _make_traj_kernel(k: int, n_p: int, hdx: float, hdy: float,
                      num_steps: int, unroll_its: int, solve_iters: int,
                      relnorm_cutoff: float, min_delta: float,
                      kp: int = KP):
    """Whole-trajectory kernel: the ENTIRE num_steps x unroll_its
    Gauss-Newton time integration in ONE kernel dispatch.

    Everything lives in VMEM for the whole run — the six stencil basis
    blocks (~6 MB on the 250^2 NNLS mesh), the per-cell constants, the
    reduced state — so the 500-step online solve pays ONE dispatch and
    ONE HBM read of the blocks, instead of one dispatch per Gauss-Newton
    iteration (~1000 on the canonical runs). The reduced solve is the
    row-vector in-VMEM CG of _make_step_kernel; the GN loop is
    `unroll_its` masked iterations (reference stopping rules preserved;
    iterations past stop freeze y, exactly rom_factored.factored_hprom's
    unroll path); the time loop is a lax.fori_loop whose carry is the
    (1, KP) reduced state row.

    All shapes are row-form (1, KP) / (n_p, KP): dots contract on the
    lane axis so no transposes occur anywhere in the kernel.
    """
    hdx = np.float32(hdx)
    hdy = np.float32(hdy)
    qdx = np.float32(0.5 * hdx)
    qdy = np.float32(0.5 * hdy)
    one = np.float32(1.0)
    cutoff = np.float32(relnorm_cutoff)
    mdelta = np.float32(min_delta)
    f32 = jnp.float32
    tiny = np.float32(np.finfo(np.float32).tiny)

    def kernel(p6_ref, y0_ref, slbc_ref, wgt_ref, ys_ref, stats_ref):
        wgt = wgt_ref[...]                    # (n_p, 1)
        slbc = slbc_ref[...]                  # (n_p, 1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (n_p, kp), 1)
        glane = jax.lax.broadcasted_iota(jnp.int32, (1, kp), 1)
        grow = jax.lax.broadcasted_iota(jnp.int32, (kp, kp), 0)
        gcol = jax.lax.broadcasted_iota(jnp.int32, (kp, kp), 1)

        def dot_y(p, y):
            # (n_p, KP) x (1, KP) contracted on lanes -> (n_p, 1)
            return jax.lax.dot_general(
                p6_ref[p], y, (((1,), (1,)), ((), ())),
                preferred_element_type=f32, precision=HI)

        def scalars(y):
            return (dot_y(0, y), dot_y(1, y), dot_y(2, y),
                    dot_y(3, y), dot_y(4, y), dot_y(5, y))

        def half_flux(s):
            u_s, u_w, u_so, v_s, v_w, v_so = s
            fuv = u_s * v_s
            ru = qdx * (u_s * u_s - u_w * u_w) \
                + qdy * (fuv - u_so * v_so)
            rv = qdy * (v_s * v_s - v_so * v_so) \
                + qdx * (fuv - u_w * v_w)
            return ru, rv

        def cg_solve(g):
            # masked row-vector CG: rows/cols k carry [J^T W^2 r|.];
            # lanes > k are zero already (zero basis lanes)
            g_s = jnp.where(jnp.logical_or(grow == k, gcol == k),
                            f32(0.0), g)
            b = jnp.where(glane == k, f32(0.0), -g[k:k + 1, :])
            x = jnp.zeros((1, kp), f32)
            r = b
            p = r
            rs = jnp.sum(r * r)
            for _ in range(solve_iters):
                gp = jax.lax.dot_general(
                    p, g_s, (((1,), (0,)), ((), ())),
                    preferred_element_type=f32, precision=HI)
                denom = jnp.sum(p * gp)
                live = jnp.logical_and(rs > tiny, denom > tiny)
                alpha = jnp.where(live,
                                  rs / jnp.where(live, denom, f32(1.0)),
                                  f32(0.0))
                x = x + alpha * p
                r = r - alpha * gp
                rs_new = jnp.sum(r * r)
                beta = jnp.where(live,
                                 rs_new / jnp.where(live, rs, f32(1.0)),
                                 f32(0.0))
                p = r + beta * p
                rs = rs_new
            return x

        def gn_iter(y, cp_u, cp_v, it, done, rn_prev, init_norm):
            s = scalars(y)
            u_s, u_w, u_so, v_s, v_w, v_so = s
            ru_f, rv_f = half_flux(s)
            ru = u_s + ru_f + cp_u
            rv = v_s + rv_f + cp_v
            cu0 = (one + hdx * u_s + qdy * v_s) * wgt
            cu1 = (-hdx * u_w) * wgt
            cu2 = (-qdy * v_so) * wgt
            cu3 = (qdy * u_s) * wgt
            cu5 = (-qdy * u_so) * wgt
            cv0 = (qdx * v_s) * wgt
            cv1 = (-qdx * v_w) * wgt
            cv3 = (one + hdy * v_s + qdx * u_s) * wgt
            cv4 = (-qdx * u_w) * wgt
            cv5 = (-hdy * v_so) * wgt
            ju = cu0 * p6_ref[0] + cu1 * p6_ref[1] + cu2 * p6_ref[2] \
                + cu3 * p6_ref[3] + cu5 * p6_ref[5]
            jv = cv0 * p6_ref[0] + cv1 * p6_ref[1] + cv3 * p6_ref[3] \
                + cv4 * p6_ref[4] + cv5 * p6_ref[5]
            au = jnp.where(lane == k, ru * wgt, ju)
            av = jnp.where(lane == k, rv * wgt, jv)
            g = (jax.lax.dot_general(au, au, (((0,), (0,)), ((), ())),
                                     preferred_element_type=f32, precision=HI)
                 + jax.lax.dot_general(av, av, (((0,), (0,)), ((), ())),
                                       preferred_element_type=f32, precision=HI))
            rn = jnp.sqrt(g[k, k])
            conv = rn / init_norm < cutoff
            stag = jnp.logical_and(
                it > 0, jnp.abs(rn_prev - rn) / rn_prev < mdelta)
            stop = jnp.logical_or(jnp.logical_or(conv, stag), done)
            dy = cg_solve(g)
            y_new = jnp.where(stop, y, y + dy)
            return (y_new, it + (~stop).astype(jnp.int32), stop,
                    jnp.where(done, rn_prev, rn))

        def time_step(t, carry):
            y, its = carry
            sp = scalars(y)
            ru_f, rv_f = half_flux(sp)
            cp_u = -sp[0] + ru_f - slbc
            cp_v = -sp[3] + rv_f
            # residual at the step start (u = up): 2*half_flux - slbc
            ru0 = sp[0] + ru_f + cp_u
            rv0 = sp[3] + rv_f + cp_v
            init_norm = jnp.sqrt(jnp.sum((wgt * ru0) ** 2)
                                 + jnp.sum((wgt * rv0) ** 2))
            it = jnp.int32(0)
            done = jnp.bool_(False)
            rn_prev = init_norm
            for _ in range(unroll_its):
                y, it, done, rn_prev = gn_iter(y, cp_u, cp_v, it, done,
                                               rn_prev, init_norm)
            ys_ref[pl.ds(t, 1), :] = y
            return (y, its + it)

        y0 = y0_ref[...]                      # (1, KP)
        _, its = jax.lax.fori_loop(0, num_steps, time_step,
                                   (y0, jnp.int32(0)))
        stats_ref[...] = jnp.where(
            jnp.logical_and(grow[:8, :] == 0, gcol[:8, :] == 0),
            its.astype(f32), f32(0.0))

    return kernel


def trajectory_hprom_pallas(p6p, y0, slbc_p, wgt_p, k: int, hdx: float,
                            hdy: float, num_steps: int, *,
                            unroll_its: int = 3, solve_iters: int = 24,
                            relnorm_cutoff: float = 1e-5,
                            min_delta: float = 0.1,
                            interpret: bool = False):
    """Run the whole HPROM trajectory in one kernel dispatch.

    Returns (ys (num_steps, k) reduced coords after each step,
    total_gn_its int32). See rom_factored.pallas_traj_hprom for the
    user-facing stepper."""
    with jax.enable_x64(False):
        ys, stats = _trajectory_hprom_pallas(
            p6p, y0, slbc_p, wgt_p, k, hdx, hdy, num_steps,
            unroll_its=unroll_its, solve_iters=solve_iters,
            relnorm_cutoff=relnorm_cutoff, min_delta=min_delta,
            interpret=interpret)
    return ys[:, :k], stats[0, 0].astype(jnp.int32)


@functools.partial(jax.jit,
                   static_argnames=("k", "hdx", "hdy", "num_steps",
                                    "unroll_its", "solve_iters",
                                    "relnorm_cutoff", "min_delta",
                                    "interpret"))
def _trajectory_hprom_pallas(p6p, y0, slbc_p, wgt_p, k, hdx, hdy,
                             num_steps, *, unroll_its, solve_iters,
                             relnorm_cutoff, min_delta, interpret):
    f32 = jnp.float32
    n_p, kp = p6p.shape[1], p6p.shape[2]
    y0_row = jnp.zeros((1, kp), f32).at[0, :k].set(y0.astype(f32))
    kernel = _make_traj_kernel(k, n_p, hdx, hdy, num_steps, unroll_its,
                               solve_iters, relnorm_cutoff, min_delta,
                               kp)
    return pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((6, n_p, kp), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_p, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_p, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((num_steps, kp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, kp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((num_steps, kp), f32),
            jax.ShapeDtypeStruct((8, kp), f32),
        ],
        # the whole-trajectory kernel's live set (six (n_p, KP) blocks +
        # unrolled GN temporaries + the (num_steps, KP) output) exceeds
        # Mosaic's default 16 MB scoped-vmem cap (observed 27 MB on the
        # 250^2 NNLS mesh); v5e VMEM is 128 MB, so raise the cap rather
        # than spill to HBM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(p6p.astype(f32), y0_row, slbc_p.astype(f32), wgt_p.astype(f32))


def pad_factored_inputs(p6, wgt, tile: int = 256):
    """Pad (6, n_s, k) blocks and (n_s,) weights for the kernel.

    Returns (p6p (6, n_p, kp) f32, wgt_p (n_p, 1) f32) with n_p a tile
    multiple and kp = k + 1 rounded up to a 128-lane multiple (the
    residual occupies lane k); padded cells carry weight 0 and zero
    basis rows.
    """
    p6 = np.asarray(p6, np.float32)
    wgt = np.asarray(wgt, np.float32)
    _, n_s, k = p6.shape
    kp = _round_up(k + 1, KP)
    n_p = _round_up(n_s, tile)
    p6p = np.zeros((6, n_p, kp), np.float32)
    p6p[:, :n_s, :k] = p6
    wgt_p = np.zeros((n_p, 1), np.float32)
    wgt_p[:n_s, 0] = wgt
    return jnp.asarray(p6p), jnp.asarray(wgt_p)


def gn_system_pallas(p6p, y, cp, wgt_p, k: int, hdx: float, hdy: float,
                     *, tile: int = 256, interpret: bool = False):
    """One fused Gauss-Newton system evaluation.

    p6p:  (6, n_p, KP) padded blocks (pad_factored_inputs)
    y:    (k,) reduced coords (f32)
    cp:   (n_p, 2) per-step residual constants [cp_u, cp_v] columns
    wgt_p:(n_p, 1) padded ECSW weights
    Returns gext (KP, KP): [:k,:k] Gram, [:k,k] J^T W^2 r, [k,k] ||Wr||^2.
    """
    with jax.enable_x64(False):
        return _gn_system_pallas(p6p, y, cp, wgt_p, k, hdx, hdy,
                                 tile=tile, interpret=interpret)


@functools.partial(jax.jit,
                   static_argnames=("k", "hdx", "hdy", "tile",
                                    "interpret"))
def _gn_system_pallas(p6p, y, cp, wgt_p, k, hdx, hdy, *, tile,
                      interpret):
    f32 = jnp.float32
    n_p, kp = p6p.shape[1], p6p.shape[2]
    y_pad = jnp.zeros((kp, 1), f32).at[:k, 0].set(y.astype(f32))
    kernel = _make_kernel(k, tile, hdx, hdy, kp)
    return pl.pallas_call(
        kernel,
        grid=(n_p // tile,),
        in_specs=[
            pl.BlockSpec((6, tile, kp), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kp, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((kp, kp), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((kp, kp), f32),
        scratch_shapes=[pltpu.VMEM((kp, kp), f32)],
        interpret=interpret,
    )(p6p.astype(f32), y_pad, cp.astype(f32), wgt_p.astype(f32))
