"""Pallas TPU kernel for the wavefront triangular solve.

The lax.scan wavefront (ops/wavefront.py) is exact but latency-bound:
2N-1 sequential scan steps of ~N-element vector work each, costing
~100us of per-step overhead on TPU (≈150 ms/solve at 750^2). This kernel
runs the entire substitution inside ONE Pallas program: the grid loops
over blocks of diagonals (Pallas auto-pipelines their HBM->VMEM
transfers), a `fori_loop` walks the diagonals inside each block, and the
previous-diagonal carry lives in a persistent VMEM scratch. The lane
dimension is the skewed row index, so every per-diagonal update is a
dense (1, ny_pad) VPU op.

float32 only (Mosaic has no f64); pair with an f64 Newton for
reference-precision trajectories (fom.newton_step(solve_dtype=float32)):
the residuals and updates stay f64, the inner solve is f32, and inexact
Newton absorbs the difference in ~1-2 extra iterations.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from finitedifference_tpu.grid import Grid2D
from finitedifference_tpu.ops.wavefront import skew, unskew


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _make_kernel(nx: int, ny: int, ny_pad: int, block: int,
                 kx: float, ky: float):
    import numpy as np

    # plain numpy scalars: jnp scalars would be captured traced consts,
    # which pallas_call rejects
    kx = np.float32(kx)
    ky = np.float32(ky)
    one = np.float32(1.0)
    half = np.float32(0.5)
    zero = np.float32(0.0)

    def kernel(su_ref, sv_ref, sfu_ref, sfv_ref, sdu_ref, sdv_ref,
               prev_ref, p_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            prev_ref[...] = jnp.zeros_like(prev_ref)

        r_ids = jax.lax.broadcasted_iota(jnp.int32, (1, ny_pad), 1)

        # ---- vectorized prologue (full VPU width, OUTSIDE the chain):
        # the 2x2 block-inverse coefficients depend only on the streamed
        # current-diagonal state, so compute them for the whole block at
        # once with the anti-diagonal band mask folded in — the
        # sequential substitution chain then pays 4 scratch-row reads
        # instead of the ~13-op b-matrix/det/mask tail it used to carry
        # (measured: the solve is latency- not bandwidth-bound).
        su_b = su_ref[...]                   # (block, ny_pad)
        sv_b = sv_ref[...]
        rr = jax.lax.broadcasted_iota(jnp.int32, (block, ny_pad), 1)
        dd = i * block \
            + jax.lax.broadcasted_iota(jnp.int32, (block, ny_pad), 0)
        vmask = jnp.logical_and(
            rr <= dd, jnp.logical_and(dd - rr < nx, rr < ny))
        b11 = one + kx * su_b + half * ky * sv_b
        b12 = half * ky * su_b
        b21 = half * kx * sv_b
        b22 = one + ky * sv_b + half * kx * su_b
        inv_det = one / (b11 * b22 - b12 * b21)
        zb = jnp.zeros_like(su_b)
        p_ref[pl.ds(0, block), :] = jnp.where(vmask, b22 * inv_det, zb)
        p_ref[pl.ds(block, block), :] = jnp.where(vmask, b12 * inv_det,
                                                  zb)
        p_ref[pl.ds(2 * block, block), :] = jnp.where(
            vmask, b21 * inv_det, zb)
        p_ref[pl.ds(3 * block, block), :] = jnp.where(
            vmask, b11 * inv_det, zb)

        def body(k, _):
            u_d = su_ref[pl.ds(k, 1), :]
            v_d = sv_ref[pl.ds(k, 1), :]
            fu_d = sfu_ref[pl.ds(k, 1), :]
            fv_d = sfv_ref[pl.ds(k, 1), :]

            # one packed roll shifts all four carries along lanes
            prev = prev_ref[...]             # (4, ny_pad)
            shifted = jnp.where(r_ids == 0, zero,
                                pltpu.roll(prev, 1, axis=1))
            du_p = prev[0:1, :]
            dv_p = prev[1:2, :]
            u_p = prev[2:3, :]
            v_p = prev[3:4, :]
            du_s = shifted[0:1, :]
            dv_s = shifted[1:2, :]
            u_s = shifted[2:3, :]
            v_s = shifted[3:4, :]

            rhs_u = fu_d + kx * u_p * du_p \
                + half * ky * (v_s * du_s + u_s * dv_s)
            rhs_v = fv_d + half * kx * (v_p * du_p + u_p * dv_p) \
                + ky * v_s * dv_s

            du_d = p_ref[pl.ds(k, 1), :] * rhs_u \
                - p_ref[pl.ds(block + k, 1), :] * rhs_v
            dv_d = p_ref[pl.ds(3 * block + k, 1), :] * rhs_v \
                - p_ref[pl.ds(2 * block + k, 1), :] * rhs_u

            sdu_ref[pl.ds(k, 1), :] = du_d
            sdv_ref[pl.ds(k, 1), :] = dv_d
            prev_ref[0:1, :] = du_d
            prev_ref[1:2, :] = dv_d
            prev_ref[2:3, :] = u_d
            prev_ref[3:4, :] = v_d
            return np.int32(0)

        jax.lax.fori_loop(np.int32(0), np.int32(block), body, np.int32(0))

    return kernel


def _make_kernel_reg(nx: int, ny: int, ny_pad: int, block: int,
                     kx: float, ky: float, unroll: int = 8):
    """Chain variant with the carry as a fori_loop VALUE (register
    file), not VMEM scratch (round 5, VERDICT r4 #5).

    The r4 kernel round-trips the 4-row carry through `prev_ref` VMEM
    every diagonal: write-then-read latency sits ON the 2N-1-step
    critical path. Here the packed (4, ny_pad) carry rides the loop
    carry so Mosaic can keep it in vector registers, and the loop is
    unrolled so the per-diagonal index arithmetic and the independent
    streams (su/sfu row reads, output writes) of consecutive diagonals
    overlap; only the inter-block handoff touches `prev_ref`.
    """
    import numpy as np

    kx = np.float32(kx)
    ky = np.float32(ky)
    one = np.float32(1.0)
    half = np.float32(0.5)
    zero = np.float32(0.0)

    def kernel(su_ref, sv_ref, sfu_ref, sfv_ref, sdu_ref, sdv_ref,
               prev_ref, p_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            prev_ref[...] = jnp.zeros_like(prev_ref)

        r_ids = jax.lax.broadcasted_iota(jnp.int32, (1, ny_pad), 1)

        # vectorized prologue (identical to the scratch variant): 2x2
        # block-inverse coefficients for the whole block, band-masked
        su_b = su_ref[...]
        sv_b = sv_ref[...]
        rr = jax.lax.broadcasted_iota(jnp.int32, (block, ny_pad), 1)
        dd = i * block \
            + jax.lax.broadcasted_iota(jnp.int32, (block, ny_pad), 0)
        vmask = jnp.logical_and(
            rr <= dd, jnp.logical_and(dd - rr < nx, rr < ny))
        b11 = one + kx * su_b + half * ky * sv_b
        b12 = half * ky * su_b
        b21 = half * kx * sv_b
        b22 = one + ky * sv_b + half * kx * su_b
        inv_det = one / (b11 * b22 - b12 * b21)
        zb = jnp.zeros_like(su_b)
        p_ref[pl.ds(0, block), :] = jnp.where(vmask, b22 * inv_det, zb)
        p_ref[pl.ds(block, block), :] = jnp.where(vmask, b12 * inv_det,
                                                  zb)
        p_ref[pl.ds(2 * block, block), :] = jnp.where(
            vmask, b21 * inv_det, zb)
        p_ref[pl.ds(3 * block, block), :] = jnp.where(
            vmask, b11 * inv_det, zb)

        def advance(k, prev):
            """Advance one diagonal; k may be traced or a base+offset."""
            shifted = jnp.where(r_ids == 0, zero,
                                pltpu.roll(prev, 1, axis=1))
            du_p = prev[0:1, :]
            dv_p = prev[1:2, :]
            u_p = prev[2:3, :]
            v_p = prev[3:4, :]
            du_s = shifted[0:1, :]
            dv_s = shifted[1:2, :]
            u_s = shifted[2:3, :]
            v_s = shifted[3:4, :]

            fu_d = sfu_ref[pl.ds(k, 1), :]
            fv_d = sfv_ref[pl.ds(k, 1), :]
            rhs_u = fu_d + kx * u_p * du_p \
                + half * ky * (v_s * du_s + u_s * dv_s)
            rhs_v = fv_d + half * kx * (v_p * du_p + u_p * dv_p) \
                + ky * v_s * dv_s

            du_d = p_ref[pl.ds(k, 1), :] * rhs_u \
                - p_ref[pl.ds(block + k, 1), :] * rhs_v
            dv_d = p_ref[pl.ds(3 * block + k, 1), :] * rhs_v \
                - p_ref[pl.ds(2 * block + k, 1), :] * rhs_u

            sdu_ref[pl.ds(k, 1), :] = du_d
            sdv_ref[pl.ds(k, 1), :] = dv_d
            u_d = su_ref[pl.ds(k, 1), :]
            v_d = sv_ref[pl.ds(k, 1), :]
            return jnp.concatenate([du_d, dv_d, u_d, v_d], axis=0)

        if unroll <= 1:
            prev_end = jax.lax.fori_loop(np.int32(0), np.int32(block),
                                         advance, prev_ref[...])
        else:
            # manual unroll (Pallas TPU fori_loop only supports
            # unroll=1 or full): each fori iteration advances `unroll`
            # diagonals, so the per-iteration index arithmetic and the
            # independent row loads/stores of consecutive diagonals can
            # overlap the sequential carry chain
            assert block % unroll == 0

            def body(j, prev):
                base = j * np.int32(unroll)
                for t in range(unroll):
                    prev = advance(base + np.int32(t), prev)
                return prev

            prev_end = jax.lax.fori_loop(
                np.int32(0), np.int32(block // unroll), body,
                prev_ref[...])
        prev_ref[...] = prev_end

    return kernel


def _make_kernel_seg(nx: int, ny: int, ny_pad: int, n_seg: int,
                     seg_len: int, overlap: int, block_j: int,
                     kx: float, ky: float, unroll: int = 4):
    """Overlapping-SEGMENT wavefront chain (round 5, VERDICT r4 #5).

    The exact substitution is a 2N-1-long sequential chain whose
    per-diagonal work is a (1, ny_pad) vector op — 1/8 sublane
    utilization and pure latency. But the diagonal-to-diagonal coupling
    T_d = -B_d^{-1} L_d is contractive (spectral radius ~
    CFL/(1+CFL) < 1, see ops/wavefront.solve_jacobian_sweeps), so the
    influence of a diagonal decays geometrically: splitting the chain
    into `n_seg` segments of `seg_len` diagonals, each extended
    BACKWARD by `overlap` warm-up diagonals started from zero, makes
    every segment independent — one batched chain of seg_len+overlap
    steps whose per-step slab is (n_seg, ny_pad), full sublanes. The
    truncation error is ~rho^overlap (~1e-11 at overlap=64 for this
    problem's CFL; segment 0 is exact) — below f32 roundoff, and the
    solve feeds an inexact-Newton that absorbs it anyway.

    Inputs are (J_pad, n_seg, ny_pad) in segment layout
    (pack_segments): S2[j, g, r] = S[g*seg_len + j - overlap, r].
    """
    import numpy as np

    kx = np.float32(kx)
    ky = np.float32(ky)
    one = np.float32(1.0)
    half = np.float32(0.5)
    zero = np.float32(0.0)
    S = n_seg

    def kernel(su_ref, sv_ref, sfu_ref, sfv_ref, sdu_ref, sdv_ref,
               prev_ref, p_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            prev_ref[...] = jnp.zeros_like(prev_ref)

        r1 = jax.lax.broadcasted_iota(jnp.int32, (S, ny_pad), 1)

        # prologue: 2x2 block-inverse coefficients for the whole block,
        # masked to each segment's valid band at its global diagonal
        su_b = su_ref[...]                   # (block_j, S, ny_pad)
        sv_b = sv_ref[...]
        jj = jax.lax.broadcasted_iota(jnp.int32, (block_j, S, ny_pad), 0)
        gg = jax.lax.broadcasted_iota(jnp.int32, (block_j, S, ny_pad), 1)
        rr = jax.lax.broadcasted_iota(jnp.int32, (block_j, S, ny_pad), 2)
        dd = gg * seg_len + (i * block_j + jj) - overlap
        vmask = jnp.logical_and(
            jnp.logical_and(dd >= 0, rr <= dd),
            jnp.logical_and(dd - rr < nx, rr < ny))
        b11 = one + kx * su_b + half * ky * sv_b
        b12 = half * ky * su_b
        b21 = half * kx * sv_b
        b22 = one + ky * sv_b + half * kx * su_b
        inv_det = one / (b11 * b22 - b12 * b21)
        zb = jnp.zeros_like(su_b)
        p_ref[pl.ds(0, block_j)] = jnp.where(vmask, b22 * inv_det, zb)
        p_ref[pl.ds(block_j, block_j)] = jnp.where(vmask, b12 * inv_det,
                                                   zb)
        p_ref[pl.ds(2 * block_j, block_j)] = jnp.where(
            vmask, b21 * inv_det, zb)
        p_ref[pl.ds(3 * block_j, block_j)] = jnp.where(
            vmask, b11 * inv_det, zb)

        def advance(j, prev):
            # prev: (4*S, ny_pad) packed [du, dv, u, v] x segments
            shifted = jnp.where(r1[0:1, :] == 0, zero,
                                pltpu.roll(prev, 1, axis=1))
            du_p = prev[0 * S: 1 * S]
            dv_p = prev[1 * S: 2 * S]
            u_p = prev[2 * S: 3 * S]
            v_p = prev[3 * S: 4 * S]
            du_s = shifted[0 * S: 1 * S]
            dv_s = shifted[1 * S: 2 * S]
            u_s = shifted[2 * S: 3 * S]
            v_s = shifted[3 * S: 4 * S]

            fu_d = sfu_ref[j]                # (S, ny_pad)
            fv_d = sfv_ref[j]
            rhs_u = fu_d + kx * u_p * du_p \
                + half * ky * (v_s * du_s + u_s * dv_s)
            rhs_v = fv_d + half * kx * (v_p * du_p + u_p * dv_p) \
                + ky * v_s * dv_s

            du_d = p_ref[j] * rhs_u - p_ref[block_j + j] * rhs_v
            dv_d = p_ref[3 * block_j + j] * rhs_v \
                - p_ref[2 * block_j + j] * rhs_u

            sdu_ref[j] = du_d
            sdv_ref[j] = dv_d
            return jnp.concatenate(
                [du_d, dv_d, su_ref[j], sv_ref[j]], axis=0)

        if unroll <= 1:
            prev_end = jax.lax.fori_loop(np.int32(0), np.int32(block_j),
                                         advance, prev_ref[...])
        else:
            assert block_j % unroll == 0

            def body(b, prev):
                base = b * np.int32(unroll)
                for t in range(unroll):
                    prev = advance(base + np.int32(t), prev)
                return prev

            prev_end = jax.lax.fori_loop(
                np.int32(0), np.int32(block_j // unroll), body,
                prev_ref[...])
        prev_ref[...] = prev_end

    return kernel


def segment_geometry(lay, n_seg: int, overlap: int, block_j: int = 8):
    """(seg_len, j_pad) for the overlapping-segment chain layout."""
    seg_len = -(-lay.nd_pad // n_seg)
    j_pad = _round_up(seg_len + overlap, block_j)
    return seg_len, j_pad


def pack_segments(s, lay, n_seg: int, overlap: int, block_j: int = 8):
    """(nd_pad, ny_pad) -> (j_pad, n_seg, ny_pad) overlapping segments:
    out[j, g, :] = s[g*seg_len + j - overlap, :] (zero off-range)."""
    seg_len, j_pad = segment_geometry(lay, n_seg, overlap, block_j)
    pad_lo = overlap
    pad_hi = j_pad - overlap + (n_seg - 1) * seg_len \
        + seg_len - s.shape[0]
    sp = jnp.pad(s, ((pad_lo, max(pad_hi, 0)), (0, 0)))
    starts = [g * seg_len for g in range(n_seg)]
    segs = [jax.lax.dynamic_slice_in_dim(sp, st, j_pad, axis=0)
            for st in starts]
    return jnp.stack(segs, axis=1)          # (j_pad, n_seg, ny_pad)


def unpack_segments(s2, lay, n_seg: int, overlap: int,
                    block_j: int = 8):
    """Inverse of pack_segments, overlap rows discarded."""
    seg_len, _ = segment_geometry(lay, n_seg, overlap, block_j)
    body = s2[overlap: overlap + seg_len]    # (seg_len, n_seg, ny_pad)
    flat = jnp.transpose(body, (1, 0, 2)).reshape(
        n_seg * seg_len, s2.shape[2])
    return flat[: lay.nd_pad]


def solve_skewed_pallas_seg(su, sv, sfu, sfv, dt, grid: Grid2D, lay, *,
                            n_seg: int = 8, overlap: int = 64,
                            block_j: int = 8, unroll: int = 4,
                            interpret: bool = False):
    """Overlapping-segment triangular solve on padded skewed inputs.

    ~(seg_len+overlap)/(2N-1) of the exact chain's sequential latency
    with full-sublane (n_seg, ny_pad) slabs per step; truncation error
    ~rho^overlap (see _make_kernel_seg). f32 in, f32 out."""
    with jax.enable_x64(False):
        return _solve_skewed_pallas_seg(
            su, sv, sfu, sfv, dt, grid, lay, n_seg=n_seg,
            overlap=overlap, block_j=block_j, unroll=unroll,
            interpret=interpret)


@functools.partial(jax.jit,
                   static_argnames=("dt", "grid", "lay", "n_seg",
                                    "overlap", "block_j", "unroll",
                                    "interpret"))
def _solve_skewed_pallas_seg(su, sv, sfu, sfv, dt, grid: Grid2D, lay,
                             *, n_seg, overlap, block_j, unroll,
                             interpret):
    f32 = jnp.float32
    seg_len, j_pad = segment_geometry(lay, n_seg, overlap, block_j)
    packed = [pack_segments(x.astype(f32), lay, n_seg, overlap, block_j)
              for x in (su, sv, sfu, sfv)]
    kernel = _make_kernel_seg(lay.nx, lay.ny, lay.ny_pad, n_seg,
                              seg_len, overlap, block_j,
                              float(0.5 * dt / grid.dx),
                              float(0.5 * dt / grid.dy), unroll=unroll)
    spec = pl.BlockSpec((block_j, n_seg, lay.ny_pad),
                        lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((j_pad, n_seg, lay.ny_pad), f32)
    sdu2, sdv2 = pl.pallas_call(
        kernel,
        grid=(j_pad // block_j,),
        in_specs=[spec] * 4,
        out_specs=(spec, spec),
        out_shape=(shape, shape),
        scratch_shapes=[
            pltpu.VMEM((4 * n_seg, lay.ny_pad), f32),
            pltpu.VMEM((4 * block_j, n_seg, lay.ny_pad), f32),
        ],
        interpret=interpret,
    )(*packed)
    sdu = unpack_segments(sdu2, lay, n_seg, overlap, block_j)
    sdv = unpack_segments(sdv2, lay, n_seg, overlap, block_j)
    return sdu, sdv


def solve_skewed_pallas(su, sv, sfu, sfv, dt, grid: Grid2D, lay, *,
                        block: int = 128, interpret: bool = False,
                        variant: str = "reg", unroll: int = 8):
    """Triangular solve on pre-padded skewed inputs (nd_pad, ny_pad).

    The fast path for ops/skewed.py: no per-call skew/pad — the kernel
    alone (~5 ms at 750^2 vs ~100 ms for the gather-based wrapper below).
    f32 in, f32 out. Traced with x64 disabled: under global x64 the
    Mosaic grid/index machinery becomes i64 and fails to lower on this
    backend, so the kernel trace runs in pure-32-bit semantics (inputs
    are f32 either way).

    variant="reg" (default) carries the 4-row diagonal state as an
    unrolled fori_loop value (register-resident chain);
    variant="scratch" is the r4 VMEM-carry kernel, kept for A/B timing.
    """
    with jax.enable_x64(False):
        return _solve_skewed_pallas(su, sv, sfu, sfv, dt, grid, lay,
                                    block=block, interpret=interpret,
                                    variant=variant, unroll=unroll)


@functools.partial(jax.jit,
                   static_argnames=("dt", "grid", "lay", "block",
                                    "interpret", "variant", "unroll"))
def _solve_skewed_pallas(su, sv, sfu, sfv, dt, grid: Grid2D, lay, *,
                         block: int = 128, interpret: bool = False,
                         variant: str = "reg", unroll: int = 8):
    f32 = jnp.float32
    su, sv, sfu, sfv = (x.astype(f32) for x in (su, sv, sfu, sfv))
    make = _make_kernel_reg if variant == "reg" else _make_kernel
    kw = {"unroll": unroll} if variant == "reg" else {}
    kernel = make(lay.nx, lay.ny, lay.ny_pad, block,
                  float(0.5 * dt / grid.dx),
                  float(0.5 * dt / grid.dy), **kw)
    spec = pl.BlockSpec((block, lay.ny_pad), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(lay.nd_pad // block,),
        in_specs=[spec] * 4,
        out_specs=(spec, spec),
        out_shape=(jax.ShapeDtypeStruct((lay.nd_pad, lay.ny_pad), f32),
                   jax.ShapeDtypeStruct((lay.nd_pad, lay.ny_pad), f32)),
        scratch_shapes=[pltpu.VMEM((4, lay.ny_pad), f32),
                        pltpu.VMEM((4 * block, lay.ny_pad), f32)],
        interpret=interpret,
    )(su, sv, sfu, sfv)


def solve_jacobian_wavefront_pallas(u, v, fu, fv, dt, grid: Grid2D, *,
                                    block: int = 128,
                                    interpret: bool = False):
    """Exact J(u,v) solve, one Pallas program (includes the skew/unskew
    gathers — prefer ops/skewed.py + solve_skewed_pallas in hot loops).
    f32 in, f32 out."""
    with jax.enable_x64(False):
        return _solve_jacobian_wavefront_pallas(
            u, v, fu, fv, dt, grid, block=block, interpret=interpret)


@functools.partial(jax.jit,
                   static_argnames=("dt", "grid", "block", "interpret"))
def _solve_jacobian_wavefront_pallas(u, v, fu, fv, dt, grid: Grid2D, *,
                                     block: int = 128,
                                     interpret: bool = False):
    ny, nx = grid.ny, grid.nx
    f32 = jnp.float32
    u, v, fu, fv = (x.astype(f32) for x in (u, v, fu, fv))
    kx = float(0.5 * dt / grid.dx)
    ky = float(0.5 * dt / grid.dy)

    ndiag = ny + nx - 1
    ny_pad = _round_up(ny, 128)
    nd_pad = _round_up(ndiag, block)

    def prep(x):
        s = skew(x, ny, nx)
        return jnp.pad(s, ((0, nd_pad - ndiag), (0, ny_pad - ny)))

    su, sv, sfu, sfv = prep(u), prep(v), prep(fu), prep(fv)

    kernel = _make_kernel(nx, ny, ny_pad, block, kx, ky)
    spec = pl.BlockSpec((block, ny_pad), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    sdu, sdv = pl.pallas_call(
        kernel,
        grid=(nd_pad // block,),
        in_specs=[spec] * 4,
        out_specs=(spec, spec),
        out_shape=(jax.ShapeDtypeStruct((nd_pad, ny_pad), f32),
                   jax.ShapeDtypeStruct((nd_pad, ny_pad), f32)),
        scratch_shapes=[pltpu.VMEM((4, ny_pad), f32),
                        pltpu.VMEM((4 * block, ny_pad), f32)],
        interpret=interpret,
    )(su, sv, sfu, sfv)

    sdu = sdu[:ndiag, :ny]
    sdv = sdv[:ndiag, :ny]
    return unskew(sdu, ny, nx), unskew(sdv, ny, nx)
