"""Online ROM time-steppers.

Each stepper is a jitted `lax.scan` over time steps with a Gauss-Newton
`lax.while_loop` inside (solvers.gauss_newton), replacing the reference's
Python loops (inviscid_burgers_implicit2D_LSPG, hypernet2D.py:133-200;
inviscid_burgers_ecsw_fixed, hypernet2D.py:202-273; and the closure
variants at :275-1277). All steppers vmap over (mu1, mu2) for sweeps.

Conventions match the reference:
* the initial condition is projected: y0 = V^T w0, w0 <- V y0;
* reduced coordinates for all num_steps+1 times are returned, plus
  total GN iteration count;
* full snapshots are reconstructed lazily (one MXU matmul) rather than
  stored per step.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from finitedifference_tpu.grid import Grid2D
from finitedifference_tpu.ops.stencil import (
    burgers_residual_flat,
    inflow_bc_term,
    jacobian_times_basis,
    source_term,
)
from finitedifference_tpu.precision import hi_matmul
from finitedifference_tpu.solvers import gauss_newton


class ROMResult(NamedTuple):
    red_coords: jnp.ndarray      # (k, num_steps+1)
    total_gn_its: jnp.ndarray


@functools.partial(
    jax.jit,
    static_argnames=("grid", "num_steps", "max_its", "ls_dtype",
                     "ls_method", "extrapolate_guess"),
)
def lspg_prom(grid: Grid2D, w0, dt, num_steps, mu1, mu2, basis,
              *, max_its: int = 20, relnorm_cutoff: float = 1e-5,
              min_delta: float = 0.1, ls_dtype=None,
              ls_method: str = "qr",
              extrapolate_guess: bool = False) -> ROMResult:
    """LSPG PROM with a linear POD basis (reference
    inviscid_burgers_implicit2D_LSPG, hypernet2D.py:133-200).

    Per GN iteration: residual and J@V are fused stencils; the reduced
    update solves a tall-skinny least-squares by QR.
    """
    basis = jnp.asarray(basis)
    w0 = jnp.asarray(w0)
    y0 = basis.T @ w0

    src = source_term(grid, mu2, dt, dtype=w0.dtype)
    lbc = inflow_bc_term(grid, mu1, dt, dtype=w0.dtype)

    # hi_matmul: the decode GEMV becomes a GEMM under vmapped sweeps,
    # where the bf16-default TPU accumulation is inaccurate (precision.py)
    decode = lambda y: hi_matmul(basis, y)
    dec_jac = lambda y, w: basis
    jac_apply = lambda w, v: jacobian_times_basis(w, v, dt, grid)

    def step(carry, _):
        yp, ym, wp, its = carry
        # linear predictor 2 y_n - y_{n-1} (opt-in; see ecsw_hprom)
        yg = 2.0 * yp - ym if extrapolate_guess else yp
        res_fn = lambda w: burgers_residual_flat(
            w, wp, mu1, mu2, dt, grid, src, lbc)
        out = gauss_newton(decode, dec_jac, res_fn, jac_apply, yg,
                           max_its=max_its, relnorm_cutoff=relnorm_cutoff,
                           min_delta=min_delta, ls_dtype=ls_dtype,
                           ls_method=ls_method, w0=wp)
        w = decode(out.y)
        return (out.y, yp, w, its + out.num_its), out.y

    w0p = hi_matmul(basis, y0)
    (_, _, _, its), ys = jax.lax.scan(
        step, (y0, y0, w0p, jnp.int32(0)), None, length=num_steps)
    red = jnp.concatenate((y0[None, :], ys), axis=0).T
    return ROMResult(red_coords=red, total_gn_its=its)


def reconstruct(basis, red_coords) -> jnp.ndarray:
    """Full-state snapshots from reduced coordinates: (2n, T+1)."""
    return hi_matmul(jnp.asarray(basis), jnp.asarray(red_coords))


@functools.partial(
    jax.jit,
    static_argnames=("grid", "num_steps", "max_its", "ls_dtype",
                     "ls_method", "extrapolate_guess"),
)
def ecsw_hprom(grid: Grid2D, mesh, sample_weights, y0, basis_aug, dt,
               num_steps, mu1, mu2, *, max_its: int = 20,
               relnorm_cutoff: float = 1e-5,
               min_delta: float = 0.1, ls_dtype=None,
               ls_method: str = "qr",
               extrapolate_guess: bool = False) -> ROMResult:
    """HPROM: LSPG on the ECSW sampled mesh (reference
    inviscid_burgers_ecsw_fixed, hypernet2D.py:202-273).

    mesh:           ops.sampled.SampledMesh for the nonzero-weight cells.
    sample_weights: (n_s,) positive ECSW weights at the sampled cells
                    (duplicated internally over the u and v rows, like the
                    reference's `weights2 = hstack((weights, weights))`).
    y0:             initial reduced coords, basis.T @ w0 with the *full*
                    basis (the caller projects; this stepper never sees
                    full-size arrays).
    basis_aug:      (2*n_z, k) basis gathered at augmented rows.
    """
    from finitedifference_tpu.ops.sampled import (
        sampled_inflow_bc,
        sampled_jacobian_times_basis,
        sampled_residual,
        sampled_source,
    )

    basis_aug = jnp.asarray(basis_aug)
    y0 = jnp.asarray(y0)
    dtype = basis_aug.dtype
    src = sampled_source(mesh, grid, mu2, dt, dtype)
    lbc = sampled_inflow_bc(mesh, grid, mu1, dt, dtype)
    wgt = jnp.concatenate((sample_weights, sample_weights)).astype(dtype)

    decode = lambda y: hi_matmul(basis_aug, y)
    dec_jac = lambda y, w: basis_aug
    jac_apply = lambda w, v: sampled_jacobian_times_basis(
        w, v, dt, grid, mesh)

    def step(carry, _):
        yp, ym, wp, its = carry
        # linear predictor 2 y_n - y_{n-1} (see fom.py's
        # extrapolate_guess): note the GN init_norm — and therefore the
        # reference's relative stopping rule — is taken AT the guess, so
        # this is opt-in; the reference always starts from y_n
        yg = 2.0 * yp - ym if extrapolate_guess else yp
        res_fn = lambda w: sampled_residual(
            w, wp, mu1, mu2, dt, grid, mesh, src, lbc)
        out = gauss_newton(decode, dec_jac, res_fn, jac_apply, yg,
                           weights=wgt, max_its=max_its,
                           relnorm_cutoff=relnorm_cutoff,
                           min_delta=min_delta, ls_dtype=ls_dtype,
                           ls_method=ls_method, w0=wp)
        w = decode(out.y)
        return (out.y, yp, w, its + out.num_its), out.y

    w0_aug = hi_matmul(basis_aug, y0)
    (_, _, _, its), ys = jax.lax.scan(
        step, (y0, y0, w0_aug, jnp.int32(0)), None, length=num_steps)
    red = jnp.concatenate((y0[None, :], ys), axis=0).T
    return ROMResult(red_coords=red, total_gn_its=its)


def make_manifold_stepper(grid: Grid2D, decode, dec_jac, dt, num_steps,
                          *, dtype, mesh=None,
                          sample_weights=None, max_its: int = 20,
                          relnorm_cutoff: float = 1e-5,
                          min_delta: float = 0.1, ls_dtype=None,
                          ls_method: str = "qr",
                          line_search: bool = False,
                          decode_and_jac=None):
    """Build the jitted online program for `manifold_rom`.

    Returns a jitted `run(y0, mu1, mu2) -> (red_coords, total_gn_its)`.
    Exposed separately so callers that need warm timings can invoke the
    SAME compiled program repeatedly (a fresh `manifold_rom` call
    re-traces — its closures are new Python objects each time, so the
    jit cache misses; see runners/common.py::run_manifold). (mu1, mu2)
    are runtime arguments, so one compile covers every test point — on
    this environment's remote-compile service a single closure-ROM
    compile costs minutes, the run itself seconds.
    """
    from finitedifference_tpu.ops.sampled import (
        sampled_inflow_bc,
        sampled_jacobian_times_basis,
        sampled_residual,
        sampled_source,
    )

    @jax.jit
    def run(y0, mu1, mu2):
        mu1 = jnp.asarray(mu1, dtype)
        mu2 = jnp.asarray(mu2, dtype)
        if mesh is None:
            src = source_term(grid, mu2, dt, dtype=dtype)
            lbc = inflow_bc_term(grid, mu1, dt, dtype=dtype)
            res_builder = lambda wp: (lambda w: burgers_residual_flat(
                w, wp, mu1, mu2, dt, grid, src, lbc))
            jac_apply = lambda w, v: jacobian_times_basis(w, v, dt, grid)
            wgt = None
        else:
            src = sampled_source(mesh, grid, mu2, dt, dtype)
            lbc = sampled_inflow_bc(mesh, grid, mu1, dt, dtype)
            res_builder = lambda wp: (lambda w: sampled_residual(
                w, wp, mu1, mu2, dt, grid, mesh, src, lbc))
            jac_apply = lambda w, v: sampled_jacobian_times_basis(
                w, v, dt, grid, mesh)
            wgt = jnp.concatenate(
                (sample_weights, sample_weights)).astype(dtype)

        def step(carry, _):
            yp, wp, its = carry
            out = gauss_newton(decode, dec_jac, res_builder(wp),
                               jac_apply, yp,
                               weights=wgt, max_its=max_its,
                               relnorm_cutoff=relnorm_cutoff,
                               min_delta=min_delta, ls_dtype=ls_dtype,
                               ls_method=ls_method,
                               line_search=line_search,
                               decode_and_jac=decode_and_jac,
                               w0=wp)
            w = decode(out.y)
            return (out.y, w, its + out.num_its), out.y

        w0 = decode(y0)
        (_, _, its), ys = jax.lax.scan(
            step, (y0, w0, jnp.int32(0)), None, length=num_steps)
        red = jnp.concatenate((y0[None, :], ys), axis=0).T
        return red, its

    return run


def manifold_rom(grid: Grid2D, y0, decode, dec_jac, dt, num_steps,
                 mu1, mu2, *, mesh=None, sample_weights=None,
                 max_its: int = 20, relnorm_cutoff: float = 1e-5,
                 min_delta: float = 0.1, ls_dtype=None,
                 ls_method: str = "qr",
                 line_search: bool = False,
                 decode_and_jac=None) -> ROMResult:
    """Generic LSPG ROM over a (possibly nonlinear) decoder.

    One stepper covers the reference's RNM/HRNM (hypernet2D.py:275-676),
    POD-RBF PROM/HPROM (:678-1113), POD-GP HPROM (:1115-1277) and AE-LSPG
    (TestAE hypernet2D.py:279-344): the variant is entirely in
    (decode, dec_jac).

    decode/dec_jac operate on the *full* state when mesh is None, or on
    the augmented sampled rows when a SampledMesh + sample_weights are
    given (build them with closures.manifold_decoder over gathered bases).
    """
    y0 = jnp.asarray(y0)
    run = make_manifold_stepper(
        grid, decode, dec_jac, dt, num_steps, dtype=y0.dtype,
        mesh=mesh, sample_weights=sample_weights, max_its=max_its,
        relnorm_cutoff=relnorm_cutoff, min_delta=min_delta,
        ls_dtype=ls_dtype, ls_method=ls_method, line_search=line_search,
        decode_and_jac=decode_and_jac)
    red, its = run(y0, mu1, mu2)
    return ROMResult(red_coords=red, total_gn_its=its)


def prepare_hprom(grid: Grid2D, weights_full, basis):
    """Host-side setup for ecsw_hprom from a full-grid weight field.

    weights_full: (n_cells,) ECSW weights (zeros = unsampled).
    Returns (mesh, sample_weights, basis_aug).
    """
    import numpy as np

    from finitedifference_tpu.ops.sampled import (
        augmented_state_indices,
        build_sampled_mesh,
    )

    weights_full = np.asarray(weights_full)
    sample_inds = np.where(weights_full != 0)[0]
    mesh = build_sampled_mesh(grid, sample_inds)
    sample_weights = jnp.asarray(weights_full[sample_inds])
    idx = augmented_state_indices(mesh, grid.n_cells)
    basis_aug = jnp.asarray(basis)[idx, :]
    return mesh, sample_weights, basis_aug
