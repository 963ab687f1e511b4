"""Gauss-Newton solver family for LSPG-type reduced systems.

One generic jitted Gauss-Newton replaces the reference's six hand-copied
variants (gauss_newton_LSPG / _ECSW_2D / _rnm / _rnm_ecsw / _pod_rbf /
_pod_rbf_ecsw / _pod_gp_ecsw, hypernet2D.py:1859-2408). Every variant is
the same iteration

    w  = decode(y)
    f  = res(w)                  (optionally ECSW-weighted)
    V  = dec_jac(y, w)           (decoder Jacobian; constant for linear)
    dy = argmin || diag(wgt) (J(w) V dy + f) ||_2
    y += dy

with the reference's stopping rules preserved exactly: relative residual
norm < `relnorm_cutoff` (1e-5), or stagnation
|r_{k-1} - r_k| / r_{k-1} < `min_delta` (0.1), or `max_its` (20).
The check happens *before* the update, so a stopped iteration leaves y
untouched — same as the reference's `break`.

The least-squares solve is dense QR on the MXU (the reference calls
np.linalg.lstsq on a tall-skinny J@V, hypernet2D.py:1918).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular


def lstsq_normal(a: jnp.ndarray, b: jnp.ndarray,
                 ridge: float = 0.0) -> jnp.ndarray:
    """Least squares via the normal equations: (a^T a) x = a^T b with a
    Cholesky solve. Squares the condition number — only appropriate for
    well-conditioned systems like LSPG's J@V ~ V + O(dt) — but runs the
    whole solve as MXU matmuls + a tiny k x k factorization (~10x faster
    than tall-skinny QR on TPU). The Gram matmuls force HIGHEST precision:
    the TPU default would compute them in bfloat16 passes, and the Gram
    product is exactly where the squared conditioning concentrates."""
    from jax.scipy.linalg import cho_factor, cho_solve

    hi = jax.lax.Precision.HIGHEST
    g = jnp.matmul(a.T, a, precision=hi)
    if ridge:
        g = g + ridge * jnp.eye(g.shape[0], dtype=g.dtype)
    return cho_solve(cho_factor(g), jnp.matmul(a.T, b, precision=hi))


def lstsq_normal_cg(a: jnp.ndarray, b: jnp.ndarray,
                    iters: int = 24) -> jnp.ndarray:
    """Normal equations solved by UNROLLED conjugate gradient.

    Same system as lstsq_normal, but the k x k solve is a fixed number
    of straight-line matvecs instead of a Cholesky factorization — on
    TPU the blocked Cholesky lowers to a sequential while_loop whose
    per-trip latency dominates for tiny k (~95), while 24 unrolled
    95x95 matvecs are pure MXU work. LSPG Gram matrices here are
    I + O(dt)-conditioned, so CG converges far below the Gauss-Newton
    stagnation threshold within ~20 iterations."""
    hi = jax.lax.Precision.HIGHEST
    g = jnp.matmul(a.T, a, precision=hi)
    rhs = jnp.matmul(a.T, b, precision=hi)
    x = jnp.zeros_like(rhs)
    r = rhs
    p = r
    rs = jnp.vdot(r, r)
    tiny = jnp.asarray(jnp.finfo(rhs.dtype).tiny, rhs.dtype)
    for _ in range(iters):
        gp = jnp.matmul(g, p, precision=hi)
        denom = jnp.vdot(p, gp)
        # freeze the iterate once the residual (or curvature) underflows
        # to zero: 0/0 here would NaN-poison the remaining unrolled
        # iterations (ADVICE r2)
        live = jnp.logical_and(rs > tiny, denom > tiny)
        alpha = jnp.where(live, rs / jnp.where(live, denom, 1.0), 0.0)
        x = x + alpha * p
        r = r - alpha * gp
        rs_new = jnp.vdot(r, r)
        beta = jnp.where(live, rs_new / jnp.where(live, rs, 1.0), 0.0)
        p = r + beta * p
        rs = rs_new
    return x


def lstsq_svd(a: jnp.ndarray, b: jnp.ndarray,
              rcond: float = 1e-6) -> jnp.ndarray:
    """Least squares via truncated SVD: singular directions below
    rcond * s_max are dropped rather than inverted. The robust choice
    for nonlinear-manifold decoders whose Jacobians can be numerically
    rank-deficient (a trained autoencoder often collapses part of its
    latent space; inverting the ~1e-8 directions sends the Gauss-Newton
    update to ~1e6 and the trajectory to NaN — observed with the
    reference-style AE at 50^2). The reference's np.linalg.lstsq
    rcond=None keeps those directions (TestAE hypernet2D.py:2134) and
    relies on luck in the trained net."""
    u, s, vt = jnp.linalg.svd(a, full_matrices=False)
    hi = jax.lax.Precision.HIGHEST
    sinv = jnp.where(s > rcond * s[0], 1.0 / s, 0.0)
    return jnp.matmul(vt.T, sinv * jnp.matmul(u.T, b, precision=hi),
                      precision=hi)


def lstsq_qr(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Least-squares via reduced QR — tall-skinny friendly (MXU matmul +
    small triangular solve). Assumes full column rank (J@V ≈ V + O(dt)).
    Underdetermined systems (m < n, e.g. a sampled mesh smaller than the
    basis) fall back to the min-norm solution via QR of a^T. Projection
    matmuls run at HIGHEST precision (bf16-default GEMMs on TPU corrupt
    the projected RHS; see finitedifference_tpu/precision.py)."""
    hi = jax.lax.Precision.HIGHEST
    m, n = a.shape
    if m >= n:
        q, r = jnp.linalg.qr(a)
        return solve_triangular(r, jnp.matmul(q.T, b, precision=hi),
                                lower=False)
    q, r = jnp.linalg.qr(a.T)   # a = r^T q^T
    z = solve_triangular(r.T, b, lower=True)
    return jnp.matmul(q, z, precision=hi)


class GNResult(NamedTuple):
    y: jnp.ndarray
    num_its: jnp.ndarray
    resnorm: jnp.ndarray
    init_norm: jnp.ndarray


def gauss_newton(
    decode: Callable,
    dec_jac: Callable,
    res_fn: Callable,
    jac_apply: Callable,
    y0: jnp.ndarray,
    weights: Optional[jnp.ndarray] = None,
    *,
    max_its: int = 20,
    relnorm_cutoff: float = 1e-5,
    min_delta: float = 0.1,
    stepsize: float = 1.0,
    ls_dtype=None,
    ls_method: str = "qr",
    line_search: bool = False,
    decode_and_jac: Optional[Callable] = None,
    w0: Optional[jnp.ndarray] = None,
) -> GNResult:
    """Generic Gauss-Newton for min_y || wgt * res(decode(y)) ||.

    decode:    y -> w               (full or sampled state)
    dec_jac:   (y, w) -> V          (d decode / d y)
    res_fn:    w -> f
    jac_apply: (w, V) -> J(w) @ V
    weights:   optional ECSW weights, same length as f.
    ls_dtype:  optional dtype for the least-squares solve only (e.g.
               float32 under an f64 run — mixed-precision GN: residuals
               and stopping stay f64, the tall-skinny QR runs 30x faster
               on TPU; the update error (~1e-7) is far below the 0.1
               stagnation stopping threshold).
    ls_method: "qr" (reference-faithful lstsq), "normal" (all-MXU
               normal equations) or "svd" (truncated SVD — for
               rank-deficient nonlinear-manifold Jacobians).
    line_search: backtracking step control — evaluate the update at
               stepsize * (1, 1/2, 1/4, 1/8), take the best residual
               decrease, stop if none decreases. Off by default (the
               reference's solvers always take the full step); needed
               for AE manifolds whose full Gauss-Newton step can leave
               the decoder's training region and diverge.
    decode_and_jac: optional fused y -> (w, V). Kernel closures (kNN/
               global RBF, GP) share a neighbor search or kernel solve
               between decode and dec_jac; the body evaluates both at
               the same y, so the fused form halves the closure cost.
    w0:        optional decode(y0), when the caller already has it (the
               time-steppers carry the decoded previous state) — skips
               one decoder evaluation per Gauss-Newton solve.
    """
    if w0 is None:
        w0 = decode(y0)
    f0 = res_fn(w0)
    if weights is not None:
        f0 = f0 * weights
    init_norm = jnp.linalg.norm(f0)

    def cond(carry):
        y, it, done, rn_prev = carry
        return jnp.logical_and(~done, it < max_its)

    def body(carry):
        y, it, done, rn_prev = carry
        if decode_and_jac is not None:
            w, v = decode_and_jac(y)
        else:
            w = decode(y)
        f = res_fn(w)
        fw = f * weights if weights is not None else f
        rn = jnp.linalg.norm(fw)
        conv = rn / init_norm < relnorm_cutoff
        stag = jnp.logical_and(
            it > 0, jnp.abs(rn_prev - rn) / rn_prev < min_delta
        )
        stop = jnp.logical_or(conv, stag)

        if decode_and_jac is None:
            v = dec_jac(y, w)
        jv = jac_apply(w, v)
        if weights is not None:
            jv = weights[:, None] * jv
        solve_ls = {"normal": lstsq_normal, "svd": lstsq_svd,
                    "cg": lstsq_normal_cg, "qr": lstsq_qr}[ls_method]
        if ls_dtype is not None:
            dy = solve_ls(jv.astype(ls_dtype),
                          (-fw).astype(ls_dtype)).astype(y.dtype)
        else:
            dy = solve_ls(jv, -fw)

        if line_search:
            def cand_norm(alpha):
                fc = res_fn(decode(y + alpha * stepsize * dy))
                if weights is not None:
                    fc = fc * weights
                return jnp.linalg.norm(fc)

            alphas = jnp.asarray([1.0, 0.5, 0.25, 0.125], y.dtype)
            norms = jax.vmap(cand_norm)(alphas)
            best = jnp.argmin(norms)
            improved = norms[best] < rn
            step = jnp.where(improved, alphas[best] * stepsize, 0.0)
            stop = jnp.logical_or(stop, ~improved)
            y_new = jnp.where(stop, y, y + step * dy)
        else:
            y_new = jnp.where(stop, y, y + stepsize * dy)
        return (y_new, it + 1, stop, rn)

    big = jnp.asarray(jnp.inf, init_norm.dtype)
    y, it, done, rn = jax.lax.while_loop(
        cond, body, (y0, jnp.int32(0), jnp.bool_(False), big)
    )
    return GNResult(y=y, num_its=it - done.astype(jnp.int32),
                    resnorm=rn, init_norm=init_norm)


def fit_reduced_coords(decode, dec_jac, y_init, target, *,
                       max_its: int = 10, relnorm_cutoff: float = 1e-2,
                       ls_method: str = "qr") -> GNResult:
    """Fit reduced coordinates: min_y || decode(y) - target ||.

    The reference's inner Gauss-Newton inside the closure ECSW
    training-matrix builders (compute_ECSW_training_matrix_2D_rnm,
    hypernet2D.py:2765-2773): start from the projection y_init, iterate
    normal-equation GN steps until the decode residual has shrunk by
    relnorm_cutoff (1e-2) relative to the initial projection residual,
    capped at max_its (10). No stagnation stop (min_delta=0 disables it).
    """
    target = jnp.asarray(target)
    return gauss_newton(
        decode, dec_jac,
        lambda w: w - target,
        lambda w, v: v,
        jnp.asarray(y_init),
        max_its=max_its, relnorm_cutoff=relnorm_cutoff,
        min_delta=0.0, ls_method=ls_method,
    )
