"""RBF interpolation closures: global (precomputed weights) and k-nearest-
neighbor (local solve per query).

Replaces the reference's rbf_utils.py (1,662 lines: five kernels, each
with hand-derived interpolation + Jacobian in four variants). Here each
kernel is defined once by phi(r, eps) together with phi'(r)/r, and the
interpolators/Jacobians are generic over the kernel. The kNN variant
replaces the scipy KDTree query (rbf_utils.py:381-673) with lax.top_k on
the distance vector — at the reference's training-set sizes (a few
thousand points) a brute-force top-k on the VPU beats tree traversal and
is jit/vmap-friendly.

Kernels (rbf_utils.py:10-33): gaussian exp(-(er)^2), imq 1/sqrt(1+(er)^2),
multiquadric sqrt(1+(er)^2), linear r, matern32 (1+s)exp(-s) with
s = sqrt(3) e r.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from finitedifference_tpu.closures.common import Closure, MinMaxScaler
from finitedifference_tpu.precision import hi_matmul


# --------------------------------------------------------------------------
# kernels: phi(r) and phi'(r)/r (the latter avoids the r=0 singularity in
# the chain rule d phi/d x = phi'(r)/r * (x - x_i))
# --------------------------------------------------------------------------

def _gaussian(r, eps):
    return jnp.exp(-((eps * r) ** 2))


def _gaussian_dr_over_r(r, eps):
    return -2.0 * eps**2 * _gaussian(r, eps)


def _imq(r, eps):
    return 1.0 / jnp.sqrt(1.0 + (eps * r) ** 2)


def _imq_dr_over_r(r, eps):
    return -(eps**2) * (1.0 + (eps * r) ** 2) ** -1.5


def _mq(r, eps):
    return jnp.sqrt(1.0 + (eps * r) ** 2)


def _mq_dr_over_r(r, eps):
    return eps**2 / jnp.sqrt(1.0 + (eps * r) ** 2)


def _linear(r, eps):
    return r


def _linear_dr_over_r(r, eps):
    # phi' = 1 -> phi'/r singular at r=0; guarded like the reference's
    # linear Jacobian (rbf_utils.py:202-291 divides by r directly)
    return 1.0 / jnp.maximum(r, 1e-12)


def _matern32(r, eps):
    s = jnp.sqrt(3.0) * eps * r
    return (1.0 + s) * jnp.exp(-s)


def _matern32_dr_over_r(r, eps):
    s = jnp.sqrt(3.0) * eps * r
    return -3.0 * eps**2 * jnp.exp(-s)


KERNELS = {
    "gaussian": (_gaussian, _gaussian_dr_over_r),
    "imq": (_imq, _imq_dr_over_r),
    "multiquadric": (_mq, _mq_dr_over_r),
    "linear": (_linear, _linear_dr_over_r),
    "matern": (_matern32, _matern32_dr_over_r),
}


def _get_kernel(kernel: str):
    try:
        return KERNELS[kernel]
    except KeyError:
        raise ValueError(
            f"unknown RBF kernel {kernel!r}; valid: {sorted(KERNELS)}"
        ) from None


def kernel_matrix(xa, xb, eps, kernel: str = "gaussian"):
    """phi(||xa_i - xb_j||) for row sets xa (m,d), xb (n,d) -> (m,n)."""
    phi, _ = _get_kernel(kernel)
    d = jnp.linalg.norm(xa[:, None, :] - xb[None, :, :], axis=-1)
    return phi(d, eps)


# --------------------------------------------------------------------------
# global RBF interpolation (precomputed weights W: (n_train, n_s))
# --------------------------------------------------------------------------

class GlobalRBF(NamedTuple):
    """Trained global RBF model (the content of the reference's
    pod_rbf_global_model/global_weights.pkl)."""
    w_global: jnp.ndarray      # (n_train, n_s)
    q_p_train: jnp.ndarray     # (n_train, n_p), already normalized
    epsilon: float
    kernel: str
    scaler: MinMaxScaler


def rbf_global_predict(model: GlobalRBF, y):
    """q_s(y) = phi(||scaler(y) - Q||) @ W  (reference
    interpolate_with_rbf_global_*, rbf_utils.py:1272-1610)."""
    phi, _ = _get_kernel(model.kernel)
    x = model.scaler.transform(y)
    r = jnp.linalg.norm(model.q_p_train - x[None, :], axis=1)
    return hi_matmul(phi(r, model.epsilon), model.w_global)


def rbf_global_jacobian(model: GlobalRBF, y):
    """Analytic d q_s / d y: W^T @ [phi'(r)/r * (x - Q)] * scaler.scale_
    (reference compute_rbf_jacobian_global_*, rbf_utils.py:675-1194)."""
    _, dr_over_r = _get_kernel(model.kernel)
    x = model.scaler.transform(y)
    diff = x[None, :] - model.q_p_train          # (n_train, n_p)
    r = jnp.linalg.norm(diff, axis=1)
    dphi = dr_over_r(r, model.epsilon)[:, None] * diff   # (n_train, n_p)
    jac_norm = hi_matmul(model.w_global.T, dphi)  # (n_s, n_p)
    return jac_norm * model.scaler.scale_[None, :]


def rbf_global_predict_and_jacobian(model: GlobalRBF, y):
    """Fused value + Jacobian sharing the distance evaluation (the
    Gauss-Newton body needs both at the same y every iteration)."""
    phi, dr_over_r = _get_kernel(model.kernel)
    x = model.scaler.transform(y)
    diff = x[None, :] - model.q_p_train            # (n_train, n_p)
    r = jnp.linalg.norm(diff, axis=1)
    pred = hi_matmul(phi(r, model.epsilon), model.w_global)
    dphi = dr_over_r(r, model.epsilon)[:, None] * diff
    jac = hi_matmul(model.w_global.T, dphi) * model.scaler.scale_[None, :]
    return pred, jac


def global_rbf_closure(model: GlobalRBF) -> Closure:
    """Closure with a precision bridge: the kernel-weight contraction
    runs at the MODEL's dtype (f64 when trained/loaded under x64)
    regardless of the solver dtype. The evaluation phi(r) @ W cancels by
    ~5e5 (measured: even exact-f32 accumulation is ~0.7% off while the
    interpolant itself is accurate), so an f32 online solve must not
    drag the closure core down to f32 — these are O(n_train x n_s) ops,
    negligible even under TPU f64 emulation. The reference is all-f64
    NumPy and never faces the choice (rbf_utils.py:1272-1610)."""
    cd = jnp.asarray(model.w_global).dtype

    def predict(y):
        return rbf_global_predict(model, y.astype(cd)).astype(y.dtype)

    def jacobian(y):
        return rbf_global_jacobian(model, y.astype(cd)).astype(y.dtype)

    def both(y):
        p, j = rbf_global_predict_and_jacobian(model, y.astype(cd))
        return p.astype(y.dtype), j.astype(y.dtype)

    return Closure(predict=predict, jacobian=jacobian,
                   predict_and_jacobian=both)


def fit_global_rbf(q_p_train, q_s_train, epsilon, kernel: str = "gaussian",
                   scaler: MinMaxScaler | None = None,
                   lambda_reg: float = 1e-8,
                   sval_tol: float = 1e-8) -> GlobalRBF:
    """Solve Phi(Q, Q) W = q_s for the global weights.

    SVD-regularized solve as in the reference trainer
    (compute_global_weights_grid_search_with_kernels.py:294-297): singular
    values below sval_tol * s_max are dropped; a small Tikhonov term
    conditions the kernel matrix.
    """
    from finitedifference_tpu.closures.common import fit_minmax

    _get_kernel(kernel)   # validate early
    q_p_train = jnp.asarray(q_p_train)
    q_s_train = jnp.asarray(q_s_train)
    if scaler is None:
        scaler = fit_minmax(np.asarray(q_p_train))
    qn = scaler.transform(q_p_train)
    phi = kernel_matrix(qn, qn, epsilon, kernel)
    phi = phi + lambda_reg * jnp.eye(phi.shape[0], dtype=phi.dtype)
    u, s, vh = jnp.linalg.svd(phi, full_matrices=False)
    s_inv = jnp.where(s > sval_tol * s[0], 1.0 / s, 0.0)
    w = (vh.T * s_inv[None, :]) @ (u.T @ q_s_train)
    return GlobalRBF(w_global=w, q_p_train=qn, epsilon=float(epsilon),
                     kernel=kernel, scaler=scaler)


# --------------------------------------------------------------------------
# k-nearest-neighbor RBF (dynamic local solve per query)
# --------------------------------------------------------------------------

class KNNRBF(NamedTuple):
    q_p_train: jnp.ndarray     # (n_train, n_p), normalized
    q_s_train: jnp.ndarray     # (n_train, n_s)
    epsilon: float
    neighbors: int
    kernel: str
    scaler: MinMaxScaler
    # Tikhonov ridge on the local interpolation system. The reference
    # solves unregularized (rbf_utils.py local np.linalg.solve); 1e-8
    # preserves that behavior to round-off. Larger values are a REAL
    # hyperparameter: at the searched (eps, k) the local systems are
    # cond ~1e10 at 1e-8, and a 1e-5 ridge cuts held-out secondary-
    # coordinate prediction error ~2-5x (it stops the interpolant from
    # fitting noise directions) — train_knn_rbf_search sweeps it.
    ridge: float = 1e-8


def _knn_gather(model: KNNRBF, x):
    """Indices + coordinates of the k nearest training points to x.

    Distances and top_k run in f32 regardless of the model dtype:
    neighbor SELECTION only needs ~7 digits (the sets differ only on
    exact distance ties), while f64 top_k/sort is heavily emulated on
    TPU. The gathered coordinates keep the model dtype."""
    d2 = jnp.sum((model.q_p_train.astype(jnp.float32)
                  - x[None, :].astype(jnp.float32)) ** 2, axis=1)
    _, idx = jax.lax.top_k(-d2, model.neighbors)
    return model.q_p_train[idx], model.q_s_train[idx]


# strictly positive-definite kernels (any point set): Cholesky-safe.
# multiquadric/linear are only conditionally PD and keep the QR solve.
_PD_KERNELS = frozenset({"gaussian", "imq", "matern"})


def _knn_local_weights(model: KNNRBF, xk, yk):
    """Solve the local interpolation system Phi_k W = q_s_k.

    PD kernels solve by Cholesky (one k x k factorization, ~4x cheaper
    than Householder QR and much cheaper under the TPU's emulated f64 —
    this runs inside every online Gauss-Newton iteration). The
    conditionally-PD kernels (multiquadric/linear) keep QR; LU
    (jnp.linalg.solve) fails to compile in f64 on the axon TPU backend.
    """
    phi = kernel_matrix(xk, xk, model.epsilon, model.kernel)
    phi = phi + model.ridge * jnp.eye(phi.shape[0], dtype=phi.dtype)
    if model.kernel in _PD_KERNELS:
        from jax.scipy.linalg import cho_factor, cho_solve

        if phi.dtype == jnp.float64 and model.ridge >= 1e-6:
            # mixed-precision refined solve: factorize once in f32 (the
            # f64 Cholesky is a sequential blocked loop under the TPU's
            # f64 emulation — the dominant cost of every online kNN
            # Gauss-Newton iteration), then f64 residual-correction
            # passes recover f64 accuracy. Correct only when the ridge
            # keeps cond(phi) within f32 range (contraction per pass
            # ~ eps_f32 * cond <= 1e-7/ridge); the 1e-8 reference-
            # faithful default keeps the pure f64 factorization.
            f32 = jnp.float32
            cf = cho_factor(phi.astype(f32))
            w = cho_solve(cf, yk.astype(f32)).astype(phi.dtype)
            for _ in range(3):
                r = yk - hi_matmul(phi, w)
                w = w + cho_solve(cf, r.astype(f32)).astype(phi.dtype)
            return w
        return cho_solve(cho_factor(phi), yk)
    from finitedifference_tpu.solvers import lstsq_qr

    return lstsq_qr(phi, yk)


def rbf_knn_predict(model: KNNRBF, y):
    """kNN-RBF interpolation (reference
    interpolate_with_rbf_nearest_neighbors_dynamic_*, rbf_utils.py:381-673):
    query -> k nearest -> local Phi solve -> psi @ W_local."""
    x = model.scaler.transform(y)
    xk, yk = _knn_gather(model, x)
    w_loc = _knn_local_weights(model, xk, yk)
    phi, _ = _get_kernel(model.kernel)
    r = jnp.linalg.norm(xk - x[None, :], axis=1)
    return hi_matmul(phi(r, model.epsilon), w_loc)


def rbf_knn_jacobian(model: KNNRBF, y):
    """Analytic Jacobian holding the neighbor set fixed (reference
    compute_rbf_jacobian_nearest_neighbors_dynamic_*, rbf_utils.py:36-379)."""
    _, dr_over_r = _get_kernel(model.kernel)
    x = model.scaler.transform(y)
    xk, yk = _knn_gather(model, x)
    w_loc = _knn_local_weights(model, xk, yk)
    diff = x[None, :] - xk
    r = jnp.linalg.norm(diff, axis=1)
    dpsi = dr_over_r(r, model.epsilon)[:, None] * diff   # (k, n_p)
    jac_norm = hi_matmul(w_loc.T, dpsi)                  # (n_s, n_p)
    return jac_norm * model.scaler.scale_[None, :]


def rbf_knn_predict_and_jacobian(model: KNNRBF, y):
    """Fused value + Jacobian sharing ONE neighbor search and ONE local
    kernel solve (separately, rbf_knn_predict and rbf_knn_jacobian each
    pay a top_k + k x k factorization — the dominant online cost of the
    kNN closure, paid inside every Gauss-Newton iteration)."""
    phi, dr_over_r = _get_kernel(model.kernel)
    x = model.scaler.transform(y)
    xk, yk = _knn_gather(model, x)
    w_loc = _knn_local_weights(model, xk, yk)
    diff = x[None, :] - xk
    r = jnp.linalg.norm(diff, axis=1)
    pred = hi_matmul(phi(r, model.epsilon), w_loc)
    dpsi = dr_over_r(r, model.epsilon)[:, None] * diff
    jac = hi_matmul(w_loc.T, dpsi) * model.scaler.scale_[None, :]
    return pred, jac


def knn_rbf_closure(model: KNNRBF) -> Closure:
    """Precision bridge as in global_rbf_closure: the local kernel solve
    + contraction run at the model dtype (f64 under x64)."""
    cd = jnp.asarray(model.q_p_train).dtype

    def predict(y):
        return rbf_knn_predict(model, y.astype(cd)).astype(y.dtype)

    def jacobian(y):
        return rbf_knn_jacobian(model, y.astype(cd)).astype(y.dtype)

    def both(y):
        p, j = rbf_knn_predict_and_jacobian(model, y.astype(cd))
        return p.astype(y.dtype), j.astype(y.dtype)

    return Closure(predict=predict, jacobian=jacobian,
                   predict_and_jacobian=both)


def fit_knn_rbf(q_p_train, q_s_train, epsilon, neighbors: int,
                kernel: str = "gaussian",
                scaler: MinMaxScaler | None = None,
                ridge: float = 1e-8) -> KNNRBF:
    from finitedifference_tpu.closures.common import fit_minmax

    _get_kernel(kernel)   # validate early
    q_p_train = jnp.asarray(q_p_train)
    if scaler is None:
        scaler = fit_minmax(np.asarray(q_p_train))
    return KNNRBF(
        q_p_train=scaler.transform(q_p_train),
        q_s_train=jnp.asarray(q_s_train),
        epsilon=float(epsilon), neighbors=int(neighbors),
        kernel=kernel, scaler=scaler, ridge=float(ridge),
    )
