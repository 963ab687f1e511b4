"""Gaussian-process closure: Matérn-3/2 GP regression q_p -> q_s.

Replaces the reference's sklearn GaussianProcessRegressor usage
(POD-GP/train_gp.py:67-74: ConstantKernel x Matern(nu=1.5) on MinMax-
scaled inputs) and its custom fast predict `k_vec @ alpha_`
(hypernet2D.py:1482-1487) + hand-derived Matérn gradient
(`matern15_grad`/`jac_gp`, hypernet2D.py:1720-1808).

TPU-native: the fit maximizes the exact multi-output log marginal
likelihood with optax Adam on (log amplitude, log length-scale) — fully
jitted — and predict/Jacobian are closed-form device expressions.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from finitedifference_tpu.closures.common import Closure, MinMaxScaler
from finitedifference_tpu.precision import hi_matmul


def matern32(xa, xb, length_scale, amplitude=1.0, nu: float = 1.5):
    """k(xa, xb) = amp * (1 + sqrt(3) r) exp(-sqrt(3) r) with
    r = ||(xa - xb) / l|| (nu=1.5, the reference's kernel,
    POD-GP/train_gp.py:67-74), or the Matérn-5/2
    amp * (1 + s + s^2/3) exp(-s), s = sqrt(5) r (nu=2.5 — sklearn's
    Matern(nu) exposes the same choice; C^2 smoothness gives the LSPG
    Gauss-Newton a smoother closure Jacobian). length_scale may be a
    scalar or an (n_p,) ARD vector."""
    scaled = (xa[:, None, :] - xb[None, :, :]) / length_scale
    # safe norm: length_scale now sits inside the norm, so the ARD
    # hyper-gradient differentiates through it — d||v||/dv at v=0 is
    # NaN on the diagonal without the floor
    r2 = jnp.sum(scaled * scaled, axis=-1)
    r = jnp.sqrt(jnp.maximum(r2, jnp.asarray(1e-36, r2.dtype)))
    if nu == 2.5:
        s = jnp.sqrt(5.0) * r
        return amplitude * (1.0 + s + s * s / 3.0) * jnp.exp(-s)
    s = jnp.sqrt(3.0) * r
    return amplitude * (1.0 + s) * jnp.exp(-s)


class GPModel(NamedTuple):
    x_train: jnp.ndarray       # (N, n_p) scaled inputs
    alpha: jnp.ndarray         # (N, n_s) = K^{-1} Y
    length_scale: jnp.ndarray  # scalar or (n_p,) ARD scales
    amplitude: jnp.ndarray     # scalar
    noise: float
    scaler: MinMaxScaler
    nu: float = 1.5            # Matérn smoothness (1.5 or 2.5)


def _log_marginal_likelihood(params, x, y, noise, nu: float = 1.5):
    log_amp, log_ls = params[0], params[1:]
    k = matern32(x, x, jnp.exp(log_ls), jnp.exp(log_amp), nu=nu)
    k = k + noise * jnp.eye(x.shape[0], dtype=x.dtype)
    chol = jnp.linalg.cholesky(k)
    alpha = jax.scipy.linalg.cho_solve((chol, True), y)
    n, n_out = y.shape
    quad = jnp.sum(y * alpha)
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diag(chol)))
    return -0.5 * quad - 0.5 * n_out * logdet \
        - 0.5 * n * n_out * jnp.log(2.0 * jnp.pi)


@functools.partial(jax.jit, static_argnames=("num_steps", "ard", "nu"))
def _optimize_hypers(x, y, noise, num_steps: int = 200,
                     learning_rate: float = 0.05, ard: bool = False,
                     nu: float = 1.5):
    n_ls = x.shape[1] if ard else 1
    params0 = jnp.zeros(1 + n_ls, x.dtype)   # log amp = log ls = 0
    opt = optax.adam(learning_rate)
    loss = lambda p: -_log_marginal_likelihood(p, x, y, noise, nu=nu)

    def step(carry, _):
        params, state = carry
        g = jax.grad(loss)(params)
        updates, state = opt.update(g, state, params)
        return (optax.apply_updates(params, updates), state), None

    (params, _), _ = jax.lax.scan(step, (params0, opt.init(params0)), None,
                                  length=num_steps)
    return params


def fit_gp(q_p_train, q_s_train, scaler: MinMaxScaler | None = None,
           noise: float = 1e-8, optimize: bool = True,
           num_steps: int = 200, ard: bool = False,
           nu: float = 1.5) -> GPModel:
    """Fit a multi-output Matérn-3/2 GP (shared kernel across outputs,
    like sklearn's multi-output GPR). ard=True learns one length scale
    per input dimension instead of the reference's single isotropic
    scale."""
    from finitedifference_tpu.closures.common import fit_minmax

    q_p_train = jnp.asarray(q_p_train)
    q_s_train = jnp.asarray(q_s_train)
    if scaler is None:
        scaler = fit_minmax(np.asarray(q_p_train))
    x = scaler.transform(q_p_train)

    if optimize:
        params = _optimize_hypers(x, q_s_train, noise,
                                  num_steps=num_steps, ard=ard, nu=nu)
        amp = jnp.exp(params[0])
        ls = jnp.exp(params[1:]) if ard else jnp.exp(params[1])
    else:
        amp = jnp.asarray(1.0, x.dtype)
        ls = jnp.asarray(1.0, x.dtype)

    k = matern32(x, x, ls, amp, nu=nu) \
        + noise * jnp.eye(x.shape[0], dtype=x.dtype)
    chol = jnp.linalg.cholesky(k)
    alpha = jax.scipy.linalg.cho_solve((chol, True), q_s_train)
    return GPModel(x_train=x, alpha=alpha, length_scale=ls, amplitude=amp,
                   noise=noise, scaler=scaler, nu=float(nu))


def gp_predict(model: GPModel, y):
    """q_s(y) = k(X_train, x)^T @ alpha (reference custom predict,
    hypernet2D.py:1482-1487)."""
    x = model.scaler.transform(y)
    k_vec = matern32(model.x_train, x[None, :], model.length_scale,
                     model.amplitude, nu=model.nu)[:, 0]
    return hi_matmul(k_vec, model.alpha)


def gp_jacobian(model: GPModel, y):
    """Analytic d q_s / d y via the Matérn-3/2 gradient
    dk/dx = -3 amp / l^2 * exp(-sqrt(3) r / l) * (x - X_i)
    (reference matern15_grad + jac_gp, hypernet2D.py:1720-1808),
    chained through the MinMax scaling."""
    x = model.scaler.transform(y)
    diff = x[None, :] - model.x_train            # (N, n_p)
    r = jnp.linalg.norm(diff / model.length_scale, axis=1)
    if model.nu == 2.5:
        s = jnp.sqrt(5.0) * r
        # d k52 / dx = -(5/3) amp (1+s) e^{-s} diff / l^2
        dk = (-(5.0 / 3.0) * model.amplitude / model.length_scale**2) \
            * ((1.0 + s) * jnp.exp(-s))[:, None] * diff
    else:
        s = jnp.sqrt(3.0) * r
        dk = (-3.0 * model.amplitude / model.length_scale**2) \
            * jnp.exp(-s)[:, None] * diff        # (N, n_p); ls broadcasts
    jac_scaled = hi_matmul(model.alpha.T, dk)    # (n_s, n_p)
    return jac_scaled * model.scaler.scale_[None, :]


def gp_predict_and_jacobian(model: GPModel, y):
    """Fused value + Jacobian sharing the scaled-difference / distance
    evaluation against the training set (the Gauss-Newton body needs
    both at the same y every iteration)."""
    x = model.scaler.transform(y)
    diff = x[None, :] - model.x_train            # (N, n_p)
    r = jnp.linalg.norm(diff / model.length_scale, axis=1)
    if model.nu == 2.5:
        s = jnp.sqrt(5.0) * r
        es = jnp.exp(-s)
        pred = hi_matmul(
            model.amplitude * (1.0 + s + s * s / 3.0) * es, model.alpha)
        dk = (-(5.0 / 3.0) * model.amplitude / model.length_scale**2) \
            * ((1.0 + s) * es)[:, None] * diff
    else:
        s = jnp.sqrt(3.0) * r
        es = jnp.exp(-s)
        pred = hi_matmul(model.amplitude * (1.0 + s) * es, model.alpha)
        dk = (-3.0 * model.amplitude / model.length_scale**2) \
            * es[:, None] * diff
    jac = hi_matmul(model.alpha.T, dk) * model.scaler.scale_[None, :]
    return pred, jac


def gp_closure(model: GPModel) -> Closure:
    """Precision bridge (see closures/rbf.py::global_rbf_closure): the
    k-vector @ alpha contraction cancels heavily; it runs at the model
    dtype (f64 under x64) independent of the solver dtype."""
    cd = jnp.asarray(model.alpha).dtype

    def predict(y):
        return gp_predict(model, y.astype(cd)).astype(y.dtype)

    def jacobian(y):
        return gp_jacobian(model, y.astype(cd)).astype(y.dtype)

    def both(y):
        p, j = gp_predict_and_jacobian(model, y.astype(cd))
        return p.astype(y.dtype), j.astype(y.dtype)

    return Closure(predict=predict, jacobian=jacobian,
                   predict_and_jacobian=both)
