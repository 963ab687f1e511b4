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


@functools.partial(jax.jit, static_argnames=("num_steps",))
def _optimize_mode_scales(eigvals, ytilde, params0, num_steps: int = 200,
                          learning_rate: float = 0.05):
    """Per-output (amplitude, noise) LML maximization in the eigenbasis
    of the shared unit-amplitude kernel.

    With K = Q diag(lam) Q^T and ytilde = Q^T y_j, mode j's kernel
    a_j K + n_j I shares the eigenvectors, so its exact log marginal
    likelihood is O(N) per evaluation:

        L_j = -1/2 sum_i yt_i^2/(a lam_i + n)
              -1/2 sum_i log(a lam_i + n) - N/2 log 2pi.

    Optimizes (log a_j, log n_j) for every output with one vmapped Adam
    scan — the trick that makes a per-mode GP family tractable where the
    reference fits 140 independent sklearn GPRs
    (POD-GP/compute_gp_models.py)."""
    opt = optax.adam(learning_rate)

    def lml(p, yt):
        d = jnp.exp(p[0]) * eigvals + jnp.exp(p[1]) + 1e-12
        return -0.5 * jnp.sum(yt * yt / d) - 0.5 * jnp.sum(jnp.log(d))

    def one_mode(yt, p0):
        def step(carry, _):
            p, s = carry
            g = jax.grad(lambda q: -lml(q, yt))(p)
            up, s = opt.update(g, s, p)
            return (optax.apply_updates(p, up), s), None
        (p, _), _ = jax.lax.scan(step, (p0, opt.init(p0)), None,
                                 length=num_steps)
        return p

    return jax.vmap(one_mode)(ytilde.T, params0)


def fit_gp_per_mode(q_p_train, q_s_train,
                    scaler: MinMaxScaler | None = None,
                    noise: float = 1e-6, optimize: bool = True,
                    num_steps: int = 200, ard: bool = True,
                    nu: float = 1.5) -> GPModel:
    """Per-mode amplitude/noise GP with shared ARD length scales.

    The shared-kernel multi-output fit (fit_gp) applies one (amplitude,
    noise) pair to secondary coordinates whose magnitudes span orders of
    magnitude, so small-magnitude modes are effectively over-smoothed.
    This variant keeps the shared length scales (one kernel geometry),
    eigendecomposes the unit kernel once, and gives every output its own
    exactly-optimized (a_j, n_j) — then folds a_j into alpha so the
    result is an ordinary GPModel (amplitude 1) and the online closure
    is unchanged. Middle ground between fit_gp and the reference's
    fully independent per-mode GPs (POD-GP/compute_gp_models.py)."""
    from finitedifference_tpu.closures.common import fit_minmax

    q_p_train = jnp.asarray(q_p_train)
    y = jnp.asarray(q_s_train)
    if scaler is None:
        scaler = fit_minmax(np.asarray(q_p_train))
    x = scaler.transform(q_p_train)

    shared = _optimize_hypers(x, y, noise, num_steps=num_steps,
                              ard=ard, nu=nu) if optimize \
        else jnp.zeros(1 + (x.shape[1] if ard else 1), x.dtype)
    amp0, ls = jnp.exp(shared[0]), jnp.exp(shared[1:])
    if not ard:
        ls = ls[0]

    k_unit = matern32(x, x, ls, 1.0, nu=nu)
    eigvals, q = jnp.linalg.eigh(k_unit)
    eigvals = jnp.maximum(eigvals, 0.0)
    ytilde = hi_matmul(q.T, y)                       # (N, n_s)

    params0 = jnp.tile(
        jnp.array([jnp.log(amp0), jnp.log(jnp.asarray(noise, x.dtype))]),
        (y.shape[1], 1)).astype(x.dtype)
    params = _optimize_mode_scales(eigvals, ytilde, params0,
                                   num_steps=num_steps)
    amps = jnp.exp(params[:, 0])                     # (n_s,)
    noises = jnp.exp(params[:, 1])                   # (n_s,)

    # alpha_j = Q (a_j lam + n_j)^{-1} ytilde_j; predict uses the unit
    # kernel vector, so fold a_j in: pred_j = a_j k_u^T alpha_j.
    denom = amps[None, :] * eigvals[:, None] + noises[None, :] + 1e-12
    alpha = hi_matmul(q, ytilde / denom) * amps[None, :]
    return GPModel(x_train=x, alpha=alpha, length_scale=ls,
                   amplitude=jnp.asarray(1.0, x.dtype),
                   noise=float(jnp.median(noises)), scaler=scaler,
                   nu=float(nu))


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


class PerModeGPModel(NamedTuple):
    """Fully independent per-output GPs (role of the reference's
    POD-GP/compute_gp_models.py, which pickles one sklearn GPR per
    secondary mode): each output owns its ARD length scales and
    amplitude. Stored batched so the online closure is one fused
    einsum, not n_s kernel calls."""
    x_train: jnp.ndarray       # (N, n_p) scaled inputs
    alpha: jnp.ndarray         # (N, n_s), column j = K_j^{-1} y_j
    length_scale: jnp.ndarray  # (n_s, n_p) per-mode ARD scales
    amplitude: jnp.ndarray     # (n_s,)
    noise: float
    scaler: MinMaxScaler
    nu: float = 1.5


def _svgp_terms(hyp, z, x, y, noise, nu: float):
    """Shared algebra of the collapsed SVGP bound (Titsias 2009).

    A = L_z^{-1} K_zn / sigma, B = I + A A^T, c = L_B^{-1} A y / sigma.
    Returns (A, L_z, L_B, c)."""
    amp = jnp.exp(hyp[0])
    ls = jnp.exp(hyp[1:])
    m = z.shape[0]
    jitter = 1e-10 + 1e-8 * amp
    kzz = matern32(z, z, ls, amp, nu=nu) \
        + jitter * jnp.eye(m, dtype=z.dtype)
    kzn = matern32(z, x, ls, amp, nu=nu)
    lz = jnp.linalg.cholesky(kzz)
    sigma = jnp.sqrt(noise)
    a = jax.scipy.linalg.solve_triangular(lz, kzn, lower=True) / sigma
    b = jnp.eye(m, dtype=z.dtype) + a @ a.T
    lb = jnp.linalg.cholesky(b)
    c = jax.scipy.linalg.solve_triangular(lb, a @ y, lower=True) / sigma
    return a, lz, lb, c


def _collapsed_elbo(hyp, z, x, y, noise, nu: float = 1.5):
    """Titsias's collapsed variational bound for Gaussian-likelihood
    sparse GP regression (multi-output, shared kernel):

        L = log N(Y | 0, Q_nn + sigma^2 I)
            - n_out/(2 sigma^2) tr(K_nn - Q_nn),
        Q_nn = K_nz K_zz^{-1} K_zn.

    This is the exact optimum over q(u) of the reference's variational
    ELBO (POD-GP/compute_gp_models_pytorch.py:259-321 trains it
    stochastically with GPyTorch); for a Gaussian likelihood the
    optimal variational distribution is closed-form, so the bound
    collapses to an O(N M^2) expression maximized directly."""
    amp = jnp.exp(hyp[0])
    a, _, lb, c = _svgp_terms(hyp, z, x, y, noise, nu)
    n, n_out = y.shape
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diag(lb)))
    quad = jnp.sum(y * y) / noise - jnp.sum(c * c)
    trace = amp * n - noise * jnp.sum(a * a)
    return -0.5 * n_out * (n * jnp.log(2.0 * jnp.pi * noise) + logdet) \
        - 0.5 * quad - 0.5 * n_out * trace / noise


@functools.partial(jax.jit, static_argnames=("num_steps", "nu"))
def _optimize_svgp(x, y, z0, noise, num_steps: int = 300,
                   learning_rate: float = 0.05, nu: float = 1.5):
    """Jointly optimize (log amp, log ARD scales, inducing locations)
    by Adam on the negative collapsed bound — one jitted scan."""
    hyp0 = jnp.zeros(1 + x.shape[1], x.dtype)
    params0 = (hyp0, z0)
    opt = optax.adam(learning_rate)
    loss = lambda p: -_collapsed_elbo(p[0], p[1], x, y, noise, nu=nu)

    def step(carry, _):
        params, state = carry
        g = jax.grad(loss)(params)
        updates, state = opt.update(g, state, params)
        return (optax.apply_updates(params, updates), state), None

    (params, _), _ = jax.lax.scan(step, (params0, opt.init(params0)),
                                  None, length=num_steps)
    return params


def fit_gp_variational(q_p_train, q_s_train,
                       scaler: MinMaxScaler | None = None,
                       noise: float = 1e-6, num_inducing: int = 64,
                       num_steps: int = 300, nu: float = 1.5,
                       learning_rate: float = 0.05) -> GPModel:
    """Sparse variational GP regression (role of the reference's
    GPyTorch SVGP option, POD-GP/compute_gp_models_pytorch.py:259-321).

    TPU-native reformulation: for the Gaussian likelihood the
    variational posterior over inducing values is available in closed
    form, so instead of the reference's minibatched ELBO ascent this
    maximizes Titsias's collapsed bound — O(N M^2) per step, ARD
    kernel, inducing locations optimized jointly — in one jitted Adam
    scan. The fitted predictive mean is k(x, Z) W, exactly the exact-GP
    mean form, so it returns a plain GPModel (Z as x_train, W as
    alpha): predict/Jacobian/closure/persistence reuse the exact-GP
    machinery unchanged, and the online solver cost drops from O(N)
    to O(M) kernel evaluations per step."""
    from finitedifference_tpu.closures.common import fit_minmax

    q_p_train = jnp.asarray(q_p_train)
    y = jnp.asarray(q_s_train)
    if scaler is None:
        scaler = fit_minmax(np.asarray(q_p_train))
    x = scaler.transform(q_p_train)
    n = x.shape[0]
    m = min(num_inducing, n)
    # deterministic spread seed for the inducing set
    idx = np.random.default_rng(0).permutation(n)[:m]
    z0 = x[jnp.asarray(np.sort(idx))]

    hyp, z = _optimize_svgp(x, y, z0, noise, num_steps=num_steps,
                            learning_rate=learning_rate, nu=nu)
    _, lz, lb, c = _svgp_terms(hyp, z, x, y, noise, nu)
    # predictive-mean weights: mean(x*) = k(x*, Z) @ W with
    # W = L_z^{-T} L_B^{-T} c (GPflow SGPR predict algebra)
    w = jax.scipy.linalg.solve_triangular(
        lz.T, jax.scipy.linalg.solve_triangular(lb.T, c, lower=False),
        lower=False)
    return GPModel(x_train=z, alpha=w, length_scale=jnp.exp(hyp[1:]),
                   amplitude=jnp.exp(hyp[0]), noise=noise,
                   scaler=scaler, nu=float(nu))


def fit_gp_full_per_mode(q_p_train, q_s_train,
                         scaler: MinMaxScaler | None = None,
                         noise: float = 1e-6, num_steps: int = 150,
                         nu: float = 1.5,
                         mode_chunk: int = 8) -> PerModeGPModel:
    """Fit one ARD GP per output mode (the reference's per-mode family,
    POD-GP/compute_gp_models.py) as a single batched device program:
    lax.map over chunks of modes, each chunk vmapping the jitted Adam
    hyperopt — bounded memory (chunk x N x N kernels) instead of 140
    concurrent Cholesky buffers."""
    from finitedifference_tpu.closures.common import fit_minmax

    q_p_train = jnp.asarray(q_p_train)
    y = jnp.asarray(q_s_train)
    if scaler is None:
        scaler = fit_minmax(np.asarray(q_p_train))
    x = scaler.transform(q_p_train)
    n_s = y.shape[1]

    def fit_one(yj):
        params = _optimize_hypers(x, yj[:, None], noise,
                                  num_steps=num_steps, ard=True, nu=nu)
        amp, ls = jnp.exp(params[0]), jnp.exp(params[1:])
        k = matern32(x, x, ls, amp, nu=nu) \
            + noise * jnp.eye(x.shape[0], dtype=x.dtype)
        chol = jnp.linalg.cholesky(k)
        alpha = jax.scipy.linalg.cho_solve((chol, True), yj[:, None])
        return alpha[:, 0], ls, amp

    # pad the mode axis to a chunk multiple so lax.map sees equal chunks
    pad = (-n_s) % mode_chunk
    y_pad = jnp.concatenate([y, jnp.zeros((y.shape[0], pad), y.dtype)],
                            axis=1) if pad else y
    cols = y_pad.T.reshape(-1, mode_chunk, y.shape[0])
    alphas, lss, amps = jax.lax.map(jax.vmap(fit_one), cols)
    alphas = alphas.reshape(-1, y.shape[0])[:n_s]
    return PerModeGPModel(
        x_train=x, alpha=alphas.T,
        length_scale=lss.reshape(-1, x.shape[1])[:n_s],
        amplitude=amps.reshape(-1)[:n_s],
        noise=noise, scaler=scaler, nu=float(nu))


def _per_mode_kernel_terms(model: PerModeGPModel, x):
    """Shared geometry for the batched per-mode closure: per-mode scaled
    distances s (N, n_s) and the raw input differences diff (N, n_p)."""
    diff = x[None, :] - model.x_train                    # (N, n_p)
    inv_ls2 = 1.0 / (model.length_scale ** 2)            # (n_s, n_p)
    r2 = hi_matmul(diff * diff, inv_ls2.T)                # (N, n_s)
    r = jnp.sqrt(jnp.maximum(r2, jnp.asarray(1e-36, r2.dtype)))
    s = (jnp.sqrt(5.0) if model.nu == 2.5 else jnp.sqrt(3.0)) * r
    return diff, inv_ls2, s


def per_mode_gp_predict(model: PerModeGPModel, y):
    """pred_j = sum_i k_j(x, X_i) alpha_ij — all modes in one fused
    elementwise + reduction (reference: a Python loop over per-mode
    GPR.predict calls, compute_gp_models.py)."""
    x = model.scaler.transform(y)
    _, _, s = _per_mode_kernel_terms(model, x)
    poly = (1.0 + s + s * s / 3.0) if model.nu == 2.5 else (1.0 + s)
    k = poly * jnp.exp(-s)                               # (N, n_s)
    return model.amplitude * jnp.sum(k * model.alpha, axis=0)


def per_mode_gp_predict_and_jacobian(model: PerModeGPModel, y):
    """Fused batched value + Jacobian. For Matérn-3/2,
    dk_j/dx = -3 a_j e^{-s} (x - X_i) / l_j^2; for 5/2,
    dk_j/dx = -(5/3) a_j (1+s) e^{-s} (x - X_i) / l_j^2. The mode-wise
    contraction is one einsum over the training axis."""
    x = model.scaler.transform(y)
    diff, inv_ls2, s = _per_mode_kernel_terms(model, x)
    es = jnp.exp(-s)                                     # (N, n_s)
    if model.nu == 2.5:
        pred = model.amplitude * jnp.sum(
            (1.0 + s + s * s / 3.0) * es * model.alpha, axis=0)
        w = -(5.0 / 3.0) * (1.0 + s) * es * model.alpha  # (N, n_s)
    else:
        pred = model.amplitude * jnp.sum((1.0 + s) * es * model.alpha,
                                         axis=0)
        w = -3.0 * es * model.alpha
    # jac[j, p] = a_j inv_ls2[j, p] sum_i w_ij diff_ip
    jac = jnp.einsum("ij,ip->jp", w, diff,
                     preferred_element_type=w.dtype) * inv_ls2
    jac = model.amplitude[:, None] * jac
    return pred, jac * model.scaler.scale_[None, :]


def per_mode_gp_jacobian(model: PerModeGPModel, y):
    return per_mode_gp_predict_and_jacobian(model, y)[1]


def gp_closure(model) -> Closure:
    """Precision bridge (see closures/rbf.py::global_rbf_closure): the
    k-vector @ alpha contraction cancels heavily; it runs at the model
    dtype (f64 under x64) independent of the solver dtype. Dispatches on
    the model type: shared-kernel GPModel or batched PerModeGPModel."""
    cd = jnp.asarray(model.alpha).dtype
    per_mode = isinstance(model, PerModeGPModel)
    f_pred = per_mode_gp_predict if per_mode else gp_predict
    f_jac = per_mode_gp_jacobian if per_mode else gp_jacobian
    f_both = per_mode_gp_predict_and_jacobian if per_mode \
        else gp_predict_and_jacobian

    def predict(y):
        return f_pred(model, y.astype(cd)).astype(y.dtype)

    def jacobian(y):
        return f_jac(model, y.astype(cd)).astype(y.dtype)

    def both(y):
        p, j = f_both(model, y.astype(cd))
        return p.astype(y.dtype), j.astype(y.dtype)

    return Closure(predict=predict, jacobian=jacobian,
                   predict_and_jacobian=both)
