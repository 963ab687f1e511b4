"""Global-RBF weight training with hyperparameter search.

Role of the reference's POD-RBF_global trainers
(compute_global_weights_grid_search_with_kernels.py:115-363 and the
bayesian-optimization variants): dedup the projected coordinates,
MinMax-scale q_p to (-1, 1), grid-search (epsilon, kernel) on a
train/val split with the SVD-regularized solve of Phi W = q_s, and keep
the best model.

TPU-native: every (epsilon, kernel) candidate fit+eval is a jitted
device computation; with a fixed kernel the epsilon sweep is vmapped so
the whole grid search is one compiled program per kernel.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from finitedifference_tpu.closures.common import fit_minmax
from finitedifference_tpu.closures.rbf import (
    GlobalRBF,
    fit_global_rbf,
    kernel_matrix,
)


def remove_duplicates(q_p, q_s, decimals: int = 8):
    """Drop duplicate q_p rows (tolerance-rounded np.unique, like the
    reference's remove_duplicates)."""
    q_p = np.asarray(q_p)
    q_s = np.asarray(q_s)
    _, idx = np.unique(np.round(q_p, decimals), axis=0, return_index=True)
    idx = np.sort(idx)
    return q_p[idx], q_s[idx]


def _val_error(q_p_tr, q_s_tr, q_p_va, q_s_va, eps, kernel, scaler,
               lambda_reg=1e-8, sval_tol=1e-8):
    qn_tr = scaler.transform(q_p_tr)
    qn_va = scaler.transform(q_p_va)
    phi = kernel_matrix(qn_tr, qn_tr, eps, kernel)
    phi = phi + lambda_reg * jnp.eye(phi.shape[0], dtype=phi.dtype)
    u, s, vh = jnp.linalg.svd(phi, full_matrices=False)
    s_inv = jnp.where(s > sval_tol * s[0], 1.0 / s, 0.0)
    w = (vh.T * s_inv[None, :]) @ (u.T @ q_s_tr)
    pred = kernel_matrix(qn_va, qn_tr, eps, kernel) @ w
    return jnp.linalg.norm(pred - q_s_va) / jnp.linalg.norm(q_s_va)


def train_global_rbf(q_p, q_s, *,
                     epsilons: Sequence[float] = None,
                     kernels: Sequence[str] = ("gaussian", "imq",
                                               "multiquadric", "linear",
                                               "matern"),
                     train_frac: float = 0.8, seed: int = 1234557,
                     dedup: bool = True, on_host: bool = True,
                     verbose: bool = False) -> Tuple[GlobalRBF, dict]:
    """Grid-search (epsilon x kernel), return (best model, search log).

    on_host=True (default) runs the small dense fits on the host CPU
    backend — f64 kernel-matrix SVDs are emulated and ~100x slower on
    TPU, and this stage is offline.
    """
    if on_host:
        from finitedifference_tpu.closures.common import run_on_host_cpu
        return run_on_host_cpu(
            train_global_rbf, q_p, q_s, epsilons=epsilons, kernels=kernels,
            train_frac=train_frac, seed=seed, dedup=dedup, on_host=False,
            verbose=verbose)
    if epsilons is None:
        epsilons = np.logspace(-2, 1, 16)
    q_p = np.asarray(q_p)
    q_s = np.asarray(q_s)
    if dedup:
        q_p, q_s = remove_duplicates(q_p, q_s)

    rng = np.random.default_rng(seed)
    perm = rng.permutation(q_p.shape[0])
    n_tr = int(train_frac * q_p.shape[0])
    tr, va = perm[:n_tr], perm[n_tr:]
    scaler = fit_minmax(q_p[tr])

    qp_tr = jnp.asarray(q_p[tr])
    qs_tr = jnp.asarray(q_s[tr])
    qp_va = jnp.asarray(q_p[va])
    qs_va = jnp.asarray(q_s[va])

    log = {}
    best = (np.inf, None, None)
    eps_arr = jnp.asarray(np.asarray(epsilons, dtype=q_p.dtype))
    for kernel in kernels:
        errf = jax.jit(jax.vmap(
            lambda e: _val_error(qp_tr, qs_tr, qp_va, qs_va, e, kernel,
                                 scaler)))
        errs = np.asarray(errf(eps_arr))
        i = int(np.nanargmin(errs))
        log[kernel] = {"epsilons": np.asarray(epsilons).tolist(),
                       "errors": errs.tolist()}
        if verbose:
            print(f"  {kernel}: best eps={epsilons[i]:.4g} "
                  f"err={errs[i]:.3e}")
        if errs[i] < best[0]:
            best = (errs[i], float(epsilons[i]), kernel)

    _, eps_best, kern_best = best
    # final fit on ALL (deduped) data with the chosen hyperparameters
    model = fit_global_rbf(q_p, q_s, eps_best, kernel=kern_best,
                           scaler=fit_minmax(q_p))
    log["best"] = {"epsilon": eps_best, "kernel": kern_best,
                   "val_error": float(best[0])}
    return model, log


def train_knn_rbf_search(q_p, q_s, *, epsilons=None, neighbor_counts=None,
                         ridges=None,
                         kernel: str = "gaussian", train_frac: float = 0.8,
                         seed: int = 1234557, on_host: bool = True,
                         verbose: bool = False):
    """Hyperparameter search over (epsilon, k, ridge) for the kNN-RBF
    closure (role of the reference's grid_search_rbf_nearest_neighbors.py
    / bayesian_optimization_rbf_neighbors.py): fit on a train split,
    score by held-out reconstruction error, return the best KNNRBF.

    `ridges` extends the reference's (epsilon, k) grid with the local-
    system Tikhonov ridge (closures/rbf.py::KNNRBF.ridge): the searched
    (eps, k) optima sit at cond ~1e10 local systems where a 1e-5 ridge
    cuts held-out error severalfold, and any ridge >= 1e-6 additionally
    unlocks the mixed-precision local solve online.
    """
    if on_host:
        from finitedifference_tpu.closures.common import run_on_host_cpu
        return run_on_host_cpu(
            train_knn_rbf_search, q_p, q_s, epsilons=epsilons,
            neighbor_counts=neighbor_counts, ridges=ridges,
            kernel=kernel,
            train_frac=train_frac, seed=seed, on_host=False,
            verbose=verbose)

    from finitedifference_tpu.closures.rbf import (
        fit_knn_rbf,
        rbf_knn_predict,
    )

    q_p = np.asarray(q_p)
    q_s = np.asarray(q_s)
    if epsilons is None:
        epsilons = np.logspace(-2, 1, 8)
    rng = np.random.default_rng(seed)
    perm = rng.permutation(q_p.shape[0])
    n_tr = int(train_frac * q_p.shape[0])
    tr, va = perm[:n_tr], perm[n_tr:]
    if neighbor_counts is None:
        neighbor_counts = [k for k in (10, 20, 50, 100) if k <= n_tr]

    if ridges is None:
        ridges = [1e-8, 1e-6, 1e-5, 1e-4]

    qp_va = jnp.asarray(q_p[va])
    best = (np.inf, None)
    log = {}
    for k in neighbor_counts:
        for eps in epsilons:
            for ridge in ridges:
                model = fit_knn_rbf(q_p[tr], q_s[tr], float(eps),
                                    int(k), kernel=kernel,
                                    ridge=float(ridge))
                pred = jax.jit(jax.vmap(
                    lambda y: rbf_knn_predict(model, y)))(qp_va)
                err = float(np.linalg.norm(np.asarray(pred) - q_s[va])
                            / np.linalg.norm(q_s[va]))
                log[(int(k), float(eps), float(ridge))] = err
                if verbose:
                    print(f"  knn k={k} eps={eps:.4g} "
                          f"ridge={ridge:.1g}: err={err:.3e}")
                if err < best[0]:
                    best = (err, (int(k), float(eps), float(ridge)))

    err, (k_best, eps_best, ridge_best) = best
    # final fit on all data
    model = fit_knn_rbf(q_p, q_s, eps_best, k_best, kernel=kernel,
                        ridge=ridge_best)
    return model, {"best": {"neighbors": k_best, "epsilon": eps_best,
                            "ridge": ridge_best, "val_error": err},
                   "grid": {str(k): v for k, v in log.items()}}


def train_global_rbf_cv(q_p, q_s, *, epsilons=None,
                        kernels=("gaussian", "imq", "multiquadric"),
                        n_folds: int = 5, seed: int = 1234557,
                        dedup: bool = True, on_host: bool = True,
                        verbose: bool = False):
    """k-fold cross-validated (epsilon x kernel) grid search (role of the
    reference's compute_global_weights_grid_search_cv_with_kernels.py).
    All folds for one kernel evaluate as a single vmapped program over
    (fold, epsilon)."""
    if on_host:
        from finitedifference_tpu.closures.common import run_on_host_cpu
        return run_on_host_cpu(
            train_global_rbf_cv, q_p, q_s, epsilons=epsilons,
            kernels=kernels, n_folds=n_folds, seed=seed, dedup=dedup,
            on_host=False, verbose=verbose)

    q_p = np.asarray(q_p)
    q_s = np.asarray(q_s)
    if dedup:
        q_p, q_s = remove_duplicates(q_p, q_s)
    if epsilons is None:
        epsilons = np.logspace(-2, 1, 12)
    rng = np.random.default_rng(seed)
    perm = rng.permutation(q_p.shape[0])
    # equal-size folds (truncate the remainder)
    fold_size = q_p.shape[0] // n_folds
    folds = perm[: fold_size * n_folds].reshape(n_folds, fold_size)

    eps_arr = jnp.asarray(np.asarray(epsilons, dtype=q_p.dtype))
    best = (np.inf, None, None)
    log = {}
    for kernel in kernels:
        def one_fold(i):
            va = folds[i]
            tr = np.concatenate([folds[j] for j in range(n_folds)
                                 if j != i])
            scaler = fit_minmax(q_p[tr])
            errf = jax.vmap(lambda e: _val_error(
                jnp.asarray(q_p[tr]), jnp.asarray(q_s[tr]),
                jnp.asarray(q_p[va]), jnp.asarray(q_s[va]),
                e, kernel, scaler))
            return np.asarray(jax.jit(errf)(eps_arr))

        errs = np.mean([one_fold(i) for i in range(n_folds)], axis=0)
        i = int(np.nanargmin(errs))
        log[kernel] = {"epsilons": np.asarray(epsilons).tolist(),
                       "cv_errors": errs.tolist()}
        if verbose:
            print(f"  {kernel}: best eps={epsilons[i]:.4g} "
                  f"cv err={errs[i]:.3e}")
        if errs[i] < best[0]:
            best = (errs[i], float(epsilons[i]), kernel)

    _, eps_best, kern_best = best
    model = fit_global_rbf(q_p, q_s, eps_best, kernel=kern_best,
                           scaler=fit_minmax(q_p))
    log["best"] = {"epsilon": eps_best, "kernel": kern_best,
                   "cv_error": float(best[0])}
    return model, log


def train_global_rbf_bayesian(q_p, q_s, *, kernel: str = "gaussian",
                              n_iters: int = 20, n_seed: int = 5,
                              log_eps_bounds=(-4.0, 2.0),
                              train_frac: float = 0.8, seed: int = 1234557,
                              dedup: bool = True, on_host: bool = True,
                              verbose: bool = False):
    """Bayesian optimization of epsilon (role of the reference's
    compute_global_weights_bayesian_optimization_with_kernels.py, which
    uses skopt). Here: GP-expected-improvement over log10(epsilon) using
    this package's own Matérn-3/2 GP — no external optimizer.
    """
    if on_host:
        from finitedifference_tpu.closures.common import run_on_host_cpu
        return run_on_host_cpu(
            train_global_rbf_bayesian, q_p, q_s, kernel=kernel,
            n_iters=n_iters, n_seed=n_seed, log_eps_bounds=log_eps_bounds,
            train_frac=train_frac, seed=seed, dedup=dedup, on_host=False,
            verbose=verbose)

    from scipy.stats import norm as _norm

    from finitedifference_tpu.closures.gp import fit_gp, gp_predict, matern32

    q_p = np.asarray(q_p)
    q_s = np.asarray(q_s)
    if dedup:
        q_p, q_s = remove_duplicates(q_p, q_s)
    rng = np.random.default_rng(seed)
    perm = rng.permutation(q_p.shape[0])
    n_tr = int(train_frac * q_p.shape[0])
    tr, va = perm[:n_tr], perm[n_tr:]
    scaler = fit_minmax(q_p[tr])
    qp_tr, qs_tr = jnp.asarray(q_p[tr]), jnp.asarray(q_s[tr])
    qp_va, qs_va = jnp.asarray(q_p[va]), jnp.asarray(q_s[va])

    errf = jax.jit(lambda e: _val_error(qp_tr, qs_tr, qp_va, qs_va, e,
                                        kernel, scaler))
    lo, hi = log_eps_bounds
    xs = list(np.linspace(lo, hi, n_seed))
    ys = [float(jnp.log(errf(10.0 ** x) + 1e-300)) for x in xs]

    for it in range(n_iters - n_seed):
        gp = fit_gp(np.asarray(xs)[:, None], np.asarray(ys)[:, None],
                    noise=1e-6, num_steps=100)
        cand = np.linspace(lo, hi, 256)
        best = min(ys)
        # expected improvement from the GP posterior
        kv = np.asarray(matern32(gp.x_train,
                                 gp.scaler.transform(
                                     jnp.asarray(cand)[:, None]),
                                 gp.length_scale, gp.amplitude))  # (n, 256)
        mu_c = np.asarray(
            [float(gp_predict(gp, jnp.asarray([c]))[0]) for c in cand])
        # posterior variance (cheap full form: k** - k*^T K^-1 k*)
        kmat = np.asarray(matern32(gp.x_train, gp.x_train,
                                   gp.length_scale, gp.amplitude))
        kinv = np.linalg.inv(kmat + gp.noise * np.eye(kmat.shape[0]))
        var = np.maximum(float(gp.amplitude)
                         - np.einsum("ic,ij,jc->c", kv, kinv, kv), 1e-12)
        sd = np.sqrt(var)
        z = (best - mu_c) / sd
        ei = (best - mu_c) * _norm.cdf(z) + sd * _norm.pdf(z)
        x_next = float(cand[int(np.argmax(ei))])
        if any(abs(x_next - x) < 1e-9 for x in xs):
            x_next = float(rng.uniform(lo, hi))
        xs.append(x_next)
        ys.append(float(jnp.log(errf(10.0 ** x_next) + 1e-300)))
        if verbose:
            print(f"  bayes it {it}: log10(eps)={x_next:.3f} "
                  f"log(err)={ys[-1]:.3f}")

    eps_best = 10.0 ** xs[int(np.argmin(ys))]
    model = fit_global_rbf(q_p, q_s, eps_best, kernel=kernel,
                           scaler=fit_minmax(q_p))
    log = {"best": {"epsilon": float(eps_best), "kernel": kernel,
                    "val_error": float(np.exp(min(ys)))},
           "history": {"log10_eps": xs, "log_err": ys}}
    return model, log


def fit_global_rbf_anisotropic(q_p, q_s, *, kernel: str = "gaussian",
                               num_steps: int = 300, lr: float = 0.05,
                               train_frac: float = 0.8,
                               seed: int = 1234557, dedup: bool = True,
                               on_host: bool = True,
                               verbose: bool = False):
    """Anisotropic global RBF: per-dimension inverse length scales,
    fine-tuned by gradient descent on the validation error (role of the
    fine variant perform_training_bayesian_optimization_anisotropic_
    fine_tuned.py, which optimizes per-dim scales). Returns a GlobalRBF
    whose q_p_train is pre-multiplied by the learned scales and whose
    scaler chain absorbs them, so the standard predict/jacobian apply.
    """
    if on_host:
        from finitedifference_tpu.closures.common import run_on_host_cpu
        return run_on_host_cpu(
            fit_global_rbf_anisotropic, q_p, q_s, kernel=kernel,
            num_steps=num_steps, lr=lr, train_frac=train_frac, seed=seed,
            dedup=dedup, on_host=False, verbose=verbose)

    import optax

    from finitedifference_tpu.closures.common import MinMaxScaler

    q_p = np.asarray(q_p)
    q_s = np.asarray(q_s)
    if dedup:
        q_p, q_s = remove_duplicates(q_p, q_s)
    rng = np.random.default_rng(seed)
    perm = rng.permutation(q_p.shape[0])
    n_tr = int(train_frac * q_p.shape[0])
    tr, va = perm[:n_tr], perm[n_tr:]
    base = fit_minmax(q_p[tr])
    qp_tr, qs_tr = jnp.asarray(q_p[tr]), jnp.asarray(q_s[tr])
    qp_va, qs_va = jnp.asarray(q_p[va]), jnp.asarray(q_s[va])

    dim = q_p.shape[1]

    def val_err(log_scales):
        # differentiable variant of _val_error: ridge + LU solve instead
        # of the truncated SVD (SVD gradients NaN on near-degenerate
        # spectra). Host-CPU only (LU f64 unsupported on axon TPU).
        from finitedifference_tpu.closures.rbf import _get_kernel

        phi_fn, _ = _get_kernel(kernel)
        scales = jnp.exp(log_scales)
        sc = MinMaxScaler(scale_=base.scale_ * scales,
                          min_=base.min_ * scales)
        qn_tr = sc.transform(qp_tr)
        qn_va = sc.transform(qp_va)

        def kmat(xa, xb):
            # smoothed distance: d/dx ||x|| is NaN at 0 (the Gram
            # diagonal), so keep a tiny floor under the sqrt
            d2 = jnp.sum((xa[:, None, :] - xb[None, :, :]) ** 2, axis=-1)
            return phi_fn(jnp.sqrt(d2 + 1e-300), 1.0)

        phi = kmat(qn_tr, qn_tr)
        phi = phi + 1e-8 * jnp.eye(phi.shape[0], dtype=phi.dtype)
        w = jnp.linalg.solve(phi, qs_tr)
        pred = kmat(qn_va, qn_tr) @ w
        return jnp.linalg.norm(pred - qs_va) / jnp.linalg.norm(qs_va)

    params = jnp.zeros(dim)
    opt = optax.adam(lr)
    state = opt.init(params)
    grad_fn = jax.jit(jax.value_and_grad(val_err))
    for i in range(num_steps):
        err, g = grad_fn(params)
        updates, state = opt.update(g, state, params)
        params = optax.apply_updates(params, updates)
        if verbose and i % 50 == 0:
            print(f"  aniso it {i}: val err {float(err):.3e} "
                  f"scales {np.exp(np.asarray(params)).round(3)}")

    scales = jnp.exp(params)
    scaler = MinMaxScaler(scale_=base.scale_ * scales,
                          min_=base.min_ * scales)
    model = fit_global_rbf(q_p, q_s, 1.0, kernel=kernel, scaler=scaler)
    return model, {"scales": np.exp(np.asarray(params)).tolist(),
                   "val_error": float(val_err(params))}


def train_svr(q_p, q_s, *, c_grid=(0.1, 1.0, 10.0, 100.0),
              epsilon: float = 1e-3, gamma: str | float = "scale",
              train_frac: float = 0.8, seed: int = 1234557,
              verbose: bool = False):
    """SVR alternative to the RBF weights (role of the fine variant
    compute_global_svr_grid_search_with_kernels.py, sklearn SVR with a
    grid over C). Fits one RBF-kernel SVR per secondary mode on the host,
    then exports the support vectors / dual coefficients into a JAX
    closure: pred_j(x) = sum_i alpha_ij exp(-gamma ||x - sv_i||^2) + b_j.
    """
    from sklearn.svm import SVR

    from finitedifference_tpu.closures.common import Closure, fit_minmax

    q_p = np.asarray(q_p)
    q_s = np.asarray(q_s)
    rng = np.random.default_rng(seed)
    perm = rng.permutation(q_p.shape[0])
    n_tr = int(train_frac * q_p.shape[0])
    tr, va = perm[:n_tr], perm[n_tr:]
    scaler = fit_minmax(q_p[tr])
    xtr = np.asarray(scaler.transform(jnp.asarray(q_p[tr])))
    xva = np.asarray(scaler.transform(jnp.asarray(q_p[va])))

    best = (np.inf, None)
    for c in c_grid:
        models = [SVR(kernel="rbf", C=c, epsilon=epsilon, gamma=gamma)
                  .fit(xtr, q_s[tr][:, j]) for j in range(q_s.shape[1])]
        pred = np.stack([m.predict(xva) for m in models], axis=1)
        err = np.linalg.norm(pred - q_s[va]) / np.linalg.norm(q_s[va])
        if verbose:
            print(f"  svr C={c}: val err {err:.3e}")
        if err < best[0]:
            best = (err, models)
    models = best[1]

    gma = models[0]._gamma if hasattr(models[0], "_gamma") else \
        models[0].gamma
    # export to a jax closure: pad support sets to a common size
    svs = [m.support_vectors_ for m in models]
    duals = [m.dual_coef_[0] for m in models]
    bs = jnp.asarray([float(m.intercept_[0]) for m in models])
    n_max = max(s.shape[0] for s in svs)
    sv_pad = np.zeros((len(models), n_max, q_p.shape[1]))
    du_pad = np.zeros((len(models), n_max))
    for j, (s, d) in enumerate(zip(svs, duals)):
        sv_pad[j, :s.shape[0]] = s
        du_pad[j, :d.shape[0]] = d
    sv_pad = jnp.asarray(sv_pad)
    du_pad = jnp.asarray(du_pad)
    gma = jnp.asarray(float(gma))

    def predict(y):
        x = scaler.transform(y)
        d2 = jnp.sum((sv_pad - x[None, None, :]) ** 2, axis=-1)
        return jnp.sum(du_pad * jnp.exp(-gma * d2), axis=1) + bs

    jacobian = jax.jacfwd(predict)
    return Closure(predict=predict, jacobian=jacobian), \
        {"val_error": float(best[0]), "gamma": float(gma)}


def save_global_rbf(model: GlobalRBF, path: str) -> None:
    """Persist as an .npz with the same logical content as the reference's
    pod_rbf_global_model/{global_weights.pkl, scaler.pkl}."""
    np.savez(path,
             w_global=np.asarray(model.w_global),
             q_p_train=np.asarray(model.q_p_train),
             epsilon=model.epsilon, kernel=model.kernel,
             scaler_scale=np.asarray(model.scaler.scale_),
             scaler_min=np.asarray(model.scaler.min_))


def load_global_rbf(path: str) -> GlobalRBF:
    from finitedifference_tpu.closures.common import MinMaxScaler

    z = np.load(path, allow_pickle=True)
    return GlobalRBF(
        w_global=jnp.asarray(z["w_global"]),
        q_p_train=jnp.asarray(z["q_p_train"]),
        epsilon=float(z["epsilon"]), kernel=str(z["kernel"]),
        scaler=MinMaxScaler(scale_=jnp.asarray(z["scaler_scale"]),
                            min_=jnp.asarray(z["scaler_min"])),
    )
