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
