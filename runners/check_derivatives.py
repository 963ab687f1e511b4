"""Derivative (gradient) checks: finite-difference vs analytic closure
Jacobians with the classic error-vs-epsilon slope (role of the
reference's check_derivative_dynamic*.py and
check_rbf_derivatives_vs_finite_difference.py).

For each closure the FD error || (f(y+h d) - f(y))/h - J d || should
decay with slope ~1 in h (slope ~2 for central differences) until
roundoff; a flat curve means a wrong Jacobian.
"""

import argparse

import numpy as np

from common import setup_jax


def slope_check(predict, jacobian, y, seed=0, hs=None, central=True):
    import jax.numpy as jnp

    if hs is None:
        hs = np.logspace(-1, -7, 13)
    rng = np.random.default_rng(seed)
    d = rng.normal(size=y.shape[0])
    d /= np.linalg.norm(d)
    dj = jnp.asarray(d)
    jac_d = np.asarray(jacobian(y) @ dj)
    errs = []
    for h in hs:
        if central:
            fd = (np.asarray(predict(y + h * dj))
                  - np.asarray(predict(y - h * dj))) / (2 * h)
        else:
            fd = (np.asarray(predict(y + h * dj))
                  - np.asarray(predict(y))) / h
        errs.append(np.linalg.norm(fd - jac_d))
    errs = np.asarray(errs)
    # fitted slope over the decaying region (skip roundoff tail)
    k = max(3, int(len(hs) * 0.5))
    slope = np.polyfit(np.log(hs[:k]), np.log(errs[:k] + 1e-300), 1)[0]
    return hs, errs, slope


def main(kernel="gaussian", seed=0, verbose=True):
    setup_jax()
    import jax.numpy as jnp

    from finitedifference_tpu.closures.ann import init_rnm, rnm_closure
    from finitedifference_tpu.closures.gp import fit_gp, gp_closure
    from finitedifference_tpu.closures.rbf import (
        KERNELS,
        fit_global_rbf,
        fit_knn_rbf,
        global_rbf_closure,
        knn_rbf_closure,
    )

    rng = np.random.default_rng(seed)
    q_p = rng.uniform(-1, 1, size=(80, 4))
    a = rng.normal(size=(4, 6))
    q_s = np.sin(q_p @ a)
    y = jnp.asarray(q_p[7] + 0.013)

    results = {}
    for name, closure, floor in [
        (f"rbf_global_{kernel}",
         global_rbf_closure(fit_global_rbf(q_p, q_s, 0.8, kernel=kernel)),
         1e-9),
        (f"rbf_knn_{kernel}",
         knn_rbf_closure(fit_knn_rbf(q_p, q_s, 0.8, 16, kernel=kernel)),
         1e-9),
        ("gp", gp_closure(fit_gp(q_p, q_s, num_steps=100)), 1e-9),
        # the RNM net computes in float32 (reference torch default), so
        # central differences floor near sqrt-ish of f32 eps
        ("rnm", rnm_closure(*init_rnm(4, 6)), 1e-3),
    ]:
        hs, errs, slope = slope_check(closure.predict, closure.jacobian, y)
        ok = slope > 1.5 or errs.min() < floor
        results[name] = (slope, errs.min(), ok)
        if verbose:
            print(f"{name:24s} slope={slope:5.2f} "
                  f"min err={errs.min():.2e}  "
                  f"{'OK' if ok else 'SUSPECT'}")
    return results


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--kernel", default="gaussian")
    p.add_argument("--seed", type=int, default=0)
    main(p.parse_args().kernel, p.parse_args().seed)
