"""NumPy Gauss-Newton LSPG oracle (clean-room, from the GN contract in
SURVEY.md §2.2: max 20 its, rel cutoff 1e-5, stagnation min_delta 0.1,
check-before-update)."""

import numpy as np

import oracle


def gauss_newton_lspg(res, jac, basis, y0, weights=None, max_its=20,
                      cutoff=1e-5, min_delta=0.1):
    y = y0.copy()
    w = basis @ y
    def wres(w_):
        f = res(w_)
        return f * weights if weights is not None else f
    init = np.linalg.norm(wres(w))
    rns = []
    its = 0
    for _ in range(max_its):
        rn = np.linalg.norm(wres(w))
        rns.append(rn)
        if rn / init < cutoff:
            break
        if len(rns) > 1 and abs(rns[-2] - rns[-1]) / rns[-2] < min_delta:
            break
        jv = jac(w) @ basis
        f = wres(w)
        if weights is not None:
            jv = weights[:, None] * jv
        dy = np.linalg.lstsq(jv, -f, rcond=None)[0]
        y = y + dy
        w = basis @ y
        its += 1
    return y, its


def lspg_trajectory(w0, mu, dt, num_steps, ops, xc, basis):
    y0 = basis.T @ w0
    red = np.zeros((basis.shape[1], num_steps + 1))
    red[:, 0] = y0
    wp = basis @ y0
    yp = y0.copy()
    total_its = 0
    for i in range(num_steps):
        res = lambda w_: oracle.residual(w_, wp, mu, dt, ops, xc)
        jac = lambda w_: oracle.jacobian(w_, dt, ops)
        y, its = gauss_newton_lspg(res, jac, basis, yp)
        total_its += its
        red[:, i + 1] = y
        wp = basis @ y
        yp = y
    return red, total_its
