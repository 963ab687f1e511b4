"""Independent NumPy/SciPy oracle for the 2D Burgers HDM.

A clean-room sparse-matrix implementation of the governing discretization
(derived from the math in SURVEY.md §2.1), used to validate the matrix-free
JAX implementation. Deliberately built the "textbook" way — explicit
Kronecker-product operators and scipy spsolve — so that agreement with the
stencil/wavefront code is a meaningful cross-check, and so that the JAX
build's trajectories are transitively validated against the reference's
NumPy/SciPy pipeline (same equations, same solvers).

Layout: scalar fields are (ny, nx), flattened x-fastest (C order);
w = [u.ravel(); v.ravel()].
"""

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla


def upwind_1d(n, d):
    """(D f)_i = (f_i - f_{i-1})/d with zero ghost at i=-1."""
    return sp.diags(
        [np.full(n, 1.0 / d), np.full(n - 1, -1.0 / d)], [0, -1], format="csr"
    )


class Ops:
    def __init__(self, nx, ny, dx, dy):
        self.nx, self.ny, self.dx, self.dy = nx, ny, dx, dy
        # x-fastest flattening: index = r*nx + c  =>  kron(row-op, col-op)
        self.Dx = sp.kron(sp.eye(ny), upwind_1d(nx, dx), format="csr")
        self.Dy = sp.kron(upwind_1d(ny, dy), sp.eye(nx), format="csr")
        self.I2 = sp.eye(2 * nx * ny, format="csr")


def source_lbc(ops, mu, dt, xc):
    src = np.tile(dt * 0.02 * np.exp(mu[1] * xc), ops.ny)
    lbc2d = np.zeros((ops.ny, ops.nx))
    lbc2d[:, 0] = 0.5 * dt * mu[0] ** 2 / ops.dx
    return src, lbc2d.ravel()


def residual(w, wp, mu, dt, ops, xc):
    u, v = np.split(w, 2)
    up, vp = np.split(wp, 2)
    fu = 0.5 * (u * u + up * up)
    fv = 0.5 * (v * v + vp * vp)
    fuv = 0.5 * (u * v + up * vp)
    src, lbc = source_lbc(ops, mu, dt, xc)
    ru = u - up + 0.5 * dt * (ops.Dx @ fu + ops.Dy @ fuv) - src - lbc
    rv = v - vp + 0.5 * dt * (ops.Dy @ fv + ops.Dx @ fuv)
    return np.concatenate((ru, rv))


def jacobian(w, dt, ops):
    u, v = np.split(w, 2)
    du = sp.diags(u)
    dv = sp.diags(v)
    ul = 0.5 * dt * ops.Dx @ du + 0.25 * dt * ops.Dy @ dv
    ur = 0.25 * dt * ops.Dy @ du
    ll = 0.25 * dt * ops.Dx @ dv
    lr = 0.5 * dt * ops.Dy @ dv + 0.25 * dt * ops.Dx @ du
    return (sp.bmat([[ul, ur], [ll, lr]]) + ops.I2).tocsr()


def newton(wp, mu, dt, ops, xc, max_its=100, tol=1e-12):
    w = wp.copy()
    init = np.linalg.norm(residual(wp, wp, mu, dt, ops, xc))
    its = 0
    for _ in range(max_its):
        f = residual(w, wp, mu, dt, ops, xc)
        if np.linalg.norm(f) / init < tol:
            break
        w = w - spla.spsolve(jacobian(w, dt, ops), f)
        its += 1
    return w, its


def implicit_trajectory(w0, mu, dt, num_steps, ops, xc):
    snaps = np.zeros((w0.size, num_steps + 1))
    snaps[:, 0] = w0
    wp = w0.copy()
    for i in range(num_steps):
        w, _ = newton(wp, mu, dt, ops, xc)
        snaps[:, i + 1] = w
        wp = w
    return snaps


def explicit_trajectory(w0, mu, dt, num_steps, ops, xc):
    snaps = np.zeros((w0.size, num_steps + 1))
    snaps[:, 0] = w0
    wp = w0.copy()
    lbc2d = np.zeros((ops.ny, ops.nx))
    lbc2d[:, 0] = 0.5 * mu[0] ** 2 / ops.dx
    lbc = lbc2d.ravel()
    src = np.tile(0.02 * np.exp(mu[1] * xc), ops.ny)
    for i in range(num_steps):
        u, v = np.split(wp, 2)
        fu, fv, fuv = 0.5 * u * u, 0.5 * v * v, 0.5 * u * v
        un = u - dt * (ops.Dx @ fu - lbc) + dt * src - dt * (ops.Dy @ fuv)
        vn = v - dt * (ops.Dy @ fv) - dt * (ops.Dx @ fuv)
        wp = np.concatenate((un, vn))
        snaps[:, i + 1] = wp
    return snaps


def make_problem(nx=8, ny=6, lx=100.0, ly=100.0):
    dx, dy = lx / nx, ly / ny
    gx = np.linspace(0, lx, nx + 1)
    xc = 0.5 * (gx[1:] + gx[:-1])
    return Ops(nx, ny, dx, dy), xc
