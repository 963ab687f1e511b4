"""POD basis construction: exact SVD, randomized SVD (Halko), and an
adaptive error-controlled variant.

Replaces the reference's POD/podsize (hypernet2D.py:2670-2717, thin
wrappers over np.linalg.svd / sklearn randomized_svd) and the standalone
adaptive Halko implementation (randomized_singular_value_decomposition.py).
Here the randomized range finder is jitted JAX: the big matmuls
(A @ Omega, Q^T A) land on the MXU and the QR/SVD run on the small side.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("num_modes", "n_oversamples",
                                             "n_iter"))
def randomized_svd(a, num_modes: int, key=None, n_oversamples: int = 10,
                   n_iter: int = 7):
    """Halko randomized truncated SVD of `a` (m, n) -> (U, s, Vh).

    Power iteration with QR re-orthonormalization each step (the stable
    choice — equivalent role to sklearn's power_iteration_normalizer).
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    m, n = a.shape
    k = min(num_modes + n_oversamples, min(m, n))
    omega = jax.random.normal(key, (n, k), dtype=a.dtype)
    y = a @ omega
    q, _ = jnp.linalg.qr(y)
    for _ in range(n_iter):
        z, _ = jnp.linalg.qr(a.T @ q)
        q, _ = jnp.linalg.qr(a @ z)
    b = q.T @ a                      # (k, n)
    ub, s, vh = jnp.linalg.svd(b, full_matrices=False)
    u = q @ ub
    return u[:, :num_modes], s[:num_modes], vh[:num_modes, :]


def pod(snaps, num_modes: Optional[int] = None, method: str = "svd",
        random_state: Optional[int] = None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """POD modes of a snapshot matrix (reference POD, hypernet2D.py:2670).

    Returns (U, s). method 'svd' = exact thin SVD; 'rsvd' = randomized.
    """
    snaps = jnp.asarray(snaps)
    if method == "svd":
        u, s, _ = jnp.linalg.svd(snaps, full_matrices=False)
        if num_modes is not None:
            return u[:, :num_modes], s[:num_modes]
        return u, s
    if method == "rsvd":
        if num_modes is None:
            num_modes = min(snaps.shape)
        key = jax.random.PRNGKey(0 if random_state is None else random_state)
        u, s, _ = randomized_svd(snaps, num_modes, key=key)
        return u, s
    raise ValueError(f"Unknown POD method {method!r}; use 'svd' or 'rsvd'.")


def podsize(svals, energy_thresh: Optional[float] = None,
            min_size: Optional[int] = None,
            max_size: Optional[int] = None) -> int:
    """Basis size meeting an energy threshold and/or size bounds
    (reference podsize, hypernet2D.py:2695-2717)."""
    if energy_thresh is None and min_size is None and max_size is None:
        raise ValueError("Must specify at least one truncation criterion")
    svals = np.asarray(svals)
    if energy_thresh is not None:
        energies = np.cumsum(np.square(svals)) / np.square(svals).sum()
        hits = np.nonzero(energies >= energy_thresh)[0]
        # never-reached threshold (e.g. energy_thresh=1.0 with roundoff):
        # use every mode instead of argmax's silent 0 (the reference's
        # np.where(...)[0][0] raises IndexError here)
        numvecs = int(hits[0]) if hits.size else len(svals)
    else:
        numvecs = int(min_size)
    if min_size is not None:
        numvecs = max(numvecs, int(min_size))
    if max_size is not None:
        numvecs = min(numvecs, int(max_size))
    return numvecs


def randomized_svd_adaptive(a, tol: float = 1e-8, key=None,
                            initial_rank: int = 32,
                            max_rank: Optional[int] = None):
    """Error-controlled randomized SVD.

    Doubles the sketch rank until the range-capture residual
    ||A - QQ^T A||_F / ||A||_F <= tol, then SVDs the small projection and
    truncates singular values below tol * s_max. Same role as the
    reference's adaptive Halko class
    (randomized_singular_value_decomposition.py:36-220), used to compress
    the ECM residual basis; the rank search is a host loop around jitted
    device kernels (offline stage).
    """
    a = jnp.asarray(a)
    m, n = a.shape
    if key is None:
        key = jax.random.PRNGKey(0)
    max_rank = min(m, n) if max_rank is None else min(max_rank, min(m, n))
    norm_a = float(jnp.linalg.norm(a))
    if norm_a == 0.0:
        z = jnp.zeros
        return z((m, 0), a.dtype), z((0,), a.dtype), z((0, n), a.dtype)

    rank = min(initial_rank, max_rank)
    while True:
        key, sub = jax.random.split(key)
        u, s, vh = randomized_svd(a, rank, key=sub, n_iter=4)
        # captured energy check via the residual of the projection
        resid = float(jnp.linalg.norm(a - (u * s) @ vh))
        if resid / norm_a <= tol or rank >= max_rank:
            break
        rank = min(2 * rank, max_rank)
    keep = int(np.sum(np.asarray(s) > tol * float(s[0]))) if s.size else 0
    keep = max(keep, 1)
    return u[:, :keep], s[:keep], vh[:keep, :]


def split_basis(u, num_primary: int, num_secondary: Optional[int] = None):
    """Split POD modes into primary/secondary blocks (U_p, U_s).

    The reference's manifold closures all use w ≈ ref + U_p q_p + U_s q_s
    with U_p = U[:, :n_p], U_s = U[:, n_p:n_p+n_s]
    (e.g. train_reduced_manifold_autoencoder.py:163-170).
    """
    u_p = u[:, :num_primary]
    if num_secondary is None:
        u_s = u[:, num_primary:]
    else:
        u_s = u[:, num_primary:num_primary + num_secondary]
    return u_p, u_s
