"""Shared closure plumbing: scaler, closure protocol, manifold decoder."""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax.numpy as jnp
import numpy as np


class MinMaxScaler(NamedTuple):
    """sklearn-compatible MinMaxScaler state (reference pipelines fit
    MinMaxScaler(feature_range=(-1, 1)) on q_p —
    POD-RBF_global/compute_global_weights_grid_search_with_kernels.py).
    transform(x) = x * scale_ + min_."""
    scale_: jnp.ndarray   # (dim,)
    min_: jnp.ndarray     # (dim,)

    def transform(self, x):
        return x * self.scale_ + self.min_

    def inverse_transform(self, x):
        return (x - self.min_) / self.scale_


def identity_scaler(dim: int) -> MinMaxScaler:
    """No-op scaler — the reference's `_no_norm` RBF variants
    (rbf_utils.py:732-1661) are this plus the standard code paths."""
    return MinMaxScaler(scale_=jnp.ones(dim), min_=jnp.zeros(dim))


def fit_minmax(data, feature_range=(-1.0, 1.0)) -> MinMaxScaler:
    """Fit a MinMaxScaler on rows of `data` (n_samples, dim)."""
    data = np.asarray(data)
    dmin = data.min(axis=0)
    dmax = data.max(axis=0)
    span = np.where(dmax - dmin == 0, 1.0, dmax - dmin)
    fmin, fmax = feature_range
    scale = (fmax - fmin) / span
    minv = fmin - dmin * scale
    return MinMaxScaler(scale_=jnp.asarray(scale), min_=jnp.asarray(minv))


def run_on_host_cpu(fn, *args, **kwargs):
    """Run an offline fit on the host CPU backend and return
    device-neutral arrays.

    Small dense f64 linear algebra (kernel-matrix SVDs, GP Cholesky
    factorizations) is emulated and extremely slow on TPU; these fits are
    offline, so they belong on the host. Outputs are detached from the
    CPU device so downstream jitted TPU code can consume them freely.
    """
    import jax

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        out = fn(*args, **kwargs)

    def detach(x):
        if isinstance(x, jax.Array):
            return jnp.asarray(np.asarray(x))
        return x

    return jax.tree_util.tree_map(detach, out)


class Closure(NamedTuple):
    """q_p -> q_s map with an explicit Jacobian.

    predict:  (n_p,) -> (n_s,)
    jacobian: (n_p,) -> (n_s, n_p)
    predict_and_jacobian: optional fused (n_p,) -> ((n_s,), (n_s, n_p)).
        Kernel closures share expensive per-query work (neighbor search,
        local kernel solves, kernel-distance evaluations) between the
        value and the Jacobian; the Gauss-Newton body evaluates both at
        the same y every iteration, so the fused form halves the closure
        cost online. When None, callers fall back to the separate calls.
    """
    predict: Callable
    jacobian: Callable
    predict_and_jacobian: Optional[Callable] = None


def manifold_decoder(basis, basis2, closure: Optional[Closure],
                     ref=None):
    """Build (decode, dec_jac) for w(y) = ref + U_p y + U_s closure(y).

    With closure=None this degenerates to the linear decoder. `ref` is an
    optional reference-state offset (the snapshot-centering vector some
    reference training pipelines subtract, train_utils.py:120-127).
    """
    from finitedifference_tpu.precision import hi_matmul

    basis = jnp.asarray(basis)
    basis2 = jnp.asarray(basis2) if basis2 is not None else None
    ref = jnp.asarray(ref) if ref is not None else None

    # all matmuls at HIGHEST precision: dec_jac's U_s @ J_closure is a
    # true GEMM whose bf16-default accumulation on TPU corrupts the
    # Gauss-Newton direction (see finitedifference_tpu/precision.py)
    def decode(y):
        w = hi_matmul(basis, y)
        if closure is not None:
            w = w + hi_matmul(basis2, closure.predict(y))
        if ref is not None:
            w = w + ref
        return w

    def dec_jac(y, w=None):
        if closure is None:
            return basis
        return basis + hi_matmul(basis2, closure.jacobian(y))

    return decode, dec_jac


def manifold_decoder_fused(basis, basis2, closure: Optional[Closure],
                           ref=None):
    """Fused `decode_and_jac(y) -> (w, V)` companion to manifold_decoder.

    Uses `closure.predict_and_jacobian` when the closure provides it
    (one neighbor search / local kernel solve instead of two per
    Gauss-Newton iteration); otherwise falls back to the separate calls,
    which is still one decoder-basis matmul cheaper than calling
    (decode, dec_jac) independently.
    """
    from finitedifference_tpu.precision import hi_matmul

    basis = jnp.asarray(basis)
    basis2 = jnp.asarray(basis2) if basis2 is not None else None
    ref = jnp.asarray(ref) if ref is not None else None

    def decode_and_jac(y):
        if closure is None:
            w = hi_matmul(basis, y)
            if ref is not None:
                w = w + ref
            return w, basis
        if closure.predict_and_jacobian is not None:
            q_s, j_s = closure.predict_and_jacobian(y)
        else:
            q_s, j_s = closure.predict(y), closure.jacobian(y)
        w = hi_matmul(basis, y) + hi_matmul(basis2, q_s)
        if ref is not None:
            w = w + ref
        v = basis + hi_matmul(basis2, j_s)
        return w, v

    return decode_and_jac
