"""Phase timing: the reference's (jac_time, res_time, ls_time) contract.

The reference threads wall-clock accumulators through every Gauss-Newton
solver (hypernet2D.py:1879-1929) — impossible inside a fused jitted scan,
and undesirable: the fusion is where the speed comes from. Instead the
same per-phase numbers are produced by micro-benchmarking the three
jitted phase kernels standalone (`phase_breakdown`), preserving the
reporting contract without de-optimizing the hot path.
"""

from __future__ import annotations

import time
from typing import Callable, Dict

import numpy as np


class Timer:
    """Context-manager wall timer with a TPU-safe sync (fetches a small
    slice of `result` at exit, since axon's block_until_ready can return
    early)."""

    def __init__(self):
        self.elapsed = 0.0
        self._result = None

    def __enter__(self):
        self._t0 = time.time()
        return self

    def sync(self, result):
        self._result = result
        return result

    def __exit__(self, *exc):
        if self._result is not None and hasattr(self._result, "ravel"):
            # full materialization — slice fetches are lazy on this backend
            np.asarray(self._result)
        self.elapsed = time.time() - self._t0
        return False


def _time_fn(fn: Callable, args, reps: int) -> float:
    out = fn(*args)                     # compile + warm
    np.asarray(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(out)                     # full materialization = real sync
    return (time.time() - t0) / reps


def phase_breakdown(grid, basis, w, wp, mu1, mu2, dt, *,
                    weights=None, reps: int = 20) -> Dict[str, float]:
    """Per-GN-iteration phase times {res, jac(J@V), ls} in seconds.

    Mirrors the reference's per-phase printouts (e.g. run_HRNM_ecm.py:246)
    by timing each jitted phase kernel standalone.
    """
    import jax
    import jax.numpy as jnp

    from finitedifference_tpu.ops.stencil import (
        burgers_residual_flat,
        jacobian_times_basis,
    )
    from finitedifference_tpu.solvers import lstsq_qr

    basis = jnp.asarray(basis)
    w = jnp.asarray(w)
    wp = jnp.asarray(wp)

    res_fn = jax.jit(lambda a, b: burgers_residual_flat(
        a, b, mu1, mu2, dt, grid))
    jv_fn = jax.jit(lambda a: jacobian_times_basis(a, basis, dt, grid))
    f = res_fn(w, wp)
    jv = jv_fn(w)
    if weights is not None:
        wgt = jnp.asarray(weights)
        ls_fn = jax.jit(lambda a, b: lstsq_qr(wgt[:, None] * a, -wgt * b))
    else:
        ls_fn = jax.jit(lambda a, b: lstsq_qr(a, -b))

    return {
        "res_time": _time_fn(res_fn, (w, wp), reps),
        "jac_time": _time_fn(jv_fn, (w,), reps),
        "ls_time": _time_fn(ls_fn, (jv, f), reps),
    }
