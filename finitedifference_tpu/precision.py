"""Matmul-precision policy.

On TPU, f32 `@` lowers to MXU passes whose default accumulation is
bfloat16-based; for the small, cancellation-heavy products in the
closure decoders (e.g. the global-RBF Jacobian W^T @ dphi, whose terms
are O(1e4) but whose result is O(1e3)) that default produces errors up
to O(1) — measured 80% relative on the axon backend (round-1's
"closure-ROM wrong numerics in f32"; see scripts/bisect_axon_ops.py).
Every matmul on a closure/ROM numerical path therefore goes through
`hi_matmul`, which forces `Precision.HIGHEST` (true-f32 accumulation;
identical results on CPU, where the default is already exact f32).

The FOM stencil engine has no matmuls, so the fleet-wide cost of this
policy is a few extra MXU passes on tall-skinny GEMMs — noise next to
the HBM-bound stencils.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

HIGHEST = jax.lax.Precision.HIGHEST


def hi_matmul(a, b):
    """a @ b with true-f32 (HIGHEST) accumulation on TPU."""
    return jnp.matmul(a, b, precision=HIGHEST)
