"""finitedifference_tpu — a TPU-native JAX framework for projection-based
reduced-order modeling of the 2D parameterized inviscid Burgers equations.

Re-designed from scratch for TPU (jax / XLA / pallas / pjit); capability
parity target is the SADPR/FiniteDifference research workbench
(reference: BurgersFD_Clean{Coarse,Fine,TestAE}).

Governing problem (reference hypernet2D.py:460-471):

    w_t + (0.5 w^2)_x = 0.02 exp(mu2 * x)   on (0,100)^2
    u(x=0, t) = mu1 (inflow BC),  w(x, t=0) = 1

Design stance (nothing here is a port):

* No sparse matrices anywhere. The reference's scipy.sparse upwind
  operators (hypernet2D.py:2410-2444) become shift-and-subtract stencils.
* The reference's per-step `spsolve` (hypernet2D.py:1854) is replaced by an
  exact anti-diagonal *wavefront* solve: the implicit Jacobian is block
  lower-triangular in cell-lexicographic order (upwind only couples west
  and south neighbors), so one `lax.scan` over 2N-1 diagonals with
  closed-form 2x2 block inverses solves it exactly.
* Time stepping is `lax.scan`; Newton / Gauss-Newton are `lax.while_loop`
  with the reference's stopping rules preserved bit-for-bit in logic.
* Parameter sweeps over (mu1, mu2) are `vmap`/`shard_map` over a device
  mesh; spatial sharding uses halo exchange over ICI.

Precision: the solvers are dtype-agnostic; run under JAX_ENABLE_X64 for
1e-8-level trajectory parity with the float64 NumPy reference.
"""

from finitedifference_tpu.config import BurgersConfig, DEFAULT_CONFIG
from finitedifference_tpu.grid import Grid2D, make_2d_grid

__version__ = "0.1.0"

__all__ = [
    "BurgersConfig",
    "DEFAULT_CONFIG",
    "Grid2D",
    "make_2d_grid",
    "__version__",
]
