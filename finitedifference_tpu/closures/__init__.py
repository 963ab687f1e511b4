"""Nonlinear closure models for manifold ROMs.

Every closure maps primary reduced coordinates q_p to secondary
coordinates q_s, giving the decoder

    w(y) = U_p @ y + U_s @ closure(y)

(the reference's POD-ANN / POD-RBF / POD-GP family). A closure is a pair
of callables (predict, jacobian); `manifold_decoder` composes them with
the POD blocks into the (decode, dec_jac) pair that solvers.gauss_newton
consumes.
"""

from finitedifference_tpu.closures.common import (
    Closure,
    MinMaxScaler,
    fit_minmax,
    manifold_decoder,
    manifold_decoder_fused,
)

__all__ = ["Closure", "MinMaxScaler", "fit_minmax", "manifold_decoder",
           "manifold_decoder_fused"]
