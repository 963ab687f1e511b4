"""POD-ANN (RNM) closure: a small ELU MLP mapping q_p -> q_s.

Flax replacement of the reference's PyTorch RNM_NN (models.py:9-42:
q1 -> 32 -> 64 -> 128 -> 256 -> 256 -> q2 with ELU). The decoder Jacobian
is jax.jacfwd of the network — on-device, no framework boundary (the
reference crosses NumPy<->PyTorch twice per Gauss-Newton iteration via
functorch.jacfwd, hypernet2D.py:2121).
"""

from __future__ import annotations

import functools
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from finitedifference_tpu.closures.common import Closure


class RNM_NN(nn.Module):
    """ELU MLP with the reference architecture (models.py:13-27).

    Dense layers run at HIGHEST matmul precision: under jacfwd (the
    decoder Jacobian) and vmap the layer GEMVs become GEMMs, whose
    bf16-default accumulation on TPU is inaccurate (precision.py)."""
    q2_size: int
    hidden: Sequence[int] = (32, 64, 128, 256, 256)

    @nn.compact
    def __call__(self, x):
        import jax

        hi = jax.lax.Precision.HIGHEST
        for h in self.hidden:
            x = nn.elu(nn.Dense(h, precision=hi)(x))
        return nn.Dense(self.q2_size, precision=hi)(x)


def rnm_closure(module: RNM_NN, params) -> Closure:
    """Closure from a trained RNM network.

    The net runs in its own parameter dtype (float32 by default, like the
    reference's torch nets) regardless of the solver dtype: inputs are
    cast down, outputs cast back up, so an f64 Gauss-Newton never drags
    the MLP into emulated-f64 math on TPU.
    """
    net_dtype = jax.tree_util.tree_leaves(params)[0].dtype

    def predict(y):
        out = module.apply(params, y.astype(net_dtype))
        return out.astype(y.dtype)

    jacobian = jax.jacfwd(predict)
    return Closure(predict=predict, jacobian=jacobian)


def rnm_closure_with_mu(module: RNM_NN, params, mu) -> Closure:
    """RNM closure whose network input is [q_p; mu1; mu2] with mu fixed
    at ROM time — the `_mu_included` trainer variant
    (train_reduced_manifold_autoencoder_mu_included.py, paired with
    project_snapshots(mu_labels=...)). The Jacobian is w.r.t. q_p only
    (mu is a constant during the online solve)."""
    net_dtype = jax.tree_util.tree_leaves(params)[0].dtype
    mu_vec = jnp.asarray(mu, net_dtype)

    def predict(y):
        z = jnp.concatenate([y.astype(net_dtype), mu_vec])
        return module.apply(params, z).astype(y.dtype)

    return Closure(predict=predict, jacobian=jax.jacfwd(predict))


def init_rnm(q1_size: int, q2_size: int, key=None, dtype=jnp.float32):
    """Create module + initial params."""
    if key is None:
        key = jax.random.PRNGKey(0)
    module = RNM_NN(q2_size=q2_size)
    params = module.init(key, jnp.zeros(q1_size, dtype))
    return module, params
