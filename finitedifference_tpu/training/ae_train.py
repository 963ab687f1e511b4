"""Full-autoencoder training (role of the reference TestAE trainer,
BurgersFD_CleanTestAE/AE/train_autoencoder.py:95-174: standardize inputs,
MSE Adam, 90/10 split, best-checkpoint on validation loss). The MSE is
computed on the *unscaled* reconstruction, matching the reference's
forward pass through scale_out."""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from finitedifference_tpu.closures.autoencoder import (
    ScaledAE,
    init_autoencoder,
)
from finitedifference_tpu.training.monitor import TrainingMonitor


def _forward(module, params, x, mu, sig):
    xs = (x - mu) / sig
    recon = module.apply(params, xs)
    return recon * sig + mu


@functools.partial(jax.jit, static_argnames=("module", "opt", "batch_size"))
def _train_epoch(module, opt, params, opt_state, x, mu, sig, key,
                 batch_size: int):
    n = x.shape[0]
    num_batches = max(n // batch_size, 1)
    perm = jax.random.permutation(key, n)[: num_batches * batch_size]
    xb = x[perm].reshape(num_batches, batch_size, -1)

    def loss_fn(p, batch):
        recon = jax.vmap(lambda xi: _forward(module, p, xi, mu, sig))(batch)
        return jnp.mean((recon - batch) ** 2)

    def step(carry, batch):
        p, s = carry
        loss, g = jax.value_and_grad(loss_fn)(p, batch)
        updates, s = opt.update(g, s, p)
        return (optax.apply_updates(p, updates), s), loss

    (params, opt_state), losses = jax.lax.scan(step, (params, opt_state), xb)
    return params, opt_state, jnp.mean(losses)


@functools.partial(jax.jit, static_argnames=("module",))
def _eval_loss(module, params, x, mu, sig):
    recon = jax.vmap(lambda xi: _forward(module, params, xi, mu, sig))(x)
    return jnp.mean((recon - x) ** 2)


def train_autoencoder(snaps_t, latent_dim: int, *, epochs: int = 500,
                      lr: float = 1e-3, batch_size: int = 16,
                      train_frac: float = 0.9, patience: int = 50,
                      seed: int = 1234557,
                      model_path: str = "autoencoder.msgpack",
                      train_dtype="float32",
                      verbose: bool = False
                      ) -> Tuple[ScaledAE, TrainingMonitor]:
    """snaps_t: (n_samples, dim) rows. Returns (ScaledAE, monitor)."""
    snaps_t = np.asarray(snaps_t, dtype=np.dtype(train_dtype))
    mu = jnp.asarray(snaps_t.mean(axis=0))
    sig = jnp.asarray(snaps_t.std(axis=0) + 1e-10)

    rng = np.random.default_rng(seed)
    perm = rng.permutation(snaps_t.shape[0])
    n_train = int(train_frac * snaps_t.shape[0])
    x_tr = jnp.asarray(snaps_t[perm[:n_train]])
    x_va = jnp.asarray(snaps_t[perm[n_train:]])

    module, params = init_autoencoder(snaps_t.shape[1], latent_dim,
                                      key=jax.random.PRNGKey(seed),
                                      dtype=x_tr.dtype)
    opt = optax.adam(lr)
    opt_state = opt.init(params)
    monitor = TrainingMonitor(model_path, patience)
    key = jax.random.PRNGKey(seed + 1)
    batch_size = min(batch_size, n_train)

    for epoch in range(epochs):
        key, sub = jax.random.split(key)
        params, opt_state, train_loss = _train_epoch(
            module, opt, params, opt_state, x_tr, mu, sig, sub, batch_size)
        val_loss = _eval_loss(module, params, x_va, mu, sig) \
            if x_va.shape[0] else train_loss
        if verbose and epoch % 20 == 0:
            print(f"  epoch {epoch}: train {float(train_loss):.3e} "
                  f"val {float(val_loss):.3e}")
        if monitor.check_for_completion(float(train_loss), float(val_loss),
                                        params):
            break

    best = monitor.load_from_path(model_path, params)
    return ScaledAE(module=module, params=best, mu_in=mu, sig_in=sig), \
        monitor
