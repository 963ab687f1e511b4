"""POD-ANN (RNM) closure training.

Role of the reference's train_reduced_manifold_autoencoder.py:86-219:
project snapshots onto a POD basis, split the coefficients into primary
q_p = q[:n_p] and secondary q_s = q[n_p:n_p+n_s], and regress q_p -> q_s
with the RNM_NN MLP (MSE, Adam, plateau LR schedule, patience early-stop,
best-checkpointing).

TPU-native: the whole epoch — shuffle, minibatch, grad steps — is one
jitted `lax.scan`; only the epoch loop and monitor live on the host.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from finitedifference_tpu.closures.ann import RNM_NN, init_rnm
from finitedifference_tpu.training.monitor import TrainingMonitor


def project_snapshots(basis, snaps_t, num_primary: int,
                      num_secondary: Optional[int] = None,
                      mu_labels=None):
    """q = basis^T snaps -> (q_p, q_s) training pairs.

    snaps_t: (n_samples, 2n) row-major samples. Optionally append the
    (mu1, mu2) labels to q_p (the `_mu_included` trainer variant,
    train_reduced_manifold_autoencoder_mu_included.py).
    """
    q = np.asarray(snaps_t) @ np.asarray(basis)   # (S, k)
    n_p = num_primary
    n_s = num_secondary if num_secondary is not None else q.shape[1] - n_p
    q_p = q[:, :n_p]
    q_s = q[:, n_p:n_p + n_s]
    if mu_labels is not None:
        q_p = np.hstack([q_p, np.asarray(mu_labels)])
    return q_p, q_s


@functools.partial(jax.jit, static_argnames=("module", "opt", "batch_size"))
def _train_epoch(module: RNM_NN, opt, params, opt_state, q_p, q_s, key,
                 batch_size: int):
    n = q_p.shape[0]
    num_batches = n // batch_size
    perm = jax.random.permutation(key, n)[: num_batches * batch_size]
    xb = q_p[perm].reshape(num_batches, batch_size, -1)
    yb = q_s[perm].reshape(num_batches, batch_size, -1)

    def loss_fn(p, x, y):
        pred = jax.vmap(lambda xi: module.apply(p, xi))(x)
        return jnp.mean((pred - y) ** 2)

    def step(carry, batch):
        p, s = carry
        x, y = batch
        loss, g = jax.value_and_grad(loss_fn)(p, x, y)
        updates, s = opt.update(g, s, p)
        return (optax.apply_updates(p, updates), s), loss

    (params, opt_state), losses = jax.lax.scan(
        step, (params, opt_state), (xb, yb))
    return params, opt_state, jnp.mean(losses)


@functools.partial(jax.jit, static_argnames=("module",))
def _eval_loss(module: RNM_NN, params, q_p, q_s):
    pred = jax.vmap(lambda xi: module.apply(params, xi))(q_p)
    return jnp.mean((pred - q_s) ** 2)


def train_rnm(q_p, q_s, *, epochs: int = 5000, lr: float = 1e-3,
              batch_size: int = 16, train_frac: float = 0.9,
              patience: int = 500, seed: int = 1234557,
              model_path: str = "rnm_model.msgpack",
              plateau_patience: int = 100, plateau_factor: float = 0.5,
              plateau_threshold: float = 1e-4, min_lr: float = 1e-7,
              train_dtype="float32", resume: bool = False,
              verbose: bool = False) -> Tuple[RNM_NN, dict, TrainingMonitor]:
    """Train the RNM closure network. Returns (module, params, monitor).

    Scheduling matches the reference exactly
    (train_reduced_manifold_autoencoder.py:191-207 + config: EPOCHS=5000,
    LR_INIT=1e-3, LR_PATIENCE=100, COMPLETION_PATIENCE=500, BATCH_SIZE=16):
    Adam with a ReduceLROnPlateau stepped ONCE PER EPOCH on the
    validation loss (torch semantics: relative improvement threshold
    1e-4, patience counted in epochs). An earlier revision chained
    optax.contrib.reduce_on_plateau into the per-minibatch update, which
    counts *batches* — at ~250 batches/epoch the LR collapsed hundreds
    of times faster than the reference's schedule and the net
    underfitted (round-1 RNM error 6.4-6.9% vs the <=3% target).

    resume: warm-start from an existing `model_path` checkpoint (the
    reference's TrainingMonitor resume path, train_utils.py:21-85):
    restore the best params + loss history and continue the epoch count
    from where the interrupted run stopped. Pass `lr` as the learning
    rate the dead run had reached (the plateau schedule is monotone, so
    this is recoverable from the sidecar's "lr ->" trace or the epoch
    count); optimizer moments restart from zero, which Adam re-estimates
    within ~tens of steps.
    """
    q_p = np.asarray(q_p)
    q_s = np.asarray(q_s)
    rng = np.random.default_rng(seed)
    perm = rng.permutation(q_p.shape[0])
    n_train = int(train_frac * q_p.shape[0])
    tr, va = perm[:n_train], perm[n_train:]
    # float32 training (the reference trains its torch nets in float32;
    # f64 MLP training on TPU is emulated and slow to compile/run)
    td = np.dtype(train_dtype)
    qp_tr, qs_tr = jnp.asarray(q_p[tr], td), jnp.asarray(q_s[tr], td)
    qp_va, qs_va = jnp.asarray(q_p[va], td), jnp.asarray(q_s[va], td)

    module, params = init_rnm(q_p.shape[1], q_s.shape[1],
                              key=jax.random.PRNGKey(seed),
                              dtype=qp_tr.dtype)
    # learning rate lives in opt_state.hyperparams so the host-side
    # epoch loop can anneal it without retracing _train_epoch
    monitor = TrainingMonitor(model_path, patience)
    start_epoch = 0
    if resume and os.path.exists(model_path):
        params = monitor.load_from_path(model_path, params)
        params = jax.tree_util.tree_map(lambda x: jnp.asarray(x, td),
                                        params)
        start_epoch = monitor.epoch
        if verbose:
            print(f"  resumed {model_path}: epoch {start_epoch}, "
                  f"best val {monitor.best_crit:.3e}, lr {lr:.2e}")
    opt = optax.inject_hyperparams(optax.adam)(learning_rate=lr)
    opt_state = opt.init(params)
    key = jax.random.PRNGKey(seed + 1)

    cur_lr = lr
    plateau_best = monitor.best_crit if start_epoch else np.inf
    plateau_stale = 0
    batch_size = min(batch_size, n_train)
    for epoch in range(start_epoch, epochs):
        key, sub = jax.random.split(key)
        params, opt_state, train_loss = _train_epoch(
            module, opt, params, opt_state, qp_tr, qs_tr, sub, batch_size)
        val_loss = float(_eval_loss(module, params, qp_va, qs_va)) \
            if va.size else float(train_loss)
        # torch ReduceLROnPlateau(mode='min', threshold_mode='rel')
        if val_loss < plateau_best * (1.0 - plateau_threshold):
            plateau_best = val_loss
            plateau_stale = 0
        else:
            plateau_stale += 1
            if plateau_stale > plateau_patience and cur_lr > min_lr:
                cur_lr = max(cur_lr * plateau_factor, min_lr)
                opt_state.hyperparams["learning_rate"] = jnp.asarray(
                    cur_lr, qp_tr.dtype)
                plateau_stale = 0
                if verbose:
                    print(f"  epoch {epoch}: lr -> {cur_lr:.2e}")
        if verbose and epoch % 50 == 0:
            print(f"  epoch {epoch}: train {float(train_loss):.3e} "
                  f"val {val_loss:.3e} lr {cur_lr:.2e}")
        if monitor.check_for_completion(float(train_loss), val_loss,
                                        params):
            break

    best = monitor.load_from_path(model_path, params)
    return module, best, monitor
