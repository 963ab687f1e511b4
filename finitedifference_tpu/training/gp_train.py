"""GP closure training (role of the reference's POD-GP trainers,
POD-GP/train_gp.py:67-74 and compute_gp_models*.py): fit a Matérn-3/2 GP
from scaled q_p to q_s, persist, reload."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from finitedifference_tpu.closures.common import MinMaxScaler, fit_minmax
from finitedifference_tpu.closures.gp import (
    GPModel,
    PerModeGPModel,
    fit_gp,
    fit_gp_full_per_mode,
    fit_gp_per_mode,
    fit_gp_variational,
)
from finitedifference_tpu.training.rbf_train import remove_duplicates


def train_gp(q_p, q_s, *, noise: float = 1e-8, num_steps: int = 300,
             dedup: bool = True, ard: bool = True, nu: float = 1.5,
             per_mode: str = "none", num_inducing: int = 64,
             on_host: bool = True, verbose: bool = False):
    """ard=True (default) learns per-dimension length scales — the
    shipped 250^2 model is ARD, and ARD closed the GP-HPROM from 8.6%
    to 2.4% at (5.19, 0.026) in round 2; isotropic remains reachable
    for the reference's exact sklearn recipe (POD-GP/train_gp.py:67-74).

    per_mode selects the output-mode treatment (reference per-mode GPs:
    POD-GP/compute_gp_models.py):
      none   — one shared kernel + (amp, noise) for all outputs;
      scales — shared ARD length scales, per-mode exact (amp, noise)
               in the kernel eigenbasis (returns an ordinary GPModel);
      full   — fully independent per-mode ARD GPs (PerModeGPModel);
      variational — sparse variational GP with `num_inducing` learned
               inducing points (the reference's GPyTorch SVGP option,
               POD-GP/compute_gp_models_pytorch.py:259-321, as the
               collapsed Titsias bound — see fit_gp_variational)."""
    if on_host:
        from finitedifference_tpu.closures.common import run_on_host_cpu
        return run_on_host_cpu(
            train_gp, q_p, q_s, noise=noise, num_steps=num_steps,
            dedup=dedup, ard=ard, nu=nu, per_mode=per_mode,
            num_inducing=num_inducing, on_host=False,
            verbose=verbose)
    q_p = np.asarray(q_p)
    q_s = np.asarray(q_s)
    if dedup:
        q_p, q_s = remove_duplicates(q_p, q_s)
    if per_mode == "variational":
        model = fit_gp_variational(q_p, q_s, noise=noise,
                                   num_inducing=num_inducing,
                                   num_steps=num_steps, nu=nu)
    elif per_mode == "full":
        model = fit_gp_full_per_mode(q_p, q_s, noise=noise,
                                     num_steps=num_steps, nu=nu)
    elif per_mode == "scales":
        model = fit_gp_per_mode(q_p, q_s, noise=noise,
                                num_steps=num_steps, ard=ard, nu=nu)
    else:
        model = fit_gp(q_p, q_s, noise=noise, num_steps=num_steps,
                       ard=ard, nu=nu)
    if verbose:
        print(f"  gp: amplitude={np.round(np.asarray(model.amplitude), 4)} "
              f"length_scale={np.round(np.asarray(model.length_scale), 4)}")
    return model


def save_gp(model, path: str) -> None:
    np.savez(path,
             x_train=np.asarray(model.x_train),
             alpha=np.asarray(model.alpha),
             length_scale=np.asarray(model.length_scale),
             amplitude=np.asarray(model.amplitude),
             noise=model.noise, nu=model.nu,
             per_mode=isinstance(model, PerModeGPModel),
             scaler_scale=np.asarray(model.scaler.scale_),
             scaler_min=np.asarray(model.scaler.min_))


def load_gp(path: str):
    z = np.load(path)
    cls = PerModeGPModel if ("per_mode" in z.files and bool(z["per_mode"])) \
        else GPModel
    return cls(
        x_train=jnp.asarray(z["x_train"]),
        alpha=jnp.asarray(z["alpha"]),
        length_scale=jnp.asarray(z["length_scale"]),
        amplitude=jnp.asarray(z["amplitude"]),
        noise=float(z["noise"]),
        nu=float(z["nu"]) if "nu" in z.files else 1.5,
        scaler=MinMaxScaler(scale_=jnp.asarray(z["scaler_scale"]),
                            min_=jnp.asarray(z["scaler_min"])),
    )
