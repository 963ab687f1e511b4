"""AE-LSPG ROM: full nonlinear autoencoder manifold (reference TestAE
run_ae_prom.py: train ScaledAutoencoder on snapshots, LSPG over the
decoder with jacfwd decoder Jacobians)."""

import os
import time

import numpy as np

from common import base_parser, default_config, make_problem, report, \
    setup_jax, sync

MODEL_PATH = "ae_model.msgpack"


def main(mu1=4.75, mu2=0.02, latent_dim=10, epochs=300, retrain=False,
         num_cells=None, num_steps=None, f32=False):
    setup_jax(f32)
    import jax
    import jax.numpy as jnp

    from finitedifference_tpu.closures.autoencoder import (
        ScaledAE,
        ae_decoder_fns,
        init_autoencoder,
    )
    from finitedifference_tpu.rom import manifold_rom
    from finitedifference_tpu.snapshots import (
        collect_snapshots,
        load_or_compute_snaps,
    )
    from finitedifference_tpu.training.ae_train import train_autoencoder
    from finitedifference_tpu.training.monitor import load_checkpoint

    cfg = default_config(num_cells, num_steps)
    grid, w0 = make_problem(cfg)

    # per-resolution model file: a 20^2-input AE must never shadow the
    # 50^2 one on the shared filename protocol
    model_path = MODEL_PATH if cfg.num_cells_x == 250 else \
        MODEL_PATH.replace(".msgpack",
                           f"_{cfg.num_cells_x}x{cfg.num_cells_y}.msgpack")

    snaps = collect_snapshots(cfg.mu_samples(), grid, w0, cfg.dt,
                              cfg.num_steps, snap_folder=cfg.snap_folder)
    if retrain or not os.path.exists(model_path):
        ae, _ = train_autoencoder(snaps.T, latent_dim, epochs=epochs,
                                  batch_size=cfg.batch_size,
                                  train_frac=cfg.train_frac,
                                  patience=50, seed=cfg.seed,
                                  model_path=model_path, verbose=True)
    else:
        mu_in = jnp.asarray(snaps.T.mean(axis=0))
        sig_in = jnp.asarray(snaps.T.std(axis=0) + 1e-10)
        module, params0 = init_autoencoder(snaps.shape[0], latent_dim,
                                           dtype=mu_in.dtype)
        params = load_checkpoint(model_path, params0)
        ae = ScaledAE(module=module, params=params, mu_in=mu_in,
                      sig_in=sig_in)

    decode, dec_jac, encode = ae_decoder_fns(ae)
    z0 = encode(jnp.asarray(w0, ae.mu_in.dtype))

    t0 = time.time()
    # truncated-SVD LS + backtracking: the AE decoder Jacobian can be
    # numerically rank-deficient and the full GN step can leave the
    # decoder's training region (solvers.lstsq_svd docstring)
    res = manifold_rom(grid, z0, decode, dec_jac, cfg.dt, cfg.num_steps,
                       mu1, mu2, ls_method="svd", line_search=True)
    rom_snaps = sync(jax.vmap(decode, in_axes=1,
                              out_axes=1)(res.red_coords))
    elapsed = time.time() - t0
    print(f"Total GN iterations: {int(res.total_gn_its)}")

    hdm = load_or_compute_snaps([mu1, mu2], grid, w0, cfg.dt,
                                cfg.num_steps, snap_folder=cfg.snap_folder)
    return report("AE-PROM", rom_snaps, hdm, elapsed, (mu1, mu2),
                  save_prefix="ae_prom")


if __name__ == "__main__":
    p = base_parser(__doc__)
    p.add_argument("--latent-dim", type=int, default=10)
    p.add_argument("--epochs", type=int, default=300)
    p.add_argument("--retrain", action="store_true")
    a = p.parse_args()
    main(a.mu1, a.mu2, a.latent_dim, a.epochs, a.retrain, a.num_cells,
         a.num_steps, a.f32)
