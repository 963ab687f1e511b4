"""POD-ANN (RNM) manifold PROM, no hyper-reduction (reference run_RNM.py):
w = U_p q + U_s N(q), N trained by training/rnm_train."""

import os

from common import base_parser, default_config, make_problem, \
    run_manifold, setup_jax, split_training

MODEL_PATH = "rnm_model.msgpack"


def get_rnm_closure(cfg, grid, w0, num_primary, num_secondary,
                    model_path=None, epochs=5000, retrain=False):
    import jax.numpy as jnp

    from finitedifference_tpu.closures.ann import init_rnm, rnm_closure
    from finitedifference_tpu.training.monitor import load_checkpoint
    from finitedifference_tpu.training.rnm_train import train_rnm

    from common import res_path

    if model_path is None:
        model_path = res_path(cfg, MODEL_PATH)
    # the MLP regression is cheap (unlike cubic-cost kernel fits):
    # use all projected pairs
    u_p, u_s, q_p, q_s = split_training(cfg, grid, w0,
                                        num_primary + num_secondary,
                                        num_primary, num_secondary,
                                        max_pairs=0)
    if retrain or not os.path.exists(model_path):
        module, params, _ = train_rnm(
            q_p, q_s, epochs=epochs, batch_size=cfg.batch_size,
            train_frac=cfg.train_frac, patience=500, seed=cfg.seed,
            model_path=model_path, verbose=True)
    else:
        module, params0 = init_rnm(num_primary, num_secondary,
                                   dtype=jnp.asarray(q_p).dtype)
        params = load_checkpoint(model_path, params0)
    return u_p, u_s, rnm_closure(module, params)


def main(mu1=4.75, mu2=0.02, num_primary=10, num_secondary=140,
         epochs=5000, retrain=False, num_cells=None, num_steps=None,
         f32=False):
    setup_jax(f32)
    cfg = default_config(num_cells, num_steps)
    grid, w0 = make_problem(cfg)
    u_p, u_s, closure = get_rnm_closure(cfg, grid, w0, num_primary,
                                        num_secondary, epochs=epochs,
                                        retrain=retrain)
    return run_manifold(cfg, grid, w0, u_p, u_s, closure, mu1, mu2,
                        f32=f32, label="RNM", save_prefix="rnm")


if __name__ == "__main__":
    p = base_parser(__doc__)
    p.add_argument("--num-primary", type=int, default=10)
    p.add_argument("--num-secondary", type=int, default=140)
    p.add_argument("--epochs", type=int, default=5000)
    p.add_argument("--retrain", action="store_true")
    a = p.parse_args()
    main(a.mu1, a.mu2, a.num_primary, a.num_secondary, a.epochs,
         a.retrain, a.num_cells, a.num_steps, a.f32)
