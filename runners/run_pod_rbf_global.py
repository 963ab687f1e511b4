"""POD-RBF PROM with global interpolation (reference
run_POD_RBF_global.py): loads/trains a pod_rbf_global_model via
(epsilon x kernel) grid search."""

import os

from common import base_parser, default_config, make_problem, \
    run_manifold, setup_jax, split_training

MODEL_PATH = "pod_rbf_global_model.npz"


def get_global_rbf(cfg, grid, w0, num_primary, num_secondary,
                   model_path=None, retrain=False):
    from finitedifference_tpu.closures.rbf import global_rbf_closure
    from finitedifference_tpu.training.rbf_train import (
        load_global_rbf,
        save_global_rbf,
        train_global_rbf,
    )

    from common import res_path

    if model_path is None:
        model_path = res_path(cfg, MODEL_PATH)
    u_p, u_s, q_p, q_s = split_training(cfg, grid, w0,
                                        num_primary + num_secondary,
                                        num_primary, num_secondary)
    if retrain or not os.path.exists(model_path):
        model, log = train_global_rbf(q_p, q_s, seed=cfg.seed,
                                      verbose=True)
        print(f"grid-search best: {log['best']}")
        save_global_rbf(model, model_path)
    else:
        model = load_global_rbf(model_path)
    return u_p, u_s, global_rbf_closure(model)


def training_warm_q1(cfg, grid, w0, u_p):
    """q_p of the first training trajectory at t=1 (the reference's
    step-0 reseed source, hypernet2D.py:1100-1102)."""
    import numpy as np

    from finitedifference_tpu.snapshots import load_or_compute_snaps

    snaps = load_or_compute_snaps(cfg.mu_samples()[0], grid, w0, cfg.dt,
                                  cfg.num_steps,
                                  snap_folder=cfg.snap_folder)
    return np.asarray(u_p).T @ snaps[:, 1]


def main(mu1=4.75, mu2=0.02, num_primary=10, num_secondary=140,
         retrain=False, num_cells=None, num_steps=None, f32=False):
    setup_jax(f32)
    cfg = default_config(num_cells, num_steps)
    grid, w0 = make_problem(cfg)
    u_p, u_s, closure = get_global_rbf(cfg, grid, w0, num_primary,
                                       num_secondary, retrain=retrain)
    return run_manifold(cfg, grid, w0, u_p, u_s, closure, mu1, mu2,
                        f32=f32, label="POD-RBF-global",
                        save_prefix="pod_rbf_global",
                        warm_q1=training_warm_q1(cfg, grid, w0, u_p))


if __name__ == "__main__":
    p = base_parser(__doc__)
    p.add_argument("--num-primary", type=int, default=10)
    p.add_argument("--num-secondary", type=int, default=140)
    p.add_argument("--retrain", action="store_true")
    a = p.parse_args()
    main(a.mu1, a.mu2, a.num_primary, a.num_secondary, a.retrain,
         a.num_cells, a.num_steps, a.f32)
