"""POD-GP HPROM: Matérn-3/2 GP closure + ECSW sampled mesh (reference
run_POD_GP_HPROM_ecsw.py / _multilevel.py)."""

import os

from common import base_parser, closure_ecsw_weights, default_config, \
    make_problem, res_path, run_manifold, setup_jax, split_training

MODEL_PATH = "pod_gp_model.npz"


def main(mu1=5.19, mu2=0.026, num_primary=10, num_secondary=140,
         weights_method="nnls", compute_ecsw=False, bc_w=10.0,
         retrain=False, subsample=1, noise=1e-6, num_cells=None,
         num_steps=None, f32=False, per_mode="none", num_inducing=64):
    setup_jax(f32)
    from finitedifference_tpu.closures.gp import gp_closure
    from finitedifference_tpu.training.gp_train import (
        load_gp,
        save_gp,
        train_gp,
    )

    cfg = default_config(num_cells, num_steps)
    grid, w0 = make_problem(cfg)
    u_p, u_s, q_p, q_s = split_training(cfg, grid, w0,
                                        num_primary + num_secondary,
                                        num_primary, num_secondary)
    model_path = res_path(cfg, MODEL_PATH)
    if retrain or not os.path.exists(model_path):
        # subsample trades the cubic-cost GP fit for accuracy; the
        # shipped 250^2 recipe uses the full ~1.1k-pair set with
        # noise=1e-6 — the direct sweep (scripts/gp_hprom_direct.py)
        # found that noise level cuts the worst-point HPROM error from
        # 4.51% to 2.69% vs the round-2 1e-8 default (VERDICT r2 #7)
        model = train_gp(q_p[::subsample], q_s[::subsample],
                         noise=noise, per_mode=per_mode,
                         num_inducing=num_inducing, verbose=True)
        save_gp(model, model_path)
    else:
        model = load_gp(model_path)
    closure = gp_closure(model)

    weights = closure_ecsw_weights(
        cfg, grid, w0, u_p, u_s, closure,
        weights_path=res_path(cfg, f"ecsw_weights_gp_{weights_method}.npy"),
        method=weights_method, bc_w=bc_w, compute=compute_ecsw)
    print(f"N_e = {int((weights > 0).sum())}")
    return run_manifold(cfg, grid, w0, u_p, u_s, closure, mu1, mu2,
                        f32=f32, weights_full=weights, label="POD-GP-HPROM",
                        save_prefix="pod_gp_hprom")


if __name__ == "__main__":
    p = base_parser(__doc__)
    p.add_argument("--num-primary", type=int, default=10)
    p.add_argument("--num-secondary", type=int, default=140)
    p.add_argument("--weights-method", default="nnls",
                   choices=["nnls", "scipy_nnls", "ecm"])
    p.add_argument("--compute-ecsw", action="store_true")
    p.add_argument("--bc-w", type=float, default=10.0)
    p.add_argument("--retrain", action="store_true")
    p.add_argument("--subsample", type=int, default=1)
    p.add_argument("--noise", type=float, default=1e-6)
    p.add_argument("--per-mode", default="none",
                   choices=["none", "scales", "full", "variational"],
                   help="GP output-mode treatment on --retrain: 'full' = "
                        "one ARD GP per secondary mode (reference "
                        "POD-GP/compute_gp_models.py), 'scales' = shared "
                        "eigenbasis with exact per-mode amp/noise, "
                        "'none' = shared-kernel multi-output (the "
                        "recorded rom_results_hprom.npz recipe), "
                        "'variational' = sparse SVGP with learned "
                        "inducing points (reference "
                        "compute_gp_models_pytorch.py:259-321)")
    p.add_argument("--num-inducing", type=int, default=64,
                   help="inducing-point count for --per-mode "
                        "variational")
    a = p.parse_args()
    main(a.mu1, a.mu2, a.num_primary, a.num_secondary, a.weights_method,
         a.compute_ecsw, a.bc_w, a.retrain, a.subsample, a.noise,
         a.num_cells, a.num_steps, a.f32, a.per_mode, a.num_inducing)
