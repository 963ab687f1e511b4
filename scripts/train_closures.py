"""Offline closure-training pipeline (run with JAX_PLATFORMS=cpu).

Builds the shared 150-mode f64 basis and trains every closure model the
validation drivers need: global-RBF, RNM MLP, GP. Idempotent unless
--retrain. Mirrors the reference's offline stages
(compute_global_weights_grid_search_with_kernels.py,
train_reduced_manifold_autoencoder.py, POD-GP/train_gp.py).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "runners")

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

from common import default_config, make_problem, split_training  # noqa: E402

p = argparse.ArgumentParser()
p.add_argument("--retrain", action="store_true")
p.add_argument("--skip", nargs="*", default=[],
               choices=["rbf", "rnm", "gp"])
p.add_argument("--num-primary", type=int, default=10,
               help="primary modes of the 150-mode split; != 10 "
                    "suffixes artifacts with _p{n} (the reference's "
                    "fine POD-RBF_global_20/ exploration)")
p.add_argument("--num-cells", type=int, default=None,
               help="grid resolution (default: the 250^2 workbench); "
                    "artifacts get the res_path suffix, mirroring the "
                    "reference's per-resolution directory trees")
p.add_argument("--gp-stride", type=int, default=1,
               help="training-pair stride for the GP fit")
p.add_argument("--gp-per-mode", default="full",
               choices=["none", "scales", "full", "variational"],
               help="GP output-mode treatment (train_gp); the shipped "
                    "250^2 model is the per-mode-full family selected "
                    "by the round-3 offline sweep (gp_offline_eval.py); "
                    "'variational' = sparse SVGP, reference "
                    "compute_gp_models_pytorch.py:259-321")
p.add_argument("--gp-noise", type=float, default=1e-8)
p.add_argument("--gp-steps", type=int, default=300)
p.add_argument("--rnm-resume", action="store_true",
               help="warm-start the RNM fit from an existing checkpoint "
                    "(an interrupted run's best params + epoch count)")
p.add_argument("--rnm-lr", type=float, default=1e-3,
               help="initial learning rate for the RNM fit; on "
                    "--rnm-resume pass the LR the dead run had reached")
args = p.parse_args()

from common import res_path  # noqa: E402

cfg = default_config(args.num_cells)
grid, w0 = make_problem(cfg)

t0 = time.time()
n_p = args.num_primary
sfx = "" if n_p == 10 else f"_p{n_p}"
u_p, u_s, q_p, q_s = split_training(cfg, grid, w0, 150, n_p, 150 - n_p)
print(f"basis + projections ready in {time.time() - t0:.1f}s "
      f"(q_p {q_p.shape} {q_p.dtype})", flush=True)

if "rbf" not in args.skip:
    from finitedifference_tpu.training.rbf_train import (
        save_global_rbf, train_global_rbf)

    rbf_path = res_path(cfg, f"pod_rbf_global_model{sfx}.npz")
    if args.retrain or not os.path.exists(rbf_path):
        t0 = time.time()
        model, log = train_global_rbf(q_p, q_s, seed=cfg.seed, verbose=True)
        print(f"global-RBF grid search best: {log['best']} "
              f"({time.time() - t0:.1f}s)", flush=True)
        save_global_rbf(model, rbf_path)

if "rnm" not in args.skip:
    from finitedifference_tpu.training.rnm_train import (
        project_snapshots, train_rnm)
    from finitedifference_tpu.snapshots import collect_snapshots

    rnm_path = res_path(cfg, f"rnm_model{sfx}.msgpack")
    if args.retrain or args.rnm_resume or not os.path.exists(rnm_path):
        # the MLP regression is cheap: use ALL projected pairs
        snaps = collect_snapshots(cfg.mu_samples(), grid, w0, cfg.dt,
                                  cfg.num_steps, snap_folder=cfg.snap_folder)
        basis = np.load(res_path(cfg, "basis.npy"))
        qp_all, qs_all = project_snapshots(basis, snaps.T, n_p,
                                           150 - n_p)
        del snaps
        t0 = time.time()
        module, params, mon = train_rnm(
            qp_all, qs_all, batch_size=cfg.batch_size,
            train_frac=cfg.train_frac, seed=cfg.seed,
            model_path=rnm_path, resume=args.rnm_resume,
            lr=args.rnm_lr, verbose=True)
        print(f"RNM trained in {time.time() - t0:.1f}s", flush=True)

if "gp" not in args.skip:
    from finitedifference_tpu.training.gp_train import save_gp, train_gp

    stem = {"none": "pod_gp_model.npz",
            "variational": "pod_gp_model_variational.npz"}.get(
        args.gp_per_mode, "pod_gp_model_per_mode.npz")
    gp_path = res_path(cfg, stem.replace(".npz", f"{sfx}.npz")
                       if sfx else stem)
    if args.retrain or not os.path.exists(gp_path):
        t0 = time.time()
        s = args.gp_stride
        model = train_gp(q_p[::s], q_s[::s], per_mode=args.gp_per_mode,
                         noise=args.gp_noise, num_steps=args.gp_steps,
                         verbose=True)
        print(f"GP trained in {time.time() - t0:.1f}s", flush=True)
        save_gp(model, gp_path)

print("CLOSURE TRAINING DONE")
