"""Produce shipped global-RBF models for each T9/T9b search strategy
(VERDICT r2 #10): bayesian, anisotropic, and cross-validated — each
saved under the runner's model-path protocol so
`run_pod_rbf_global.py --search X` loads them directly.

Role of the reference's
POD-RBF_global/compute_global_weights_bayesian_optimization_with_kernels.py,
perform_training_bayesian_optimization_anisotropic_fine_tuned.py and
compute_global_weights_grid_search_cv_with_kernels.py entry points.
CPU-only (offline fits).
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo/runners")
sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from common import default_config, make_problem, res_path, \
    split_training  # noqa: E402

from finitedifference_tpu.training.rbf_train import (  # noqa: E402
    fit_global_rbf_anisotropic,
    save_global_rbf,
    train_global_rbf_bayesian,
    train_global_rbf_cv,
)

cfg = default_config(None, None)
grid, w0 = make_problem(cfg)
u_p, u_s, q_p, q_s = split_training(cfg, grid, w0, 150, 10, 140)

for search, trainer in [("bayesian", train_global_rbf_bayesian),
                        ("cv", train_global_rbf_cv),
                        ("aniso", fit_global_rbf_anisotropic)]:
    path = res_path(cfg, f"pod_rbf_global_model_{search}.npz")
    if os.path.exists(path):
        print(f"{path} exists, skipping", flush=True)
        continue
    t0 = time.time()
    model, log = trainer(q_p, q_s, seed=cfg.seed, verbose=True)
    save_global_rbf(model, path)
    print(f"saved {path} in {time.time() - t0:.0f}s: "
          f"best={log.get('best', log)}", flush=True)
print("ALL SEARCHED RBF MODELS DONE")
