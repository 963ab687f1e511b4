"""Compute ECSW weights for the nonlinear-closure ROM family on the
host CPU (offline): HRNM, global-RBF HPROM, GP HPROM. Uses the runners'
own weight-path conventions so the validation drivers pick them up.

Run: python scripts/compute_closure_weights.py [rnm rbf gp]
"""

import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "runners")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

from common import closure_ecsw_weights, default_config, make_problem  # noqa: E402

which = sys.argv[1:] or ["rnm", "rbf", "gp"]
cfg = default_config()
grid, w0 = make_problem(cfg)

jobs = []
if "rnm" in which:
    from run_rnm import get_rnm_closure

    u_p, u_s, closure = get_rnm_closure(cfg, grid, w0, 10, 140)
    jobs.append(("rnm", u_p, u_s, closure, "ecsw_weights_rnm_nnls.npy"))
if "rbf" in which:
    from run_pod_rbf_global import get_global_rbf

    u_p, u_s, closure = get_global_rbf(cfg, grid, w0, 10, 140)
    jobs.append(("rbf", u_p, u_s, closure,
                 "ecsw_weights_rbf_global_nnls.npy"))
if "gp" in which:
    from finitedifference_tpu.closures.gp import gp_closure
    from finitedifference_tpu.training.gp_train import load_gp
    from common import split_training

    u_p, u_s, _, _ = split_training(cfg, grid, w0, 150, 10, 140)
    closure = gp_closure(load_gp("pod_gp_model.npz"))
    jobs.append(("gp", u_p, u_s, closure, "ecsw_weights_gp_nnls.npy"))

for name, u_p, u_s, closure, path in jobs:
    t0 = time.time()
    weights = closure_ecsw_weights(cfg, grid, w0, u_p, u_s, closure,
                                   weights_path=path, method="nnls",
                                   bc_w=10.0, compute=True)
    print(f"{name}: N_e={int((weights > 0).sum())} "
          f"({time.time() - t0:.1f}s) -> {path}", flush=True)
print("CLOSURE WEIGHTS DONE")
