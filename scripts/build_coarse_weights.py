"""Prebuild the coarse (250^2) linear-HPROM weight families on the host
CPU: NNLS, ECM, multilevel (device-FISTA level-1 screening), sequential.

The training-matrix assembly and every solver here are pure jax/numpy
and run fine on the CPU backend; prebuilding keeps the (single) TPU
session free for online recording (CLAUDE.md: one TPU process at a
time). Role of the reference's offline weight stages
(run_HPROM_ecsw_joshua.py:55-111, run_HPROM_ecm.py:84-91,
run_HPROM_ecsw_multilevel.py:89-120,
run_HRNM_ecsw_joshua_sequential.py:168-195).

Run: env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
       python scripts/build_coarse_weights.py [nnls ecm multilevel sequential]
Idempotent per artifact.
"""

import os
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "runners")

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

from common import default_config, get_or_build_basis, make_problem  # noqa: E402
from run_hprom import build_hprom_weights, hprom_weights_path  # noqa: E402

methods = sys.argv[1:] or ["nnls", "ecm", "multilevel", "sequential"]
cfg = default_config()
grid, w0 = make_problem(cfg)
# build the CANONICAL 150-mode basis (the closure pipelines' num_total)
# and slice: a later train_closures run must not rebuild/overwrite
# basis.npy with different leading columns than the weights were
# trained against (rSVD at 95 vs 150 modes samples different random
# projections)
basis = get_or_build_basis(cfg, grid, w0, 150)[:, :95]

for method in methods:
    path = hprom_weights_path(cfg, method)
    if os.path.exists(path):
        w = np.load(path)
        print(f"{method}: exists (N_e={int((w > 0).sum())}) -> {path}",
              flush=True)
        continue
    bc_w = 10.0 if method == "ecm" else 50.0
    t0 = time.time()
    weights = build_hprom_weights(cfg, grid, basis, method, bc_w,
                                  verbose=True)
    np.save(path, weights)
    print(f"{method}: N_e={int((weights > 0).sum())} "
          f"({time.time() - t0:.0f}s) -> {path}", flush=True)
print("COARSE WEIGHTS DONE")
