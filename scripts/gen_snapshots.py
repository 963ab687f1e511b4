"""Regenerate the FOM snapshot cache: 9 training + 3 test points.

Run from the repo root on the TPU backend. Idempotent (skip-if-cached,
same protocol as the reference's load_or_compute_snaps).
"""

import sys

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/fdtpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from finitedifference_tpu.config import DEFAULT_CONFIG, TEST_POINTS  # noqa: E402
from finitedifference_tpu.grid import grid_from_config  # noqa: E402
from finitedifference_tpu.snapshots import load_or_compute_snaps  # noqa: E402

cfg = DEFAULT_CONFIG
if len(sys.argv) > 1:
    cfg = cfg.with_cells(int(sys.argv[1]))
grid = grid_from_config(cfg)
w0 = np.ones(grid.state_dim)

points = list(cfg.mu_samples()) + [list(p) for p in TEST_POINTS]
for mu in points:
    s = load_or_compute_snaps(mu, grid, w0, cfg.dt, cfg.num_steps,
                              snap_folder=cfg.snap_folder)
    print(f"mu={mu}: snaps {s.shape} {s.dtype}", flush=True)
print("ALL SNAPSHOTS DONE")
