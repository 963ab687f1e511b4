"""Generate the 750^2 fine-workbench snapshot cache (9 training points +
the (4.75, 0.02) test point), f64 Newton with f32 trajectory storage
(the fetch through this environment's 24 MB/s device->host tunnel and
the disk footprint halve; the stored-precision loss is ~1e-7 relative,
invisible under the 3%-scale fine-grid ROM errors, BASELINE.md).

Run on the TPU backend from the repo root. Idempotent.
"""

import sys

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/fdtpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

from finitedifference_tpu.config import DEFAULT_CONFIG  # noqa: E402
from finitedifference_tpu.grid import grid_from_config  # noqa: E402
from finitedifference_tpu.snapshots import load_or_compute_snaps  # noqa: E402

cfg = DEFAULT_CONFIG.with_cells(750)
grid = grid_from_config(cfg)
w0 = np.ones(grid.state_dim)

points = list(cfg.mu_samples()) + [[4.75, 0.02], [5.19, 0.026],
                                   [4.56, 0.019]]
for mu in points:
    s = load_or_compute_snaps(mu, grid, w0, cfg.dt, cfg.num_steps,
                              snap_folder=cfg.snap_folder,
                              snaps_dtype=jnp.float32)
    print(f"mu={mu}: snaps {s.shape} {s.dtype}", flush=True)
print("ALL FINE SNAPSHOTS DONE")
