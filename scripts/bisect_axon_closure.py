"""Bisect the axon closure-ROM numerics issue (VERDICT r1 weak #2).

Round-1 record: the jitted manifold-ROM online program (RBF/GP/ANN
decoder at >=250^2) is wrong in f32 and crashes the worker in f64 on the
axon TPU backend, while the identical program on CPU matches the
reference solver. This script runs the SAME global-RBF manifold ROM from
the SAME state under a matrix of configurations and prints trajectory
deltas, isolating the offending op/precision.

Run from the repo root (needs basis.npy + pod_rbf_global_model.npz +
param_snaps/).
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "runners")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir",
                  "/root/.cache/fdtpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from finitedifference_tpu.closures.common import manifold_decoder  # noqa: E402
from finitedifference_tpu.closures.rbf import (  # noqa: E402
    GlobalRBF,
    global_rbf_closure,
)
from finitedifference_tpu.config import DEFAULT_CONFIG  # noqa: E402
from finitedifference_tpu.grid import grid_from_config  # noqa: E402
from finitedifference_tpu.pod import split_basis  # noqa: E402
from finitedifference_tpu.rom import manifold_rom  # noqa: E402
from finitedifference_tpu.snapshots import load_or_compute_snaps  # noqa: E402
from finitedifference_tpu.training.rbf_train import load_global_rbf  # noqa: E402

NUM_STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 60
MU = (4.75, 0.02)

cfg = DEFAULT_CONFIG
grid = grid_from_config(cfg)
w0 = np.ones(grid.state_dim)

basis = np.load("basis.npy")
u_p, u_s = split_basis(basis, 10, 140)
model64 = load_global_rbf("pod_rbf_global_model.npz")

snaps0 = load_or_compute_snaps(list(cfg.mu_samples()[0]), grid, w0,
                               cfg.dt, cfg.num_steps,
                               snap_folder=cfg.snap_folder)
warm_q1 = u_p.T @ snaps0[:, 1]

cpu = jax.devices("cpu")[0]
try:
    tpu = jax.devices("tpu")[0]
except Exception:
    tpu = None
    print("NOTE: no TPU visible; CPU-only comparisons")


def cast_model(m: GlobalRBF, dtype):
    sc = m.scaler
    return GlobalRBF(
        w_global=jnp.asarray(m.w_global, dtype),
        q_p_train=jnp.asarray(m.q_p_train, dtype),
        epsilon=m.epsilon, kernel=m.kernel,
        scaler=type(sc)(scale_=jnp.asarray(sc.scale_, dtype),
                        min_=jnp.asarray(sc.min_, dtype)),
    )


def run(device, dtype, ls_method="qr", precision=None, steps=NUM_STEPS):
    dt = jnp.float32 if dtype == "f32" else jnp.float64
    with jax.default_device(device):
        m = cast_model(model64, dt)
        closure = global_rbf_closure(m)
        decode, dec_jac = manifold_decoder(
            jnp.asarray(u_p, dt), jnp.asarray(u_s, dt), closure)
        y0 = jnp.asarray(warm_q1, dt)
        import contextlib
        ctx = (jax.default_matmul_precision(precision)
               if precision else contextlib.nullcontext())
        t0 = time.time()
        with ctx:
            res = manifold_rom(grid, y0, decode, dec_jac, cfg.dt, steps,
                               MU[0], MU[1], ls_method=ls_method)
        red = np.asarray(res.red_coords)   # full fetch = sync
        el = time.time() - t0
    return red, int(res.total_gn_its), el


print(f"=== global-RBF manifold ROM, 250^2, {NUM_STEPS} steps, "
      f"mu={MU} (warm start from training q1) ===")
ref, its_ref, el = run(cpu, "f64")
print(f"cpu/f64      : its={its_ref:4d}  {el:7.1f}s  (reference)")


def report(tag, out):
    red, its, el = out
    d = np.linalg.norm(red - ref) / np.linalg.norm(ref)
    fin = "ok " if np.all(np.isfinite(red)) else "NAN"
    print(f"{tag}: its={its:4d}  {el:7.1f}s  rel-delta={d:.3e}  [{fin}]")
    return d


report("cpu/f32      ", run(cpu, "f32"))
if tpu is not None:
    report("tpu/f32/deflt", run(tpu, "f32"))
    report("tpu/f32/high ", run(tpu, "f32", precision="highest"))
    report("tpu/f32/norml", run(tpu, "f32", ls_method="normal"))
    report("tpu/f32/nrm+h", run(tpu, "f32", ls_method="normal",
                                precision="highest"))
