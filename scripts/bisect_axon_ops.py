"""Op-level bisect of the axon closure-ROM numerics issue (VERDICT r1).

From one identical state y (the warm start), evaluate every
sub-expression of a single closure-ROM Gauss-Newton iteration on CPU and
on TPU and print the relative deltas:

    decode(y) -> residual(w) -> dec_jac(y) -> J@V -> QR solve / normal
    solve -> dy -> one full gauss_newton step -> K steps of manifold_rom

This localizes whether the wrong-numerics op is the decoder matmul
chain, the stencil residual, the closure Jacobian, the tall-skinny QR,
or the while_loop stepping logic. f32 program (the f64 one crashes the
axon worker at this size, round-1 record).
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir",
                  "/root/.cache/fdtpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

from finitedifference_tpu.closures.common import manifold_decoder  # noqa: E402
from finitedifference_tpu.closures.rbf import GlobalRBF, global_rbf_closure  # noqa: E402
from finitedifference_tpu.config import DEFAULT_CONFIG  # noqa: E402
from finitedifference_tpu.grid import grid_from_config  # noqa: E402
from finitedifference_tpu.ops.stencil import (  # noqa: E402
    burgers_residual_flat,
    inflow_bc_term,
    jacobian_times_basis,
    source_term,
)
from finitedifference_tpu.pod import split_basis  # noqa: E402
from finitedifference_tpu.snapshots import load_or_compute_snaps  # noqa: E402
from finitedifference_tpu.solvers import gauss_newton, lstsq_normal, lstsq_qr  # noqa: E402
from finitedifference_tpu.training.rbf_train import load_global_rbf  # noqa: E402

N_CELLS = int(sys.argv[1]) if len(sys.argv) > 1 else 250
MU = (4.75, 0.02)
DT = 0.05

cfg = DEFAULT_CONFIG.with_cells(N_CELLS)
grid = grid_from_config(cfg)

basis = np.load("basis.npy")
u_p64, u_s64 = split_basis(basis, 10, 140)
model64 = load_global_rbf("pod_rbf_global_model.npz")

snaps0 = load_or_compute_snaps(
    list(DEFAULT_CONFIG.mu_samples()[0]), grid_from_config(DEFAULT_CONFIG),
    np.ones(2 * DEFAULT_CONFIG.n_cells), cfg.dt, cfg.num_steps,
    snap_folder=cfg.snap_folder)
warm_q1 = (u_p64.T @ snaps0[:, 1]).astype(np.float32)
wp_np = snaps0[:, 1].astype(np.float32)   # previous full state

cpu = jax.devices("cpu")[0]
tpu = jax.devices()[0]
assert tpu.platform != "cpu", "run this on the TPU backend"

f32 = jnp.float32
sc = model64.scaler
model32 = GlobalRBF(
    w_global=np.asarray(model64.w_global, np.float32),
    q_p_train=np.asarray(model64.q_p_train, np.float32),
    epsilon=model64.epsilon, kernel=model64.kernel,
    scaler=type(sc)(scale_=np.asarray(sc.scale_, np.float32),
                    min_=np.asarray(sc.min_, np.float32)),
)


def build(device):
    """Build all staged functions bound to `device` arrays."""
    with jax.default_device(device):
        up = jnp.asarray(u_p64, f32)
        us = jnp.asarray(u_s64, f32)
        m = jax.tree_util.tree_map(
            lambda x: jnp.asarray(x) if isinstance(x, np.ndarray) else x,
            model32)
        closure = global_rbf_closure(m)
        decode, dec_jac = manifold_decoder(up, us, closure)
        y = jnp.asarray(warm_q1)
        wp = jnp.asarray(wp_np)
        src = source_term(grid, MU[1], DT, dtype=f32)
        lbc = inflow_bc_term(grid, MU[0], DT, dtype=f32)

        stages = {}
        stages["y"] = y
        w = jax.jit(decode)(y)
        stages["decode"] = w
        stages["closure_pred"] = jax.jit(closure.predict)(y)
        stages["closure_jac"] = jax.jit(closure.jacobian)(y)
        f = jax.jit(lambda w: burgers_residual_flat(
            w, wp, MU[0], MU[1], DT, grid, src, lbc))(w)
        stages["residual"] = f
        v = jax.jit(dec_jac)(y, w)
        stages["dec_jac"] = v
        jv = jax.jit(lambda w, v: jacobian_times_basis(w, v, DT, grid))(w, v)
        stages["jv"] = jv
        stages["dy_qr"] = jax.jit(lstsq_qr)(jv, -f)
        stages["dy_normal"] = jax.jit(lstsq_normal)(jv, -f)

        res_fn = lambda w_: burgers_residual_flat(
            w_, wp, MU[0], MU[1], DT, grid, src, lbc)
        jac_ap = lambda w_, v_: jacobian_times_basis(w_, v_, DT, grid)
        gn = jax.jit(lambda y_: gauss_newton(
            decode, dec_jac, res_fn, jac_ap, y_, max_its=10,
            ls_method="normal"))
        out = gn(y)
        stages["gn_y"] = out.y
        stages["gn_resnorm"] = out.resnorm
        stages["gn_its"] = out.num_its
        stages = {k: np.asarray(vv) for k, vv in stages.items()}
    return stages


t0 = time.time()
ref = build(cpu)
print(f"cpu stages built in {time.time() - t0:.1f}s", flush=True)
t0 = time.time()
got = build(tpu)
print(f"tpu stages built in {time.time() - t0:.1f}s", flush=True)

for k in ref:
    a, b = ref[k], got[k]
    if a.ndim == 0:
        print(f"{k:14s}: cpu={a} tpu={b}")
        continue
    d = np.linalg.norm(b - a) / (np.linalg.norm(a) + 1e-30)
    fin = "ok " if np.all(np.isfinite(b)) else "NAN"
    print(f"{k:14s}: rel-delta={d:.3e}  [{fin}]  "
          f"|cpu|={np.linalg.norm(a):.4e} |tpu|={np.linalg.norm(b):.4e}")
