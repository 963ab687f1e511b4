"""GP closure config sweep against projected test trajectories.

Proxy for the GP-HPROM error (VERDICT r2 #7): relative error of the GP
prediction q_s(q_p) along the PROJECTED HDM trajectory at each canonical
test point. Runs on CPU only."""
import sys, time
import numpy as np

sys.path.insert(0, "/root/repo/runners")
sys.path.insert(0, "/root/repo")

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from common import default_config, make_problem, split_training
from finitedifference_tpu.closures.gp import fit_gp, gp_predict
from finitedifference_tpu.snapshots import load_or_compute_snaps
from finitedifference_tpu.training.rnm_train import project_snapshots
from finitedifference_tpu.training.rbf_train import remove_duplicates
from finitedifference_tpu.training.gp_train import load_gp
import jax.numpy as jnp

cfg = default_config(None, None)
grid, w0 = make_problem(cfg)
u_p, u_s, q_p, q_s = split_training(cfg, grid, w0, 150, 10, 140)
print(f"training pairs: {q_p.shape}")

TEST = [(5.19, 0.026), (4.56, 0.019), (4.75, 0.02)]
tests = []
basis = np.concatenate([u_p, u_s], axis=1)
for mu in TEST:
    hdm = load_or_compute_snaps(list(mu), grid, w0, cfg.dt, cfg.num_steps,
                                snap_folder=cfg.snap_folder)
    qp_t, qs_t = project_snapshots(basis, hdm.T, 10, 140)
    tests.append((np.asarray(qp_t), np.asarray(qs_t)))

def score(model):
    out = []
    pred = jax.jit(jax.vmap(lambda y: gp_predict(model, y)))
    for qp_t, qs_t in tests:
        p = np.asarray(pred(jnp.asarray(qp_t)))
        out.append(100 * np.linalg.norm(p - qs_t) / np.linalg.norm(qs_t))
    return out

# shipped model first (correlation anchor)
m0 = load_gp("/root/repo/pod_gp_model.npz")
print("shipped ARD ss4:", [f"{e:.3f}%" for e in score(m0)], flush=True)

qd_p, qd_s = remove_duplicates(q_p, q_s)
for ss in (4, 2, 1):
    for noise, steps in ((1e-8, 300), (1e-6, 300), (1e-4, 300),
                         (1e-8, 800), (1e-6, 800)):
        if ss < 4 and steps == 800:
            continue
        t0 = time.time()
        m = fit_gp(qd_p[::ss], qd_s[::ss], noise=noise, num_steps=steps,
                   ard=True)
        errs = score(m)
        print(f"ss={ss} noise={noise:g} steps={steps}: "
              f"{[f'{e:.3f}%' for e in errs]}  ({time.time()-t0:.0f}s)",
              flush=True)
