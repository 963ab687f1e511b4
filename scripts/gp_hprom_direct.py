"""Direct GP-HPROM error sweep at the outlier point (VERDICT r2 #7).

The prediction-error proxy (scripts/gp_sweep.py) correlates weakly with
the online HPROM error, so this sweeps GP training configs through the
ACTUAL hyper-reduced online solve at (4.56, 0.019) — the point where the
shipped ARD model records 4.51% vs <=2.9% for its HRNM/RBF siblings —
on the CPU backend (one compiled stepper, (mu1, mu2) runtime args).

Candidates follow the reference's own GP exploration space
(POD-GP/compute_gp_models.py, compute_gp_multioutput_models.py): noise
level, optimizer budget, trajectory subsampling.
"""
import sys
import time

sys.path.insert(0, "/root/repo/runners")
sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

from common import default_config, make_problem, split_training  # noqa: E402

from finitedifference_tpu.closures.gp import gp_closure  # noqa: E402
from finitedifference_tpu.training.gp_train import load_gp, train_gp  # noqa: E402

cfg = default_config(None, None)
grid, w0 = make_problem(cfg)
u_p, u_s, q_p, q_s = split_training(cfg, grid, w0, 150, 10, 140)
weights = np.load("/root/repo/ecsw_weights_gp_nnls.npy")
print(f"N_e = {int((weights > 0).sum())}", flush=True)

POINTS = [(4.56, 0.019), (5.19, 0.026), (4.75, 0.02)]


def run(closure, tag):
    from common import run_manifold
    t0 = time.time()
    rows = run_manifold(cfg, grid, w0, u_p, u_s, closure,
                        f32=False, weights_full=weights,
                        label=f"GP-HPROM[{tag}]", points=POINTS)
    errs = [f"{r[1]:.3f}%" for r in rows]
    print(f">>> {tag}: {errs}  ({time.time() - t0:.0f}s)", flush=True)
    return [r[1] for r in rows]


m0 = load_gp("/root/repo/pod_gp_model.npz")
run(gp_closure(m0), "shipped")

for tag, kw in [
    ("ss1_n1e-6_s300", dict(noise=1e-6, num_steps=300)),
    ("ss1_n1e-4_s300", dict(noise=1e-4, num_steps=300)),
    ("ss1_n1e-8_s800", dict(noise=1e-8, num_steps=800)),
    ("ss2_n1e-8_s300", dict(noise=1e-8, num_steps=300, ss=2)),
]:
    ss = kw.pop("ss", 1)
    t0 = time.time()
    m = train_gp(q_p[::ss], q_s[::ss], on_host=False, ard=True, **kw)
    print(f"[{tag}] trained in {time.time() - t0:.0f}s", flush=True)
    run(gp_closure(m), tag)
