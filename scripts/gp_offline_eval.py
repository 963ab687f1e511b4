"""Offline GP-closure model selection (VERDICT r2 #7).

The GP-HPROM's online error at a test point is driven by how well the
closure predicts the secondary coordinates along that trajectory, so
sweep GP hyperparameter variants and score them OFFLINE: project each
test point's cached HDM trajectory onto (u_p, u_s) and measure
||gp(q_p) - q_s|| / ||q_s|| — no TPU, no online solve. The best variant
is then re-validated online once (scripts/record_tpu_rows.py).

Role of the reference's POD-GP/compute_gp_models.py exploration loop.
"""

import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, os.path.join(ROOT, "runners"))
sys.path.insert(0, ROOT)

TEST_POINTS = [(5.19, 0.026), (4.56, 0.019), (4.75, 0.02)]


def main():
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--max-pairs", type=int, default=1500,
                    help="training-pair subsample cap (split_training)")
    ap.add_argument("--noise", type=float, nargs="+",
                    default=[1e-8, 1e-6, 1e-4])
    ap.add_argument("--steps", type=int, nargs="+", default=[300, 1000])
    ap.add_argument("--nu", type=float, nargs="+", default=[1.5])
    ap.add_argument("--per-mode", nargs="+", default=["none"],
                    choices=["none", "scales", "full"],
                    help="output-mode treatments to sweep "
                         "(training/gp_train.py::train_gp)")
    a = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from common import default_config, make_problem, split_training
    from finitedifference_tpu.closures.gp import gp_closure
    from finitedifference_tpu.snapshots import load_or_compute_snaps
    from finitedifference_tpu.training.gp_train import (
        load_gp,
        save_gp,
        train_gp,
    )
    from finitedifference_tpu.training.rnm_train import project_snapshots

    cfg = default_config(None, None)
    grid, w0 = make_problem(cfg)
    u_p, u_s, q_p, q_s = split_training(cfg, grid, w0, 150, 10, 140,
                                        max_pairs=a.max_pairs)
    basis = np.concatenate(
        (np.asarray(u_p), np.asarray(u_s)), axis=1)

    tests = []
    for mu in TEST_POINTS:
        hdm = load_or_compute_snaps(list(mu), grid, w0, cfg.dt,
                                    cfg.num_steps,
                                    snap_folder=cfg.snap_folder)
        tp, ts = project_snapshots(jnp.asarray(basis), hdm.T, 10, 140)
        tests.append((mu, np.asarray(tp), np.asarray(ts)))

    def score(model, tag):
        closure = gp_closure(model)
        batch_predict = jax.jit(jax.vmap(closure.predict))
        cols = []
        for mu, tp, ts in tests:
            pred = np.asarray(batch_predict(jnp.asarray(tp)))
            rel = 100 * np.linalg.norm(pred - ts) / np.linalg.norm(ts)
            cols.append(rel)
        print(f"{tag:42s} " + "  ".join(f"{r:7.3f}%" for r in cols),
              flush=True)
        return cols

    results = {}
    if os.path.exists("pod_gp_model.npz"):
        results["shipped"] = (score(load_gp("pod_gp_model.npz"),
                                    "shipped pod_gp_model.npz"), None)

    variants = [
        (f"nu={nu} noise={nz:g} steps={st} pm={pm} pairs={a.max_pairs}",
         dict(noise=nz, num_steps=st, nu=nu, per_mode=pm))
        for nu in a.nu for nz in a.noise for st in a.steps
        for pm in a.per_mode
    ]
    best = None
    for tag, kw in variants:
        t0 = time.time()
        model = train_gp(q_p, q_s, ard=True, **kw)
        cols = score(model, f"{tag} [{time.time() - t0:.0f}s]")
        worst = max(cols)
        # a singular K (near-duplicate pairs at tiny noise) yields NaN
        # predictions — never select it
        if np.isfinite(worst) and (best is None or worst < best[0]):
            best = (worst, tag, model)

    if best is None:
        print("\nno finite variant — nothing saved")
        return

    print(f"\nbest by worst-point offline error: {best[1]} "
          f"({best[0]:.3f}%)")
    out = "pod_gp_model_candidate.npz"
    save_gp(best[2], out)
    print(f"saved {out} — re-validate online with record_tpu_rows")


if __name__ == "__main__":
    main()
