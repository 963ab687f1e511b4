"""One-process TPU recording campaign (VERDICT r2 #1/#3/#5).

Records model x {3 canonical test points} rows into rom_results*.npz
with WARM timings, sharing one compiled program per model: every online
stepper here takes (mu1, mu2) as runtime arguments, so the 3 points cost
one multi-minute remote compile instead of three. Skip-if-done per key;
crash-tolerant (per-model try/except) — rerun after an axon outage and
it continues where it stopped.

Usage:
  python scripts/record_tpu_rows.py --models hprom hrnm ...
  python scripts/record_tpu_rows.py --num-cells 750 --out rom_results_fine.npz \
      --models fom prom hprom

Role of the reference's run_tests.py / run_tests_HPROM.py recorders.
"""

import argparse
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, os.path.join(ROOT, "runners"))
sys.path.insert(0, ROOT)
sys.path.insert(0, HERE)

os.environ["FDTPU_WARM"] = "1"

TEST_POINTS = [(5.19, 0.026), (4.56, 0.019), (4.75, 0.02)]

# rows recorded THIS RUN whose error falls outside the claimed family
# band (scripts/check_claims.py CLAIMS). VERDICT r4 #7: an engine with a
# scale-dependent accuracy bug must not land rows silently — the
# campaign exits nonzero (failing the regen chain stage) when any row
# it just recorded is out of band.
VIOLATIONS = []


def record(out, key, elapsed, err):
    from check_claims import band_for, family_of

    results = dict(np.load(out, allow_pickle=True)) \
        if os.path.exists(out) else {}
    results[key] = np.array([elapsed, err])
    np.savez(out, **results)
    print(f"[record] {out}: {key} = [{elapsed:.4g} s, {err}%]", flush=True)
    band = band_for(out, family_of(key))
    if not np.isfinite(err) or not np.isfinite(elapsed):
        VIOLATIONS.append((out, key, err, band))
        print(f"!!! BAND VIOLATION {key}: non-finite row", flush=True)
    elif band is not None and not (band[0] <= err <= band[1]):
        VIOLATIONS.append((out, key, err, band))
        print(f"!!! BAND VIOLATION {key}: {err}% outside claimed "
              f"[{band[0]}, {band[1]}]%", flush=True)
    elif band is None:
        print(f"[record] note: no claimed band for family "
              f"'{family_of(key)}' in {out} (add one to "
              f"scripts/check_claims.py)", flush=True)


def have(out, prefix):
    if not os.path.exists(out):
        return False
    results = dict(np.load(out, allow_pickle=True))
    return all(f"{prefix}_{m1}_{m2}" in results
               and np.all(np.isfinite(results[f"{prefix}_{m1}_{m2}"]))
               for m1, m2 in TEST_POINTS)


def linear_family(cfg, grid, w0, out, model, f32, num_modes=95):
    """hprom / hprom_ecm / hprom_multilevel / hprom_sequential — and
    prom / fom — all share compiled programs across points.

    num_modes != 95 suffixes the npz keys and the weight artifact (e.g.
    prom150_*, ecsw_weights_lspg_150modes_750x750.npy) so a larger-basis
    campaign — the 750^2 accuracy push — never clobbers the canonical
    95-mode rows."""
    import jax.numpy as jnp

    from common import default_ls, get_or_build_basis
    from finitedifference_tpu.snapshots import load_or_compute_snaps

    dtype = jnp.float32 if f32 else jnp.float64
    ls_kw = default_ls(f32)
    ksuf = "" if num_modes == 95 else str(num_modes)

    if model == "fom":
        from finitedifference_tpu.fom import (
            inviscid_burgers_implicit2d_skewed,
        )
        for mu in TEST_POINTS:
            def solve():
                r = inviscid_burgers_implicit2d_skewed(
                    grid, jnp.asarray(w0, dtype), float(cfg.dt),
                    cfg.num_steps, mu[0], mu[1])
                float(jnp.sum(r.snaps))
                return r
            solve()
            t0 = time.time()
            solve()
            record(out, f"fom_{mu[0]}_{mu[1]}", time.time() - t0, 0.0)
        return

    basis = get_or_build_basis(cfg, grid, w0, num_modes)

    if model in ("prom", "prom_pallas"):
        from finitedifference_tpu.rom import lspg_prom, reconstruct
        w0_d = jnp.asarray(w0, dtype)
        basis_d = jnp.asarray(basis, dtype)
        if model == "prom_pallas":
            # streaming full-grid Pallas GN engine (f32): one basis
            # read per iteration (ops/pallas_gn_full.py, VERDICT r3 #2)
            from finitedifference_tpu.rom_factored import (
                pallas_prom,
                precompute_prom_pallas,
            )
            vu_p, vv_p, dmask, _ = precompute_prom_pallas(grid, basis)
            y0p = jnp.asarray(basis.T @ w0, jnp.float32)
        for mu in TEST_POINTS:
            if model == "prom_pallas":
                def solve():
                    r = pallas_prom(grid, vu_p, vv_p, dmask, y0p,
                                    float(cfg.dt), cfg.num_steps,
                                    mu[0], mu[1], unroll_its=3)
                    return np.asarray(r.red_coords), r.total_gn_its
            else:
                def solve():
                    r = lspg_prom(grid, w0_d, cfg.dt, cfg.num_steps,
                                  mu[0], mu[1], basis_d, **ls_kw)
                    return np.asarray(r.red_coords), r.total_gn_its
            solve()
            t0 = time.time()
            red, its = solve()
            elapsed = time.time() - t0
            print(f"GN its: {int(its)}")
            # error on the HOST: a device-f64 reconstruct at 750^2 is a
            # 9 GB fetch through the 24 MB/s dev tunnel (~6 min/point
            # and tunnel-failure prone); hdm comes from disk anyway
            hdm = load_or_compute_snaps(list(mu), grid, w0, cfg.dt,
                                        cfg.num_steps,
                                        snap_folder=cfg.snap_folder)
            rom = basis @ red
            rel = 100 * np.linalg.norm(hdm - rom) / np.linalg.norm(hdm)
            tag = "prom_pallas" if model == "prom_pallas" else "prom"
            record(out, f"{tag}{ksuf}_{mu[0]}_{mu[1]}", elapsed,
                   round(rel, 4))
        return

    # hyper-reduced linear family
    from run_hprom import build_hprom_weights, hprom_weights_path

    from finitedifference_tpu.rom import ecsw_hprom, prepare_hprom

    if model in ("hprom_tensor", "hprom_factored", "hprom_pallas",
                 "hprom_pallas_traj"):
        # latency-race engines (VERDICT r2 #4): same NNLS mesh, online
        # loop as dense reduced-space contractions (tensor), factored
        # stencil-block kernels (factored), one fused Pallas kernel per
        # GN iteration (pallas), or ONE kernel for the entire
        # trajectory (pallas_traj) — all f32 race configurations with
        # trajectory parity tested vs the generic engine
        method = "nnls"
    else:
        method = model.replace("hprom", "").strip("_") or "nnls"
    wp = hprom_weights_path(cfg, method)
    if ksuf:
        # ecsw_weights_lspg[_<method>]_150modes[_750x750].npy
        stem, ext = os.path.splitext(wp)
        if cfg.res_suffix and stem.endswith(cfg.res_suffix):
            stem = stem[: -len(cfg.res_suffix)] \
                + f"_{num_modes}modes" + cfg.res_suffix
        else:
            stem += f"_{num_modes}modes"
        wp = stem + ext
    if os.path.exists(wp):
        weights = np.load(wp)
    else:
        # bc_w mirrors the reference per method: 50 for the NNLS family
        # (run_HPROM_ecsw_joshua.py:76), 10 for ECM (run_HPROM_ecm.py)
        bc_w = 10.0 if method == "ecm" else 50.0
        weights = build_hprom_weights(cfg, grid, basis, method, bc_w,
                                      verbose=True)
        np.save(wp, weights)
    print(f"{model}: N_e = {int((weights > 0).sum())} ({wp})")
    mesh, sw, ba = prepare_hprom(grid, weights, basis)
    if model in ("hprom_tensor", "hprom_factored", "hprom_pallas",
                 "hprom_pallas_traj"):
        dtype = jnp.float32
    y0 = jnp.asarray(basis.T @ w0, dtype)
    sw_d, ba_d = sw.astype(dtype), jnp.asarray(ba, dtype)
    if model == "hprom_tensor":
        from finitedifference_tpu.rom_tensor import (
            precompute_hprom_tensors,
            tensor_hprom,
        )
        tens = precompute_hprom_tensors(grid, mesh, sw_d, ba_d, cfg.dt)
    elif model in ("hprom_factored", "hprom_pallas",
                   "hprom_pallas_traj"):
        from finitedifference_tpu.rom_factored import (
            factored_hprom,
            pallas_hprom,
            pallas_traj_hprom,
            precompute_factored_blocks,
            precompute_pallas_system,
        )
        blocks = precompute_factored_blocks(mesh, ba_d)
        if model in ("hprom_pallas", "hprom_pallas_traj"):
            p6p, wgt_p = precompute_pallas_system(blocks, sw_d)
    for mu in TEST_POINTS:
        if model == "hprom_tensor":
            def solve():
                r = tensor_hprom(grid, mesh, sw_d, y0, tens, cfg.dt,
                                 cfg.num_steps, mu[0], mu[1],
                                 ls_method="normal")
                return np.asarray(r.red_coords)
        elif model == "hprom_factored":
            def solve():
                r = factored_hprom(grid, mesh, sw_d, y0, blocks,
                                   cfg.dt, cfg.num_steps, mu[0], mu[1],
                                   ls_method="normal")
                return np.asarray(r.red_coords)
        elif model == "hprom_pallas":
            def solve():
                r = pallas_hprom(grid, mesh, p6p, wgt_p, y0,
                                 float(cfg.dt), cfg.num_steps,
                                 mu[0], mu[1], unroll_its=3,
                                 ls_method="fused")
                return np.asarray(r.red_coords)
        elif model == "hprom_pallas_traj":
            def solve():
                r = pallas_traj_hprom(grid, mesh, p6p, wgt_p, y0,
                                      float(cfg.dt), cfg.num_steps,
                                      mu[0], mu[1], unroll_its=3)
                return np.asarray(r.red_coords)
        else:
            def solve():
                r = ecsw_hprom(grid, mesh, sw_d, y0, ba_d, cfg.dt,
                               cfg.num_steps, mu[0], mu[1], **ls_kw)
                return np.asarray(r.red_coords)
        solve()
        t0 = time.time()
        red = solve()
        elapsed = time.time() - t0
        rom = basis @ red
        hdm = load_or_compute_snaps(list(mu), grid, w0, cfg.dt,
                                    cfg.num_steps,
                                    snap_folder=cfg.snap_folder)
        rel = 100 * np.linalg.norm(hdm - rom) / np.linalg.norm(hdm)
        record(out, f"{model}{ksuf}_{mu[0]}_{mu[1]}", elapsed,
               round(rel, 4))


def closure_family(cfg, grid, w0, out, model, f32, n_p=10,
                   mu_train="single", warm_start=False,
                   fit_suffix=""):
    """Manifold-closure models over one shared run_manifold stepper.

    n_p: primary-mode count of the 150-mode split (default 10; the
    reference explores 20 at 750^2, POD-RBF_global_20/). Non-default
    splits suffix every model/weight artifact AND the npz row keys with
    _p{n_p} (e.g. pod_rbf_hprom_p20_*), so campaigns at different
    splits coexist in one npz and each stays skip-if-done (ADVICE r3).

    mu_train='spread' splits the ECSW row budget over three
    training-grid trajectories instead of the reference's single
    (4.25, 0.0225) run (scripts/build_fine_weights.py rationale) and
    suffixes the weight artifact with _spread.

    warm_start applies the reference's step-0 reseed (its sampled
    global-RBF/GP solvers overwrite the first Gauss-Newton result with
    the training trajectory's t=1 coordinates, hypernet2D.py:1100-1103)
    to the sampled closure runs — off by default to keep the shipped
    coarse rows' cold-start protocol.
    """
    from common import closure_ecsw_weights, res_path, run_manifold, \
        split_training

    n_s = 150 - n_p
    # fit artifacts (GP models, RBF fits) depend only on the POD split;
    # ECSW weight artifacts additionally depend on the training
    # trajectories — keep the suffixes separate so a --mu-train spread
    # campaign reuses the existing closure fits
    fit_sfx = ("" if n_p == 10 else f"_p{n_p}") + fit_suffix
    sfx = fit_sfx
    if mu_train == "spread":
        sfx += "_spread"
        mu_train_pts = [(4.25, 0.0225), (4.875, 0.015), (5.5, 0.03)]
    else:
        mu_train_pts = (4.25, 0.0225)
    kwargs = {}
    weights = None
    if model in ("hrnm", "hrnm_ecm"):
        from run_rnm import get_rnm_closure
        method = "ecm" if model.endswith("ecm") else "nnls"
        u_p, u_s, closure = get_rnm_closure(cfg, grid, w0, n_p, n_s)
        weights = closure_ecsw_weights(
            cfg, grid, w0, u_p, u_s, closure,
            weights_path=res_path(
                cfg, f"ecsw_weights_rnm_{method}{sfx}.npy"),
            method=method, bc_w=10.0, mu_train=mu_train_pts)
        label, prefix = "HRNM", model
    elif model in ("pod_rbf_hprom", "pod_rbf_hprom_knn",
                   "pod_rbf_hprom_knn_searched"):
        from run_pod_rbf_global import get_global_rbf, training_warm_q1
        if model == "pod_rbf_hprom_knn_searched":
            # the repo's own (eps, k) grid search (rbf_train.py) instead
            # of the reference's hardcoded eps=0.01, k=100 — the same
            # search that cut the kNN PROM from 5.72% to 1.3-3.5%
            from finitedifference_tpu.closures.rbf import knn_rbf_closure
            from finitedifference_tpu.training.rbf_train import (
                train_knn_rbf_search,
            )
            u_p, u_s, q_p, q_s = split_training(cfg, grid, w0, 150,
                                                n_p, n_s)
            m, log = train_knn_rbf_search(q_p, q_s, seed=cfg.seed)
            print(f"knn search best: {log['best']}")
            closure = knn_rbf_closure(m)
            variant = "knn_searched"
        elif model.endswith("knn"):
            from finitedifference_tpu.closures.rbf import (
                fit_knn_rbf,
                knn_rbf_closure,
            )
            u_p, u_s, q_p, q_s = split_training(cfg, grid, w0, 150,
                                                n_p, n_s)
            m = fit_knn_rbf(q_p, q_s, 0.01, min(100, q_p.shape[0]))
            closure = knn_rbf_closure(m)
            variant = "knn"
        else:
            mp = res_path(
                cfg, f"pod_rbf_global_model{fit_sfx}.npz") \
                if fit_sfx else None
            u_p, u_s, closure = get_global_rbf(cfg, grid, w0, n_p, n_s,
                                               model_path=mp)
            variant = "global"
        weights = closure_ecsw_weights(
            cfg, grid, w0, u_p, u_s, closure,
            weights_path=res_path(
                cfg, f"ecsw_weights_rbf_{variant}{sfx}_nnls.npy"),
            method="nnls", bc_w=10.0, mu_train=mu_train_pts)
        label, prefix = f"POD-RBF-HPROM-{variant}", model
        if model == "pod_rbf_hprom":
            prefix = "pod_rbf_hprom"
    elif model == "pod_gp_hprom":
        import run_pod_gp_hprom
        from finitedifference_tpu.closures.gp import gp_closure
        from finitedifference_tpu.training.gp_train import (
            load_gp,
            save_gp,
            train_gp,
        )
        u_p, u_s, q_p, q_s = split_training(cfg, grid, w0, 150, n_p,
                                            n_s)
        mp = res_path(cfg, run_pod_gp_hprom.MODEL_PATH.replace(
            ".npz", f"{fit_sfx}.npz") if fit_sfx
            else run_pod_gp_hprom.MODEL_PATH)
        if os.path.exists(mp):
            gp = load_gp(mp)
        else:
            # in-process train-and-save fallback (ADVICE r3): no
            # pipeline stage ships the shared-kernel model for
            # non-default splits (train_closures.py --gp-per-mode none
            # only covers n_p=10), so fit it here like pod_gp_hprom_pm
            gp = train_gp(q_p, q_s, noise=1e-6, per_mode="none",
                          num_steps=100, verbose=True)
            save_gp(gp, mp)
        closure = gp_closure(gp)
        weights = closure_ecsw_weights(
            cfg, grid, w0, u_p, u_s, closure,
            weights_path=res_path(cfg, f"ecsw_weights_gp{sfx}_nnls.npy"),
            method="nnls", bc_w=10.0, mu_train=mu_train_pts)
        label, prefix = "POD-GP-HPROM", model
    elif model == "pod_gp_hprom_pm":
        # per-mode GP family (closures/gp.py::fit_gp_full_per_mode, the
        # reference's POD-GP/compute_gp_models.py): one ARD GP per
        # secondary mode, fit as a single batched host program — beats
        # the shared-kernel model offline at all 3 points (RESULTS.md)
        from finitedifference_tpu.closures.gp import gp_closure
        from finitedifference_tpu.training.gp_train import (
            load_gp,
            save_gp,
            train_gp,
        )
        u_p, u_s, q_p, q_s = split_training(cfg, grid, w0, 150, n_p,
                                            n_s)
        mp = res_path(cfg, f"pod_gp_model_per_mode{fit_sfx}.npz")
        if os.path.exists(mp):
            gp = load_gp(mp)
        else:
            # 100 Adam steps: the 140 independent per-mode hyperopts are
            # cubic in the pair count and this environment has ONE host
            # core — 300 steps is a multi-hour fit for no measurable
            # offline gain (scripts/gp_offline_eval.py). Prefer fitting
            # offline via gp_offline_eval and shipping the file here.
            gp = train_gp(q_p, q_s, noise=1e-6, per_mode="full",
                          num_steps=100, verbose=True)
            save_gp(gp, mp)
        closure = gp_closure(gp)
        weights = closure_ecsw_weights(
            cfg, grid, w0, u_p, u_s, closure,
            weights_path=res_path(
                cfg, f"ecsw_weights_gp_pm{sfx}_nnls.npy"),
            method="nnls", bc_w=10.0, mu_train=mu_train_pts)
        label, prefix = "POD-GP-HPROM-per-mode", model
    elif model == "rnm":
        from run_rnm import get_rnm_closure
        u_p, u_s, closure = get_rnm_closure(cfg, grid, w0, n_p, n_s)
        label, prefix = "RNM", "rnm"
    elif model == "pod_rbf_global":
        from run_pod_rbf_global import get_global_rbf, training_warm_q1
        u_p, u_s, closure = get_global_rbf(cfg, grid, w0, n_p, n_s)
        kwargs["warm_q1"] = training_warm_q1(cfg, grid, w0, u_p)
        label, prefix = "POD-RBF-global", "pod_rbf_global"
    elif model in ("pod_rbf", "pod_rbf_searched"):
        from finitedifference_tpu.closures.rbf import (
            fit_knn_rbf,
            knn_rbf_closure,
        )
        u_p, u_s, q_p, q_s = split_training(cfg, grid, w0, 150, n_p,
                                            n_s)
        if model == "pod_rbf_searched":
            from finitedifference_tpu.training.rbf_train import (
                train_knn_rbf_search,
            )
            m, log = train_knn_rbf_search(q_p, q_s, seed=cfg.seed)
            print(f"knn search best: {log['best']}")
        else:
            m = fit_knn_rbf(q_p, q_s, 0.01, min(100, q_p.shape[0]))
        closure = knn_rbf_closure(m)
        label, prefix = "POD-RBF", model
    else:
        raise ValueError(model)

    if weights is not None:
        print(f"{model}: N_e = {int((weights > 0).sum())}")
    if warm_start and "warm_q1" not in kwargs:
        from run_pod_rbf_global import training_warm_q1
        kwargs["warm_q1"] = training_warm_q1(cfg, grid, w0, u_p)
    # snapshot artifacts share one filename protocol across resolutions;
    # suffix non-default grids so a 750^2 record never clobbers the
    # coarse *_snaps_*.npy files (npz keys stay per-file unsuffixed)
    save_prefix = prefix + fit_sfx + cfg.res_suffix
    rows = run_manifold(cfg, grid, w0, u_p, u_s, closure, f32=f32,
                        weights_full=weights, label=label,
                        save_prefix=save_prefix, points=TEST_POINTS,
                        **kwargs)
    for (elapsed, rel), mu in zip(rows, TEST_POINTS):
        record(out, f"{prefix}{fit_sfx}_{mu[0]}_{mu[1]}", elapsed, rel)


LINEAR = {"fom", "prom", "prom_pallas", "hprom", "hprom_ecm",
          "hprom_factored",
          "hprom_pallas", "hprom_pallas_traj", "hprom_multilevel",
          "hprom_sequential", "hprom_tensor"}


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--models", nargs="+",
                   default=["hprom", "hrnm", "pod_rbf_hprom",
                            "pod_rbf_hprom_knn", "pod_gp_hprom",
                            "hprom_ecm", "hrnm_ecm"])
    p.add_argument("--out", default=None,
                   help="npz to write (default: rom_results_hprom.npz "
                        "for hyper-reduced models, rom_results.npz "
                        "otherwise)")
    p.add_argument("--num-cells", type=int, default=None)
    p.add_argument("--num-steps", type=int, default=None)
    p.add_argument("--num-modes", type=int, default=95,
                   help="linear-family basis size; != 95 suffixes the "
                        "npz keys (prom150_*) and the weight artifact")
    p.add_argument("--num-primary", type=int, default=10,
                   help="closure-family primary-mode count of the "
                        "150-mode split; != 10 suffixes model/weight "
                        "artifacts with _p{n} (reference explores 20 "
                        "at 750^2: POD-RBF_global_20/)")
    p.add_argument("--mu-train", default="single",
                   choices=["single", "spread"],
                   help="closure-family ECSW training trajectories: "
                        "single = the reference's (4.25, 0.0225) run; "
                        "spread = row budget split over three "
                        "training-grid corners (suffixes weight "
                        "artifacts with _spread)")
    p.add_argument("--warm-start", action="store_true",
                   help="closure family: reference step-0 reseed "
                        "(hypernet2D.py:1100-1103) as a warm start")
    p.add_argument("--fit-suffix", default="",
                   help="extra closure-fit artifact suffix appended "
                        "after the split suffix (e.g. _dense for the "
                        "mu-densified fine fits from "
                        "scripts/fine_closure_fit.py); also suffixes "
                        "the npz row keys")
    p.add_argument("--f32", action="store_true")
    p.add_argument("--redo", action="store_true")
    p.add_argument("--platform", default=None)
    a = p.parse_args()
    if a.platform:
        os.environ["FDTPU_PLATFORM"] = a.platform

    from common import default_config, make_problem, setup_jax
    setup_jax(a.f32)

    # survive axon tunnel outage windows exactly like bench.py: a failed
    # registration is only recoverable from a FRESH interpreter
    import jax
    try:
        jax.devices()
    except RuntimeError as e:
        n = int(os.environ.get("RECORD_REEXEC", "0"))
        if n >= 20:
            raise
        print(f"record: no usable backend ({str(e)[:120]}); "
              f"re-exec attempt {n + 1}/20 in 120s", flush=True)
        time.sleep(120)
        os.environ["RECORD_REEXEC"] = str(n + 1)
        os.execv(sys.executable, [sys.executable] + sys.argv)

    cfg = default_config(a.num_cells, a.num_steps)
    grid, w0 = make_problem(cfg)

    # a TPU-worker crash mid-run (JaxRuntimeError UNAVAILABLE) poisons
    # the interpreter for its whole lifetime (CLAUDE.md): on infra
    # failures, re-exec fresh and resume via skip-if-done. A model that
    # infra-fails 3 times is abandoned so one bad program can't loop
    # the campaign forever.
    fails = dict(kv.split(":") for kv in
                 os.environ.get("RECORD_FAILS", "").split(",") if kv)

    def infra_error(e):
        s = f"{type(e).__name__}: {e}"
        return any(t in s for t in (
            "UNAVAILABLE", "crashed or restarted", "DEADLINE",
            "not in the list of known backends", "INTERNAL"))

    for model in a.models:
        hyper = "hprom" in model or model.startswith("hrnm")
        out = a.out or ("rom_results_hprom.npz" if hyper
                        else "rom_results.npz")
        if model in LINEAR:
            key = model + ("" if a.num_modes == 95 else str(a.num_modes))
        else:
            key = model + ("" if a.num_primary == 10
                           else f"_p{a.num_primary}") + a.fit_suffix
        if not a.redo and have(out, key):
            print(f"=== {key}: all points recorded, skipping ===")
            continue
        if int(fails.get(model, 0)) >= 3:
            print(f"=== {model}: abandoned after 3 infra failures ===")
            continue
        print(f"=== {model} -> {out} ===", flush=True)
        t0 = time.time()
        try:
            if model in LINEAR:
                linear_family(cfg, grid, w0, out, model, a.f32,
                              num_modes=a.num_modes)
            else:
                closure_family(cfg, grid, w0, out, model, a.f32,
                               n_p=a.num_primary, mu_train=a.mu_train,
                               warm_start=a.warm_start,
                               fit_suffix=a.fit_suffix)
        except Exception as e:  # noqa: BLE001 — keep recording others
            import traceback
            print(f"!!! {model} FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}")
            traceback.print_exc()
            if infra_error(e):
                n = int(os.environ.get("RECORD_REEXEC", "0"))
                if n < 20:
                    fails[model] = str(int(fails.get(model, 0)) + 1)
                    os.environ["RECORD_FAILS"] = ",".join(
                        f"{k}:{v}" for k, v in fails.items())
                    os.environ["RECORD_REEXEC"] = str(n + 1)
                    print(f"record: infra failure; re-exec "
                          f"{n + 1}/20 in 90s", flush=True)
                    time.sleep(90)
                    os.execv(sys.executable,
                             [sys.executable] + sys.argv)
        print(f"=== {model} done in {time.time() - t0:.0f}s ===",
              flush=True)

    # exit step (VERDICT r4 #2): every recording batch re-derives the
    # acceptance gate and refreshes the RESULTS.md gate section, so the
    # shipped docs can never claim PASS over archives that FAIL.
    from check_claims import check as claims_check
    os.chdir(ROOT)
    gate_ok = claims_check(write_report=True)
    print(f"[record] acceptance gate after this batch: "
          f"{'PASS' if gate_ok else 'FAIL'}", flush=True)
    if VIOLATIONS:
        print(f"[record] {len(VIOLATIONS)} row(s) recorded THIS RUN "
              f"out of band:", flush=True)
        for out, key, err, band in VIOLATIONS:
            print(f"  {out}:{key} = {err}% vs {band}", flush=True)
        sys.exit(1)


if __name__ == "__main__":
    main()
