#!/usr/bin/env python
"""Benchmark suite. Headline: FOM timesteps/sec on the reference's fine
grid (750x750, 1.125M DoF, implicit CN + Newton) — apples-to-apples with
the baseline: the reference FOM runs 500 steps in ~2.44e4 s on a
24-thread CPU node = 0.0205 steps/s (BASELINE.md, BurgersFD_CleanFine
logs). Precision caveat (ADVICE r1): Newton residuals/tolerance are f64
(relative 1e-12, the reference cutoff) but the inner triangular solves
are f32 Pallas and the stored trajectory is f32 — mixed-precision
inexact Newton, trajectories match full-f64 to ~6e-17 (RESULTS.md).

Also measures the reduced-model economics (VERDICT r1 #8): LSPG PROM and
ECSW HPROM online rates at the coarse workbench scale (250^2, f32
online — f64 matches to ~1e-7 but is emulated on TPU), a vmapped
9-point HPROM sweep, and an HBM bandwidth-utilization estimate for the
FOM hot loop.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
Reduced-model metrics ride in the "extra" field. Context goes to stderr.
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_STEPS_PER_SEC = 0.0205   # reference 750^2 FOM (BASELINE.md)
# v5e lite HBM bandwidth ~819 GB/s; used only for the utilization note
HBM_PEAK_GBPS = 819.0


def _stderr(*a):
    print(*a, file=sys.stderr, flush=True)


def _ensure_device():
    """Survive axon tunnel outage windows: registration happens once at
    interpreter startup (sitecustomize), so a failed registration can
    only be retried by a FRESH interpreter — re-exec ourselves with a
    bounded attempt counter (the tunnel flaps with multi-minute
    outages; see CLAUDE.md)."""
    import jax

    try:
        return jax.devices()
    except RuntimeError as e:
        n = int(os.environ.get("BENCH_REEXEC", "0"))
        if n >= 20:
            raise
        _stderr(f"bench: no usable backend ({str(e)[:120]}); "
                f"re-exec attempt {n + 1}/20 in 120s")
        time.sleep(120)
        os.environ["BENCH_REEXEC"] = str(n + 1)
        os.execv(sys.executable, [sys.executable] + sys.argv)


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    cache_dir = os.environ.get(
        "JAX_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache",
                     "fdtpu_jax_cache"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
    except Exception:
        pass
    import functools

    import jax.numpy as jnp

    from finitedifference_tpu.fom import (
        inviscid_burgers_implicit2d_skewed,
    )
    from finitedifference_tpu.grid import Grid2D

    n = int(os.environ.get("BENCH_CELLS", "750"))
    warm_steps = int(os.environ.get("BENCH_WARM_STEPS", "5"))
    meas_steps = int(os.environ.get("BENCH_MEAS_STEPS", "500"))
    skip_roms = os.environ.get("BENCH_SKIP_ROMS", "") == "1"
    dt = 0.05

    dev = _ensure_device()[0]
    _stderr(f"bench: device={dev}, grid={n}x{n}, f64 Newton + f32 "
            f"solves/storage, {meas_steps} measured steps")

    grid = Grid2D(nx=n, ny=n, x_up=100.0, y_up=100.0)
    w0 = jnp.ones(grid.state_dim, jnp.float64)

    # ---------------- headline: 750^2 FOM ----------------
    # The full trajectory is materialized on device and checksummed; only
    # the scalar crosses to the host (this dev environment tunnels
    # device->host at ~24 MB/s, which would otherwise swamp the timing;
    # the reference baseline likewise excludes snapshot-file IO).
    @functools.partial(jax.jit, static_argnames=("steps",))
    def _run(mu1, steps):
        r = inviscid_burgers_implicit2d_skewed(
            grid, w0, dt, steps, mu1, 0.02, snaps_dtype=jnp.float32)
        return jnp.sum(r.snaps), r.total_newton_its

    def run(mu1, steps):
        checksum, its = _run(mu1, steps)
        float(checksum)
        return its

    t0 = time.time()
    run(4.75, warm_steps)
    _stderr(f"bench: warmup (compile) {time.time() - t0:.1f}s")

    # median of 3: the shared dev chip shows up to 4x run-to-run
    # variance under ambient load
    rates, newton_its = [], 0
    for rep in range(3):
        t0 = time.time()
        its = int(run(4.76 + rep * 1e-4, meas_steps))
        elapsed = time.time() - t0
        rates.append(meas_steps / elapsed)
        newton_its = its
        _stderr(f"bench: rep {rep}: {meas_steps} steps in {elapsed:.2f}s, "
                f"{its} Newton its ({its / meas_steps:.1f}/step)")
    rate = sorted(rates)[1]

    extra = {
        "precision": "f64_newton_f32_solve_f32_snaps",
        "fom_newton_its_per_step": round(newton_its / meas_steps, 2),
    }

    # predictor config: start each Newton from the linear extrapolation
    # 2 w_n - w_{n-1} (converged solution unchanged, stopping rules and
    # tolerance identical — only the initial guess improves, saving ~1
    # Newton iteration/step). The headline above keeps the reference's
    # w_n start for apples-to-apples; this row is the framework's own
    # faster configuration.
    @functools.partial(jax.jit, static_argnames=("steps",))
    def _run_pred(mu1, steps):
        r = inviscid_burgers_implicit2d_skewed(
            grid, w0, dt, steps, mu1, 0.02, snaps_dtype=jnp.float32,
            extrapolate_guess=True)
        return jnp.sum(r.snaps), r.total_newton_its

    def run_pred(mu1, steps):
        checksum, its = _run_pred(mu1, steps)
        float(checksum)
        return its

    try:
        run_pred(4.75, warm_steps)
        pred_rates, pred_its = [], 0
        for rep in range(3):
            t0 = time.time()
            pred_its = int(run_pred(4.76 + rep * 1e-4, meas_steps))
            pred_rates.append(meas_steps / (time.time() - t0))
        extra["fom_predictor_timesteps_per_sec"] = round(
            sorted(pred_rates)[1], 1)
        extra["fom_predictor_newton_its_per_step"] = round(
            pred_its / meas_steps, 2)
        _stderr(f"bench: predictor config: "
                f"{extra['fom_predictor_timesteps_per_sec']} steps/s, "
                f"{pred_its / meas_steps:.2f} Newton its/step")
    except Exception as e:  # noqa: BLE001 — headline must still print
        _stderr(f"bench: predictor config skipped ({type(e).__name__}: "
                f"{str(e)[:200]})")

    # overlapping-segment wavefront solve (r5): n_seg chains of
    # seg_len+overlap diagonals as full-sublane slabs — ~6x shorter
    # sequential critical path, truncation ~rho^overlap (below f32
    # roundoff at overlap=64). Guarded: the headline stays on the exact
    # chain; trajectory agreement vs the exact-chain run is recorded.
    try:
        @functools.partial(jax.jit, static_argnames=("steps",))
        def _run_seg(mu1, steps):
            r = inviscid_burgers_implicit2d_skewed(
                grid, w0, dt, steps, mu1, 0.02,
                snaps_dtype=jnp.float32, seg=8, seg_overlap=64)
            return jnp.sum(r.snaps), r.total_newton_its, \
                r.snaps[:, -1]

        @functools.partial(jax.jit, static_argnames=("steps",))
        def _run_exact_final(mu1, steps):
            r = inviscid_burgers_implicit2d_skewed(
                grid, w0, dt, steps, mu1, 0.02,
                snaps_dtype=jnp.float32)
            return r.snaps[:, -1]

        chk, _, _ = _run_seg(4.75, warm_steps)
        float(chk)
        seg_rates, seg_its = [], 0
        wfin = None
        for rep in range(3):
            t0 = time.time()
            chk, its_s, wfin = _run_seg(4.76 + rep * 1e-4, meas_steps)
            float(chk)
            seg_rates.append(meas_steps / (time.time() - t0))
            seg_its = int(its_s)
        wref = _run_exact_final(4.76 + 2e-4, meas_steps)
        rel = float(jnp.linalg.norm(wfin - wref)
                    / jnp.linalg.norm(wref))
        extra["fom_seg8_timesteps_per_sec"] = round(
            sorted(seg_rates)[1], 1)
        extra["fom_seg8_newton_its_per_step"] = round(
            seg_its / meas_steps, 2)
        extra["fom_seg8_final_state_rel_err_vs_exact"] = float(
            f"{rel:.3e}")
        _stderr(f"bench: seg8 config: "
                f"{extra['fom_seg8_timesteps_per_sec']} steps/s, "
                f"{seg_its / meas_steps:.2f} its/step, final-state "
                f"rel err vs exact chain {rel:.3e}")
    except Exception as e:  # noqa: BLE001
        _stderr(f"bench: seg8 config skipped ({type(e).__name__}: "
                f"{str(e)[:200]})")

    # ---------------- measured FOM roofline (VERDICT r2 #8) -------------
    # Time the Newton body's two sub-programs (skewed residual, Pallas
    # wavefront solve) as scanned loops at the same 750^2 shapes, and
    # convert to achieved HBM GB/s from their exact array traffic. This
    # replaces round 2's 14-array traffic *model* with a measurement.
    try:
        extra.update(fom_roofline(grid, dt,
                                  rate * newton_its / meas_steps))
    except Exception as e:  # noqa: BLE001 — headline must still print
        _stderr(f"bench: roofline skipped ({type(e).__name__}: "
                f"{str(e)[:200]})")

    # ---------------- reduced models at 250^2, f32 online ----------------
    if not skip_roms:
        try:
            extra.update(rom_metrics(dt))
        except Exception as e:  # noqa: BLE001 — headline must still print
            _stderr(f"bench: ROM metrics skipped ({type(e).__name__}: "
                    f"{str(e)[:200]})")

    # ---------------- fine-grid (750^2) reduced models -------------------
    # The reference's fine workbench OOMs a 24-core node at exactly this
    # stage (BurgersFD_CleanFine/slurm-55470585.out:1-2); these rows only
    # run when the fine offline artifacts exist (scripts/gen_snapshots_fine
    # + build_fine_weights).
    if not skip_roms and os.path.exists("basis_750x750.npy"):
        try:
            extra.update(fine_rom_metrics(dt, rate if n == 750 else None))
        except Exception as e:  # noqa: BLE001 — headline must still print
            _stderr(f"bench: fine ROM metrics skipped "
                    f"({type(e).__name__}: {str(e)[:200]})")

    # metric name carries the full precision story (ADVICE r2): Newton
    # residuals/tolerance are f64, inner solves + stored snaps are f32
    print(json.dumps({
        "metric": f"fom_timesteps_per_sec_{n}x{n}_f64newton_f32solve",
        "value": round(rate, 4),
        "unit": "timesteps/s",
        "vs_baseline": round(rate / BASELINE_STEPS_PER_SEC, 2),
        "extra": extra,
    }))


def fom_roofline(grid, dt, newton_its_per_sec, reps=200):
    """Measured per-sub-op bandwidth of the 750^2 Newton body.

    Each sub-op runs `reps` times inside ONE jitted lax.scan whose carry
    threads the output back into the input (defeats CSE/hoisting), so
    per-iteration time is dispatch-free. Traffic accounting per trip
    (each field is ONE padded (nd_pad, ny_pad) array; u and v are
    separate fields):

      residual trip: reads u, v, up, vp, src, lbc, valid (7 f64) +
                     carry writes u, v (2) + residual writes ru, rv (2)
                     -> 11 f64 fields
      solve trip:    f64 reads u, v + writes u, v (4 f64) + f32 cast
                     writes (2), kernel reads (4) + writes (2), update
                     reads du, dv (2) -> 10 f32 = 5 f64-equivalents
                     -> 9 f64 fields
    """
    import functools

    import jax
    import jax.numpy as jnp

    from finitedifference_tpu.ops import skewed as sk
    from finitedifference_tpu.ops.pallas_wavefront import (
        solve_skewed_pallas,
    )

    lay = sk.make_layout(grid)
    f64 = jnp.float64
    valid = sk.valid_mask(lay, f64)
    src = sk.skewed_source(lay, grid, 0.02, dt, f64)
    lbc = sk.skewed_inflow_bc(lay, grid, 4.75, dt, f64)
    u0 = valid * 1.0
    v0 = valid * 1.0
    slot_bytes_f64 = lay.nd_pad * lay.ny_pad * 8

    @functools.partial(jax.jit, static_argnames=("n",))
    def res_loop(u, v, n):
        def body(c, _):
            uu, vv = c
            ru, rv = sk.skewed_residual(uu, vv, u, v, dt, grid, lay,
                                        src, lbc, valid)
            return (uu + 1e-12 * ru, vv + 1e-12 * rv), ()
        (uu, vv), _ = jax.lax.scan(body, (u, v), None, length=n)
        return jnp.sum(uu) + jnp.sum(vv)

    @functools.partial(jax.jit, static_argnames=("n",))
    def solve_loop(u, v, n):
        ru, rv = sk.skewed_residual(u, v, u, v, dt, grid, lay,
                                    src, lbc, valid)

        def body(c, _):
            uu, vv = c
            du, dv = solve_skewed_pallas(uu, vv, ru, rv, dt, grid, lay)
            return (uu + 1e-12 * du.astype(f64),
                    vv + 1e-12 * dv.astype(f64)), ()
        (uu, vv), _ = jax.lax.scan(body, (u, v), None, length=n)
        return jnp.sum(uu) + jnp.sum(vv)

    out = {}
    for name, fn, fields_bytes in (
        ("residual", res_loop, 11 * slot_bytes_f64),
        ("wavefront_solve", solve_loop, 9 * slot_bytes_f64),
    ):
        float(fn(u0, v0, 2))   # compile
        ts = []
        for _ in range(3):
            t0 = time.time()
            float(fn(u0, v0, reps))
            ts.append((time.time() - t0) / reps)
        t = sorted(ts)[1]
        gbps = fields_bytes / t / 1e9
        out[f"fom_{name}_us_per_it_measured"] = round(t * 1e6, 1)
        out[f"fom_{name}_gbps_measured"] = round(gbps, 1)
        _stderr(f"bench: roofline {name}: {t * 1e6:.0f} us/it, "
                f"{gbps:.0f} GB/s achieved")

    # whole-body achieved bandwidth from the headline rate: residual
    # (9: no separate carry write there — updates fold into the solve's)
    # + norm reads (2) + solve (9) per Newton iteration
    body_bytes = (9 + 2 + 9) * slot_bytes_f64
    gbps_body = newton_its_per_sec * body_bytes / 1e9
    out["fom_newton_body_gbps_achieved"] = round(gbps_body, 1)
    out["fom_hbm_utilization_pct_measured"] = round(
        100 * gbps_body / HBM_PEAK_GBPS, 1)
    return out


def rom_metrics(dt, steps=500):
    """PROM / HPROM online rates at 250^2 + vmapped HPROM sweep."""
    import jax
    import jax.numpy as jnp

    from finitedifference_tpu.fom import inviscid_burgers_implicit2d_skewed
    from finitedifference_tpu.grid import Grid2D
    from finitedifference_tpu.parallel.sweep import sweep_hprom
    from finitedifference_tpu.pod import pod
    from finitedifference_tpu.rom import ecsw_hprom, lspg_prom, prepare_hprom

    f32 = jnp.float32
    grid = Grid2D(nx=250, ny=250, x_up=100.0, y_up=100.0)
    w0 = jnp.ones(grid.state_dim, f32)
    out = {}

    # basis: from disk when the offline artifact exists, else a quick
    # single-trajectory POD built entirely on device (PROM throughput is
    # basis-agnostic; only the error, which bench does not report, isn't)
    if os.path.exists("basis.npy"):
        basis = jnp.asarray(np.load("basis.npy")[:, :95], f32)
        _stderr("bench: PROM basis from basis.npy")
    else:
        r = inviscid_burgers_implicit2d_skewed(
            grid, jnp.ones(grid.state_dim, jnp.float64), dt, steps,
            4.25, 0.0225, snaps_dtype=f32)
        basis, _ = pod(r.snaps, num_modes=95, method="rsvd",
                       random_state=0)
        basis = jnp.asarray(basis, f32)
        _stderr("bench: PROM basis from a fresh single-trajectory POD")

    def timed(fn, reps=3):
        fn()   # compile + settle
        ts = []
        for _ in range(reps):
            t0 = time.time()
            fn()
            ts.append(time.time() - t0)
        return sorted(ts)[reps // 2]

    el = timed(lambda: float(jnp.sum(lspg_prom(
        grid, w0, dt, steps, 4.75, 0.02, basis,
        ls_method="normal").red_coords)))
    out["prom95_250_f32_timesteps_per_sec"] = round(steps / el, 1)
    _stderr(f"bench: PROM(95) 250^2 f32: {el:.3f}s / {steps} steps")

    # streaming full-grid Pallas PROM engine (rom_factored.pallas_prom):
    # one basis read per GN iteration (VERDICT r3 #2)
    try:
        from finitedifference_tpu.rom_factored import (
            pallas_prom,
            precompute_prom_pallas,
        )
        vu_p, vv_p, dmask, _ = precompute_prom_pallas(
            grid, np.asarray(basis))
        y0p = jnp.asarray(basis.T @ w0, f32)
        el = timed(lambda: float(jnp.sum(pallas_prom(
            grid, vu_p, vv_p, dmask, y0p, dt, steps, 4.75,
            0.02).red_coords)))
        out["prom95_pallas_250_f32_timesteps_per_sec"] = \
            round(steps / el, 1)
        _stderr(f"bench: pallas PROM(95) 250^2 f32: {el:.3f}s "
                f"/ {steps} steps")
        del vu_p, vv_p
    except Exception as e:  # noqa: BLE001 — Mosaic lowering is backend-
        _stderr(f"bench: pallas PROM skipped ({type(e).__name__}: "
                f"{str(e)[:200]})")

    if os.path.exists("ecsw_weights_lspg.npy"):
        weights = np.load("ecsw_weights_lspg.npy")
        out["hprom_mesh"] = f"nnls_{int((weights > 0).sum())}"
    else:
        # synthetic sampled mesh: online THROUGHPUT depends only on the
        # mesh size, not the weight values; N_e matches the round-1 NNLS
        # support scale. GN convergence differs, so cap its like the real
        # runs' observed ~2/step is NOT assumed — max_its stays 20 and
        # the reported rate is conservative.
        rng = np.random.default_rng(0)
        weights = np.zeros(grid.n_cells)
        ring = np.zeros((250, 250), dtype=bool)
        ring[1:-1, 1:-1] = True
        interior = np.flatnonzero(ring.ravel())
        weights[rng.choice(interior, 512, replace=False)] = 1.0
        weights[~ring.ravel()] = 50.0
        out["hprom_mesh"] = "synthetic_512"
    mesh, sw, basis_aug = prepare_hprom(grid, weights, np.asarray(basis))
    y0 = jnp.asarray(basis.T @ w0, f32)
    sw32, ba32 = sw.astype(f32), jnp.asarray(basis_aug, f32)

    el = timed(lambda: float(jnp.sum(ecsw_hprom(
        grid, mesh, sw32, y0, ba32, dt, steps, 4.75, 0.02,
        ls_method="normal").red_coords)))
    out["hprom_250_f32_timesteps_per_sec"] = round(steps / el, 1)
    _stderr(f"bench: HPROM 250^2 f32 (N_e={mesh.n_sample}): "
            f"{el:.3f}s / {steps} steps")

    # tensorized single-run HPROM (rom_tensor.py, VERDICT r2 #4): the
    # same trajectory from ~10 dense kernels per GN iteration
    from finitedifference_tpu.rom_tensor import (
        precompute_hprom_tensors,
        tensor_hprom,
    )
    tens = precompute_hprom_tensors(grid, mesh, sw32, ba32, dt)
    el = timed(lambda: float(jnp.sum(tensor_hprom(
        grid, mesh, sw32, y0, tens, dt, steps, 4.75, 0.02,
        ls_method="normal").red_coords)))
    out["hprom_tensor_250_f32_timesteps_per_sec"] = round(steps / el, 1)
    _stderr(f"bench: tensor HPROM 250^2 f32: {el:.3f}s / {steps} steps")
    el = timed(lambda: float(jnp.sum(tensor_hprom(
        grid, mesh, sw32, y0, tens, dt, steps, 4.75, 0.02,
        unroll_its=3, ls_method="normal").red_coords)))
    out["hprom_tensor_unroll3_250_f32_timesteps_per_sec"] = \
        round(steps / el, 1)
    _stderr(f"bench: tensor HPROM unroll3: {el:.3f}s / {steps} steps")

    # factored stencil-block HPROM (rom_factored.py): ~8 kernels and
    # ~12 MB of HBM traffic per GN iteration vs the tensor engine's
    # 145 MB H stream — the single-run latency engine
    from finitedifference_tpu.rom_factored import (
        factored_hprom,
        precompute_factored_blocks,
    )
    blocks = precompute_factored_blocks(mesh, ba32)
    el = timed(lambda: float(jnp.sum(factored_hprom(
        grid, mesh, sw32, y0, blocks, dt, steps, 4.75, 0.02,
        ls_method="normal").red_coords)))
    out["hprom_factored_250_f32_timesteps_per_sec"] = round(steps / el, 1)
    _stderr(f"bench: factored HPROM 250^2 f32: {el:.3f}s / {steps} steps")
    el = timed(lambda: float(jnp.sum(factored_hprom(
        grid, mesh, sw32, y0, blocks, dt, steps, 4.75, 0.02,
        unroll_its=3, ls_method="normal").red_coords)))
    out["hprom_factored_unroll3_250_f32_timesteps_per_sec"] = \
        round(steps / el, 1)
    _stderr(f"bench: factored HPROM unroll3: {el:.3f}s / {steps} steps")
    el = timed(lambda: float(jnp.sum(factored_hprom(
        grid, mesh, sw32, y0, blocks, dt, steps, 4.75, 0.02,
        unroll_its=3, ls_method="cg").red_coords)))
    out["hprom_factored_unroll3_cg_250_f32_timesteps_per_sec"] = \
        round(steps / el, 1)
    _stderr(f"bench: factored HPROM unroll3+cg: {el:.3f}s / {steps} steps")

    # fused Pallas system: ONE kernel per GN iteration (ops/pallas_gn.py)
    try:
        from finitedifference_tpu.rom_factored import (
            pallas_hprom,
            precompute_pallas_system,
        )
        p6p, wgt_p = precompute_pallas_system(blocks, sw32)
        el = timed(lambda: float(jnp.sum(pallas_hprom(
            grid, mesh, p6p, wgt_p, y0, float(dt), steps, 4.75, 0.02,
            ls_method="normal").red_coords)))
        out["hprom_pallas_250_f32_timesteps_per_sec"] = \
            round(steps / el, 1)
        _stderr(f"bench: pallas HPROM 250^2 f32: {el:.3f}s "
                f"/ {steps} steps")
        el = timed(lambda: float(jnp.sum(pallas_hprom(
            grid, mesh, p6p, wgt_p, y0, float(dt), steps, 4.75, 0.02,
            unroll_its=3, ls_method="cg").red_coords)))
        out["hprom_pallas_unroll3_cg_250_f32_timesteps_per_sec"] = \
            round(steps / el, 1)
        _stderr(f"bench: pallas HPROM unroll3+cg: {el:.3f}s "
                f"/ {steps} steps")
        el = timed(lambda: float(jnp.sum(pallas_hprom(
            grid, mesh, p6p, wgt_p, y0, float(dt), steps, 4.75, 0.02,
            unroll_its=3, ls_method="fused").red_coords)))
        out["hprom_pallas_fused_unroll3_250_f32_timesteps_per_sec"] = \
            round(steps / el, 1)
        _stderr(f"bench: pallas HPROM fused-solve unroll3: {el:.3f}s "
                f"/ {steps} steps")

        # whole-trajectory kernel: ONE dispatch for all 500 steps
        # (ops/pallas_gn.py::_make_traj_kernel) — the single-run
        # latency-race engine (VERDICT r2 #4)
        from finitedifference_tpu.rom_factored import pallas_traj_hprom
        el = timed(lambda: float(jnp.sum(pallas_traj_hprom(
            grid, mesh, p6p, wgt_p, y0, float(dt), steps, 4.75, 0.02,
            unroll_its=3).red_coords)))
        out["hprom_pallas_traj_250_f32_timesteps_per_sec"] = \
            round(steps / el, 1)
        _stderr(f"bench: pallas whole-trajectory HPROM: {el:.3f}s "
                f"/ {steps} steps")
    except Exception as e:  # noqa: BLE001 — Mosaic lowering is backend-
        _stderr(f"bench: pallas HPROM skipped ({type(e).__name__}: "
                f"{str(e)[:200]})")

    # ECM mesh (when built): far sparser support than NNLS, so the
    # tensor engine's HBM floor — streaming H=(2*N_e, k, k) once per GN
    # iteration — drops proportionally. This is the single-run
    # latency-race configuration (VERDICT r2 #4).
    if os.path.exists("ecsw_weights_lspg_ecm.npy"):
        w_ecm = np.load("ecsw_weights_lspg_ecm.npy")
        mesh_e, sw_e, ba_e = prepare_hprom(grid, w_ecm, np.asarray(basis))
        sw_e32, ba_e32 = sw_e.astype(f32), jnp.asarray(ba_e, f32)
        tens_e = precompute_hprom_tensors(grid, mesh_e, sw_e32, ba_e32, dt)
        el = timed(lambda: float(jnp.sum(tensor_hprom(
            grid, mesh_e, sw_e32, y0, tens_e, dt, steps, 4.75, 0.02,
            ls_method="normal").red_coords)))
        out["hprom_tensor_ecm_250_f32_timesteps_per_sec"] = \
            round(steps / el, 1)
        _stderr(f"bench: tensor HPROM (ECM mesh, N_e={mesh_e.n_sample}): "
                f"{el:.3f}s / {steps} steps")

    mus = jnp.asarray(np.array(
        [[m1, m2] for m1 in (4.4, 4.9, 5.4) for m2 in (.016, .022, .028)]),
        f32)
    el = timed(lambda: float(jnp.sum(sweep_hprom(
        grid, mesh, sw32, y0, ba32, dt, steps, mus,
        ls_method="normal"))))
    out["hprom_sweep9_250_f32_aggregate_timesteps_per_sec"] = \
        round(9 * steps / el, 1)
    _stderr(f"bench: HPROM 9-point vmapped sweep: {el:.3f}s "
            f"({9 * steps / el:.0f} agg steps/s)")
    el = timed(lambda: float(jnp.sum(sweep_hprom(
        grid, mesh, sw32, y0, ba32, dt, steps, mus,
        engine="factored", ls_method="normal"))))
    out["hprom_sweep9_factored_250_f32_aggregate_timesteps_per_sec"] = \
        round(9 * steps / el, 1)
    _stderr(f"bench: factored HPROM 9-point sweep: {el:.3f}s "
            f"({9 * steps / el:.0f} agg steps/s)")
    try:
        el = timed(lambda: float(jnp.sum(sweep_hprom(
            grid, mesh, sw32, y0, ba32, dt, steps, mus,
            engine="pallas_traj", unroll_its=3))))
        out["hprom_sweep9_pallas_traj_250_f32_agg_timesteps_per_sec"] = \
            round(9 * steps / el, 1)
        _stderr(f"bench: whole-trajectory-kernel 9-point sweep: "
                f"{el:.3f}s ({9 * steps / el:.0f} agg steps/s)")
    except Exception as e:  # noqa: BLE001 — Mosaic lowering is backend-
        _stderr(f"bench: pallas_traj sweep skipped ({type(e).__name__}: "
                f"{str(e)[:200]})")
    return out


def fine_rom_metrics(dt, fom_rate_750, steps=500):
    """Warm 750^2 PROM / HPROM online rates (VERDICT r2 #2/#7): the
    apples-to-apples fine-grid ROM-vs-FOM economics the reference could
    not record (its HPROM OOMs, its PROM manages 1.6x at ~3.2% error)."""
    import jax.numpy as jnp

    from finitedifference_tpu.grid import Grid2D
    from finitedifference_tpu.rom import ecsw_hprom, lspg_prom, prepare_hprom

    f32 = jnp.float32
    grid = Grid2D(nx=750, ny=750, x_up=100.0, y_up=100.0)
    w0 = jnp.ones(grid.state_dim, f32)
    out = {}

    basis_full = np.load("basis_750x750.npy")

    def timed(fn, reps=3):
        fn()   # compile + settle
        ts = []
        for _ in range(reps):
            t0 = time.time()
            fn()
            ts.append(time.time() - t0)
        return sorted(ts)[reps // 2]

    # one PROM/HPROM row per available basis size: 95 is the canonical
    # reference-parity recipe, 150 the round-3 fine accuracy push
    for nm in (95, 150):
        if basis_full.shape[1] < nm:
            continue
        basis = basis_full[:, :nm]
        basis_d = jnp.asarray(basis, f32)
        el = timed(lambda: float(jnp.sum(lspg_prom(
            grid, w0, dt, steps, 4.75, 0.02, basis_d,
            ls_method="normal").red_coords)))
        out[f"prom{nm}_750_f32_timesteps_per_sec"] = round(steps / el, 1)
        _stderr(f"bench: PROM({nm}) 750^2 f32: {el:.3f}s / {steps} steps")

        # streaming Pallas PROM: the fine full-grid fast engine — the
        # reference's PROM economics target (1.6x its FOM) is judged on
        # this row (VERDICT r3 #2)
        try:
            from finitedifference_tpu.rom_factored import (
                pallas_prom,
                precompute_prom_pallas,
            )
            vu_p, vv_p, dmask, _ = precompute_prom_pallas(grid, basis)
            y0p = jnp.asarray(basis.T @ np.asarray(w0), f32)
            el = timed(lambda: float(jnp.sum(pallas_prom(
                grid, vu_p, vv_p, dmask, y0p, dt, steps, 4.75,
                0.02).red_coords)))
            out[f"prom{nm}_pallas_750_f32_timesteps_per_sec"] = \
                round(steps / el, 1)
            _stderr(f"bench: pallas PROM({nm}) 750^2 f32: {el:.3f}s "
                    f"/ {steps} steps")
            del vu_p, vv_p
        except Exception as e:  # noqa: BLE001
            _stderr(f"bench: pallas PROM({nm}) skipped "
                    f"({type(e).__name__}: {str(e)[:200]})")

        wpath = "ecsw_weights_lspg_750x750.npy" if nm == 95 \
            else f"ecsw_weights_lspg_{nm}modes_750x750.npy"
        if os.path.exists(wpath):
            weights = np.load(wpath)
            mesh, sw, basis_aug = prepare_hprom(grid, weights, basis)
            y0 = jnp.asarray(basis.T @ np.asarray(w0), f32)
            el = timed(lambda: float(jnp.sum(ecsw_hprom(
                grid, mesh, sw.astype(f32), y0,
                jnp.asarray(basis_aug, f32),
                dt, steps, 4.75, 0.02, ls_method="normal").red_coords)))
            tag = "hprom_750" if nm == 95 else f"hprom{nm}_750"
            out[f"{tag}_f32_timesteps_per_sec"] = round(steps / el, 1)
            out[f"{tag}_mesh_n_e"] = int(mesh.n_sample)
            _stderr(f"bench: HPROM({nm}) 750^2 f32 (N_e={mesh.n_sample}): "
                    f"{el:.3f}s / {steps} steps")
            if fom_rate_750:
                out[f"{tag}_vs_own_fom_speedup"] = round(
                    (steps / el) / fom_rate_750, 1)
    return out


if __name__ == "__main__":
    main()
